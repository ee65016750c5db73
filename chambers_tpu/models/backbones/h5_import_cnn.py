"""Keras ``.h5`` weight import for the CNN backbones (SENet family).

The released SENet weights (senet.py:458-472 downloads them) are legacy Keras
h5 files whose layers appear in construction order. Both the reference
builder and this build construct the network in the same order, so import is
an *order-based stream match*: h5 weights are flattened in (layer, weight)
order and consumed against this build's parameter leaves in construction
order, with shape checking at every step.

One structural difference is handled explicitly: the reference implements
grouped convolution as ``groups`` separate per-group ``Conv2D`` layers
(``GroupConv2D``, senet.py:65-127) whose kernels are
``[kh, kw, cin/g, cout/g]``; this build's single grouped conv expects
``[kh, kw, cin/g, cout]`` — the importer concatenates ``g`` consecutive
per-group kernels along the output-channel axis.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

from chambers_tpu.models.backbones.h5_import import load_keras_h5_weights


def _natural_key(s: str):
    return [int(p) if p.isdigit() else p for p in re.split(r"(\d+)", s)]


def _ordered_param_leaves(variables) -> List[Tuple[Tuple[str, ...], tuple]]:
    """Flatten ``variables`` into construction order.

    Flax dicts preserve insertion (creation) order, which for these builders
    mirrors the reference's layer creation order. Within a module, Keras
    emits conv kernel(+bias) then BN gamma/beta/moving_mean/moving_variance —
    leaves are interleaved to match. Caveat: Keras saves *functional-model
    topological* order, which can diverge from creation order in branchy
    blocks; every consume is shape-checked, so a divergence fails loudly
    rather than silently mis-assigning.
    """
    leaves: List[Tuple[Tuple[str, ...], tuple]] = []
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p_node, s_node, path):
        if not isinstance(p_node, dict):
            leaves.append((("params",) + path, np.asarray(p_node).shape))
            return
        keys = list(p_node.keys())  # insertion order == creation order
        for key in keys:
            child = p_node[key]
            s_child = s_node.get(key, {}) if isinstance(s_node, dict) else {}
            if isinstance(child, dict) and "scale" in child and "bias" in child \
                    and isinstance(s_child, dict) and "mean" in s_child:
                # BatchNorm: gamma, beta, moving_mean, moving_variance
                leaves.append((("params",) + path + (key, "scale"),
                               np.asarray(child["scale"]).shape))
                leaves.append((("params",) + path + (key, "bias"),
                               np.asarray(child["bias"]).shape))
                leaves.append((("batch_stats",) + path + (key, "mean"),
                               np.asarray(s_child["mean"]).shape))
                leaves.append((("batch_stats",) + path + (key, "var"),
                               np.asarray(s_child["var"]).shape))
            elif isinstance(child, dict):
                if "kernel" in child:
                    leaves.append((("params",) + path + (key, "kernel"),
                                   np.asarray(child["kernel"]).shape))
                    if "bias" in child:
                        leaves.append((("params",) + path + (key, "bias"),
                                       np.asarray(child["bias"]).shape))
                    extra = [k for k in child
                             if k not in ("kernel", "bias")
                             and isinstance(child[k], dict)]
                    for k in extra:
                        walk(child[k], s_child.get(k, {}), path + (key, k))
                else:
                    walk(child, s_child, path + (key,))
            else:
                leaves.append((("params",) + path + (key,),
                               np.asarray(child).shape))

    walk(params, stats, ())
    return leaves


def _flat_h5_weights(path: str) -> List[np.ndarray]:
    weights = load_keras_h5_weights(path)
    return list(weights.values())  # h5py attrs preserve write order


def load_cnn_h5_weights(path: str, variables):
    """Import legacy Keras CNN weights by ordered stream matching."""
    stream = _flat_h5_weights(path)
    leaves = _ordered_param_leaves(variables)

    import copy

    out = copy.deepcopy(
        {k: v for k, v in variables.items()}
    )

    def assign(tree_path, value):
        node = out[tree_path[0]]
        for k in tree_path[1:-1]:
            node = node[k]
        node[tree_path[-1]] = value

    pos = 0
    for tree_path, shape in leaves:
        if pos >= len(stream):
            raise ValueError(
                f"h5 stream exhausted at {'/'.join(tree_path)}; "
                "architecture mismatch."
            )
        w = stream[pos]
        if tuple(w.shape) == tuple(shape):
            assign(tree_path, w)
            pos += 1
            continue
        # grouped conv: concat g consecutive per-group kernels on out axis
        if (len(shape) == 4 and w.ndim == 4
                and w.shape[:3] == tuple(shape[:3])
                and shape[3] % w.shape[3] == 0):
            g = shape[3] // w.shape[3]
            parts = stream[pos: pos + g]
            if len(parts) == g and all(p.shape == w.shape for p in parts):
                assign(tree_path, np.concatenate(parts, axis=-1))
                pos += g
                continue
        raise ValueError(
            f"Shape mismatch at {'/'.join(tree_path)}: expected {shape}, "
            f"h5 provides {w.shape}."
        )

    if pos != len(stream):
        raise ValueError(
            f"{len(stream) - pos} unconsumed h5 weights; architecture "
            "mismatch."
        )
    return out

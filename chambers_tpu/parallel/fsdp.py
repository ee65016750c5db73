"""Fully-sharded data parallelism (ZeRO-3 style) as sharding rules.

No reference counterpart (the TF2/Keras reference scales only by replica
data parallelism, /root/reference/chambers — SURVEY.md §2.8); this is the
standard large-model memory recipe supplied TPU-natively: every weight,
its gradient, and its optimizer moments live 1/N-sharded over the data
axis, and GSPMD inserts the all-gather before each use and the
reduce-scatter behind each gradient. Nothing else changes — the jitted
train step is the same function as replicated DP; only the stored layout
differs.

Expressed as *rules*, not a wrapper: :func:`fsdp_rules` walks the params
pytree once and emits one exact-path ``(regex, PartitionSpec)`` pair per
leaf, sharding the largest eligible axis of each large weight over the
mesh's data axis. The output plugs straight into
``make_param_shardings`` / ``shard_params`` and
``Trainer(param_sharding_rules=...)`` — the Trainer already initializes
optimizer state *after* placement, so Adam's ``mu``/``nu`` inherit the
1/N sharding (the ZeRO memory win) with no trainer changes.

Composes with tensor parallelism by layering: pass the TP rules as
``base_rules`` and each leaf keeps its TP axes while FSDP claims the
largest *remaining* axis — e.g. an MLP kernel ``(d, ff)`` with TP
``P(None, 'model')`` becomes ``P('data', 'model')``, the standard 2D
FSDP×TP layout.
"""

import re
from typing import List, Optional, Sequence, Tuple, Union

import jax
from jax.sharding import Mesh, PartitionSpec as P

from chambers_tpu.parallel.sharding import _match_spec
from chambers_tpu.utils.pytree import param_paths


def fsdp_rules(
    params,
    mesh: Mesh,
    axis: Union[str, Tuple[str, ...]] = "data",
    base_rules: Optional[Sequence[Tuple[str, P]]] = None,
    min_weight_size: int = 2 ** 18,
) -> List[Tuple[str, P]]:
    """Per-leaf FSDP sharding rules for a params pytree.

    For every leaf at least ``min_weight_size`` elements, shard its largest
    axis that (a) is not already claimed by a matching ``base_rules`` spec,
    and (b) divides evenly by the mesh ``axis`` size, over ``axis``. Ties
    go to the earliest axis. Leaves below the threshold (biases, norms)
    and leaves with no eligible axis keep their base spec — gathering a
    few-KB vector every step costs more latency than replicating it costs
    memory.

    :param axis: the mesh axis (or tuple of axes, sharded jointly) holding
        the weight shards — normally the data axis, so the same devices
        that split the batch also split the weights.
    :param base_rules: optional first-match-wins ``(regex, spec)`` rules
        applied *before* FSDP (e.g. ``VIT_TENSOR_PARALLEL_RULES``); FSDP
        only claims axes those rules left unsharded.
    :param min_weight_size: element-count threshold below which a leaf is
        left at its base spec (default 2**18 = a 512×512 matrix).
    :returns: exact-anchored ``(regex, PartitionSpec)`` rules, one per
        leaf, for ``make_param_shardings`` / ``shard_params`` /
        ``Trainer(param_sharding_rules=...)``.
    """
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    mesh_shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    for a in axes:
        if a not in mesh_shape:
            raise ValueError(
                f"mesh has no axis {a!r} (axes: {mesh.axis_names})")
    axis_size = 1
    for a in axes:
        axis_size *= mesh_shape[a]
    base_rules = list(base_rules or [])
    spec_entry = axes[0] if len(axes) == 1 else axes

    rules: List[Tuple[str, P]] = []
    leaves = jax.tree.leaves(params)
    for path, leaf in zip(param_paths(params), leaves):
        base = _match_spec(path, leaf, base_rules)
        dims = list(base) + [None] * (leaf.ndim - len(base))
        used = {a for d in dims if d is not None
                for a in ((d,) if isinstance(d, str) else tuple(d))}
        best = None
        if leaf.size >= min_weight_size and not used.intersection(axes):
            for i, size in enumerate(leaf.shape):
                if dims[i] is None and size % axis_size == 0:
                    if best is None or size > leaf.shape[best]:
                        best = i
        if best is not None:
            dims[best] = spec_entry
        if all(d is None for d in dims):
            dims = []  # fully replicated reads as P(), not P(None, ...)
        rules.append((f"^{re.escape(path)}$", P(*dims)))
    return rules

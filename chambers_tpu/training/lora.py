"""LoRA: low-rank adapters for parameter-efficient fine-tuning.

Beyond-reference capability (the reference fine-tunes its pretrained ViTs
by full-model Keras ``fit``, vision_transformer.py:149-169 weight loading).
On TPU the interesting regime is adapting a large pretrained backbone
without paying optimizer-moment memory for it: freeze the base weights,
train rank-``r`` factors, and let the Trainer's ``trainable=`` partition
(chambers_tpu/training/trainer.py) skip the frozen weight-gradient matmuls
in the backward pass.

Design (idiomatic JAX — a pure tree-to-tree transform, no module rewrite):

- :func:`add_lora` inserts ``{name}_lora_a`` / ``{name}_lora_b`` siblings
  next to each target kernel in the params pytree. ``b`` starts at zero, so
  the adapted model is exactly the base model at initialization.
- :func:`wrap_apply` returns an ``apply_fn`` that materializes
  ``W + scale * A@B`` *inside* the jitted step (one fused add per weight —
  cheap next to the matmul that consumes it) and calls the original module.
  The module itself is untouched; every preset/backbone works unchanged.
- :func:`merge_lora` bakes the deltas and drops the adapters: the result is
  a plain base-shaped params tree for serving/export, numerically identical
  to the adapted forward (it is the same computation).
- :func:`extract_lora` / :func:`insert_lora` move the (tiny) adapter
  subtree between checkpoints, so one base model serves many tasks.

Factorization: for a 2D ``kernel [in, out]`` the delta is the standard
``A[in, r] @ B[r, out]``. The MHA per-head layouts (the reference's
checkpoint contract, /root/reference/chambers/layers/attention.py:51-97)
factor along their actual input/output split: ``w_query/w_key/w_value
(d, n, h)`` use ``A[d, r]`` and ``B[r, n, h]`` (input d → output n·h);
``w_projection (n, d, h)`` — the output merge contracting (n, h) into d —
uses ``A[n*h, r]`` and ``B[r, d]`` with the delta transposed back into the
``(n, d, h)`` layout.

Typical use::

    from chambers_tpu.training import Trainer, lora

    model = lora.apply_to_model(model, rank=8, rng=jax.random.PRNGKey(0))
    trainer = Trainer(model, loss, optimizer, trainable=lora.TRAINABLE)
    trainer.fit(train_ds, epochs=3)
    served = lora.merge_lora(trainer.state.params)   # base-shaped tree

:func:`apply_to_model` installs the adapted forward as the model's apply
override, so ``model.predict``, ``trainer.predict``, and serving export
all see the adapters; the lower-level :func:`add_lora` + :func:`wrap_apply`
pieces compose the same thing by hand.
"""

from __future__ import annotations

import re
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

# Default adapter sites: Dense kernels and the four MHA projection weights.
# 4D conv kernels (patch embeddings) are deliberately not matched — LoRA's
# matrix factorization has no natural conv form and the patch embed is a
# negligible fraction of ViT parameters anyway.
DEFAULT_TARGETS = (r"/kernel$", r"/w_query$", r"/w_key$", r"/w_value$",
                   r"/w_projection$")

# Pass to ``Trainer(trainable=...)`` to train ONLY the adapters.
TRAINABLE = r"_lora_[ab]$"

_A, _B = "_lora_a", "_lora_b"


def _is_target(key, leaf, patterns):
    if key[-1].endswith(_A) or key[-1].endswith(_B):
        return False  # never adapt an adapter
    path = "/" + "/".join(map(str, key))
    if not any(re.search(p, path) for p in patterns):
        return False
    return getattr(leaf, "ndim", 0) in (2, 3)


def _factor_shapes(name: str, shape, rank: int):
    """(a_shape, b_shape) for a target weight of ``shape``."""
    if name == "w_projection" and len(shape) == 3:
        n, d, h = shape
        return (n * h, rank), (rank, d)
    return (shape[0], rank), (rank,) + tuple(shape[1:])


def _delta(name: str, a, b, shape):
    """The low-rank update, reshaped into the weight's layout."""
    if name == "w_projection" and len(shape) == 3:
        n, d, h = shape
        return (a @ b).reshape(n, h, d).transpose(0, 2, 1)
    return jnp.tensordot(a, b, axes=1)


def add_lora(params, rank: int, rng,
             targets: Sequence[str] = DEFAULT_TARGETS,
             stddev: Optional[float] = None):
    """Insert zero-initialized LoRA factors next to each target kernel.

    ``a ~ N(0, stddev)`` (default ``1/sqrt(fan_in)``), ``b = 0`` — the
    adapted forward equals the base forward exactly until training moves
    ``b``. Adapter dtype follows the weight's dtype.
    """
    if rank < 1:
        raise ValueError(f"rank must be >= 1, got {rank}")
    flat = dict(flatten_dict(params))
    out = dict(flat)
    n_added = 0
    for key, leaf in flat.items():
        if not _is_target(key, leaf, targets):
            continue
        name = str(key[-1])
        a_shape, b_shape = _factor_shapes(name, leaf.shape, rank)
        rng, a_rng = jax.random.split(rng)
        sd = stddev if stddev is not None else a_shape[0] ** -0.5
        out[key[:-1] + (name + _A,)] = (
            sd * jax.random.normal(a_rng, a_shape)).astype(leaf.dtype)
        out[key[:-1] + (name + _B,)] = jnp.zeros(b_shape, leaf.dtype)
        n_added += 1
    if n_added == 0:
        sample = ["/".join(map(str, k)) for k in list(flat)[:5]]
        raise ValueError(
            f"targets={targets!r} matched no 2D/3D weights. "
            f"Example param paths: {sample}"
        )
    return unflatten_dict(out)


def _validate_adapters(flat, require_base: bool = True):
    """Every ``_lora_a`` must pair with its ``_lora_b`` (and, when
    ``require_base``, sit next to its base weight) — an orphan half-adapter
    means a filtered/corrupted tree and must fail loudly, not silently
    serve the base model."""
    for key in flat:
        name = str(key[-1])
        if name.endswith(_A):
            stem = name[: -len(_A)]
            other, missing = key[:-1] + (stem + _B,), _B
        elif name.endswith(_B):
            stem = name[: -len(_B)]
            other, missing = key[:-1] + (stem + _A,), _A
        else:
            continue
        path = "/".join(map(str, key))
        if other not in flat:
            raise ValueError(
                f"orphan adapter leaf {path}: its {stem}{missing} "
                "counterpart is missing (filtered or corrupted tree?)")
        if require_base and key[:-1] + (stem,) not in flat:
            raise ValueError(
                f"adapter {path} has no base weight "
                f"{'/'.join(map(str, key[:-1] + (stem,)))}")


def merge_lora(params, scale: float = 1.0):
    """Bake ``W + scale * A@B`` and drop the adapter leaves.

    The returned tree has the base model's exact structure — load it into
    the unmodified module, export it, or quantize it. Use the SAME
    ``scale`` the model trained with (:func:`wrap_apply`'s ``scale``).
    """
    flat = dict(flatten_dict(params))
    _validate_adapters(flat)
    out = {}
    for key, leaf in flat.items():
        name = str(key[-1])
        if name.endswith(_A) or name.endswith(_B):
            continue
        a = flat.get(key[:-1] + (name + _A,))
        if a is not None:
            b = flat[key[:-1] + (name + _B,)]
            d = _delta(name, a.astype(jnp.float32), b.astype(jnp.float32),
                       leaf.shape)
            leaf = (leaf.astype(jnp.float32) + scale * d).astype(leaf.dtype)
        out[key] = leaf
    return unflatten_dict(out)


def wrap_apply(module, scale: float = 1.0) -> Callable:
    """An ``apply_fn`` for :class:`~chambers_tpu.training.Trainer` (and
    serving) that merges the adapters inside the step, then applies the
    original module. Accepts the Trainer's ``mutable`` kwarg so BatchNorm
    stats and sown MoE aux losses keep working."""

    def apply_fn(variables, x, deterministic=True, rngs=None, mutable=False):
        variables = {**variables,
                     "params": merge_lora(variables["params"], scale=scale)}
        return module.apply(variables, x, deterministic=deterministic,
                            rngs=rngs, mutable=mutable)

    return apply_fn


def apply_to_model(model, rank: int, rng,
                   targets: Sequence[str] = DEFAULT_TARGETS,
                   scale: float = 1.0, stddev: Optional[float] = None):
    """One-call LoRA setup on a :class:`~chambers_tpu.models.Model`:
    adds the adapters to its variables AND installs :func:`wrap_apply` as
    the model's apply override, so ``model(x)``, ``model.predict``,
    serving export, and a ``Trainer`` built on it all run the adapted
    forward — only ``trainable=lora.TRAINABLE`` is left to pass::

        model = lora.apply_to_model(model, rank=8, rng=key)
        trainer = Trainer(model, loss, optimizer, trainable=lora.TRAINABLE)
    """
    params = add_lora(model.variables["params"], rank, rng,
                      targets=targets, stddev=stddev)
    model.replace_variables({**model.variables, "params": params})
    return model.with_apply_fn(wrap_apply(model.module, scale=scale))


def extract_lora(params):
    """The adapter-only subtree (tiny — this is the per-task checkpoint)."""
    flat = flatten_dict(params)
    adapters = {k: v for k, v in flat.items()
                if str(k[-1]).endswith(_A) or str(k[-1]).endswith(_B)}
    if not adapters:
        raise ValueError("params carry no LoRA adapters (add_lora first)")
    _validate_adapters(adapters, require_base=False)
    return unflatten_dict(adapters)


def insert_lora(base_params, adapters):
    """Attach an :func:`extract_lora` subtree onto a base params tree
    (shape-checked against the factorization of each target weight)."""
    flat = dict(flatten_dict(base_params))
    adapter_flat = dict(flatten_dict(adapters))
    _validate_adapters(adapter_flat, require_base=False)
    for key, leaf in adapter_flat.items():
        name = str(key[-1])
        if not (name.endswith(_A) or name.endswith(_B)):
            raise ValueError(f"not an adapter leaf: {'/'.join(map(str, key))}")
        wname = name[: -len(_A)]
        wkey = key[:-1] + (wname,)
        if wkey not in flat:
            raise ValueError(
                f"adapter {'/'.join(map(str, key))} has no base weight "
                f"{'/'.join(map(str, wkey))}")
        rank = leaf.shape[0 if name.endswith(_B) else -1]
        a_shape, b_shape = _factor_shapes(wname, flat[wkey].shape, rank)
        expected = a_shape if name.endswith(_A) else b_shape
        if tuple(leaf.shape) != tuple(expected):
            raise ValueError(
                f"adapter {'/'.join(map(str, key))} shape {leaf.shape} does "
                f"not factor base weight {flat[wkey].shape} (want {expected})")
        flat[key] = leaf
    return unflatten_dict(flat)

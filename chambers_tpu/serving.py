"""Ahead-of-time model export for serving.

The reference's deployment artifact is the full Keras SavedModel that
``ExperimentCallback`` writes at train end (callbacks.py:103) — a
self-contained graph a server loads without the model-building code. The
TPU-native equivalent is a serialized ``jax.export`` artifact: the jitted
forward pass is lowered to StableHLO with the trained variables baked in as
constants, written as one file, and reloaded with
:func:`load_serving_artifact` — no ``chambers_tpu`` model code (or Python
model definition at all) needed at serving time. StableHLO carries XLA's
forward/backward-compatibility guarantees across jax releases and
compiles for whichever accelerator the serving host has.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_serving_artifact(
    model,
    path: str,
    input_shape: Sequence[int],
    batch_size: Optional[int] = None,
    input_dtype=jnp.float32,
    platforms: Optional[Sequence[str]] = None,
):
    """Serialize ``model``'s forward pass (variables baked in) to ``path``.

    :param model: a :class:`chambers_tpu.models.Model` (``apply_fn`` +
        ``variables``).
    :param input_shape: per-example shape, e.g. ``(224, 224, 3)``.
    :param batch_size: fixed batch size; ``None`` exports with a symbolic
        batch dimension, so the artifact serves any batch size.
    :param platforms: lowering platforms, e.g. ``("tpu", "cpu")`` for an
        artifact exported on one kind of host and served on another;
        default: the exporting machine's native platform only.
    :returns: the number of bytes written.
    """
    variables = model.variables

    def fn(x):
        # serving is inference: always the deterministic path (a training
        # export would need dropout RNG plumbing that apply_fn(variables, x)
        # does not carry)
        return model.apply_fn(variables, x, deterministic=True)

    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, *input_shape), input_dtype)
    else:
        spec = jax.ShapeDtypeStruct((batch_size, *input_shape), input_dtype)

    kwargs = {} if platforms is None else {"platforms": tuple(platforms)}
    exported = jax_export.export(jax.jit(fn), **kwargs)(spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_serving_artifact(path: str):
    """Load an exported artifact; returns ``fn(images) -> outputs``.

    The callable is ``jax.jit``-wrapped: each distinct input shape compiles
    once and later calls dispatch through the compiled-function cache
    (eager ``Exported.call`` re-traces per invocation — ~30× dispatch
    overhead in a request loop).
    """
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())

    return jax.jit(exported.call)

"""Post-training int8 quantization for the serving path.

The reference has no quantization story (its fastest inference mode is the
Keras ``mixed_float16`` policy, /root/reference/chambers/utils/generic.py:32-41).
On TPU v5e the MXU runs int8 matmuls at ~2x the bf16 rate, so this module
adds a capability beyond the reference: weight-only-storage, dynamically
quantized int8 inference.

Scheme (standard dynamic PTQ, calibration-free):

- **Weights**: symmetric per-output-channel int8 — ``scale = absmax / 127``
  over the contraction axes, stored alongside as float32. The quantized
  kernel keeps its exact original shape and parameter path (only the dtype
  changes to int8), so the variables tree stays checkpoint-shaped; scales
  live in a parallel ``"quant"`` collection mirroring the params tree with
  ``<name>_scale`` leaves.
- **Activations**: symmetric per-token int8 computed on the fly (absmax over
  the contraction axes of each row). No calibration data needed, and the
  quantize op fuses into the preceding elementwise work under XLA.
- **Compute**: ``int8 @ int8 -> int32`` on the MXU
  (``preferred_element_type=jnp.int32``), rescaled by ``s_x * s_w`` in f32
  and cast back to the layer compute dtype. Biases, LayerNorms, softmax,
  and the patch-embedding conv stay in the original dtypes.

What gets quantized: 2-D ``nn.Dense``/:class:`QuantDense` kernels, the
MultiHeadAttention projection tensors (``w_query/w_key/w_value`` ``(d,n,h)``
and ``w_projection`` ``(n,d,h)``), and the MoE expert banks (``w1/w2``
``(E,d,F)/(E,F,d)``, per-expert-per-channel scales). Conv kernels (4-D),
biases, norms, embeddings, and the MoE router are left untouched —
consuming layers that don't understand the int8 layout never see it.

Quantized variables are **inference-only**: ``jnp.round`` has zero gradient,
so training through them would silently learn nothing. The Trainer refuses
a variables tree carrying a ``"quant"`` collection.

Usage::

    model = ViTL16(weights=..., dtype=jnp.bfloat16)
    qvars = quantize_variables(model.variables)
    logits = jax.jit(model.apply_fn)(qvars, images, deterministic=True)
    # or bake into an AOT serving artifact:
    model.variables = qvars
    export_serving_artifact(model, path, input_shape=(384, 384, 3))

Scope caveat: quantization is keyed on parameter names, so it is safe for
every module in this package (all Dense layers are :class:`QuantDense`)
but NOT for arbitrary user modules — a plain ``flax.linen.nn.Dense`` would
receive a raw int8 kernel it multiplies unscaled. User modules must use
:class:`QuantDense` (a drop-in ``nn.Dense``) before quantizing.

Measured (tools/bench_int8_matmul.py, v5e, within-run comparisons): at
ViT-L/16@384 batch-128 MLP shapes [73856,1024,4096] the dynamic-quant
pipeline runs 17% faster than bf16; at [8192^3] 39% faster (the dynamic
activation quantization amortizes to ~free as K grows). At ViT-B@224
batch-32 shapes the quantize overhead cancels the MXU win — quantization
is a large-batch / large-model serving tool, not a universal default.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

INT8_MAX = 127.0
_EPS = 1e-12

# parameter names this module knows how to quantize, with their contraction
# ("reduce") axes; everything else is left in the original dtype
_MHA_QKV = ("w_query", "w_key", "w_value")  # (d, n, h): contract d
_MHA_PROJ = "w_projection"                  # (n, d, h): contract (n, h)
_MOE_BANKS = ("w1", "w2")                   # (E, d, F)/(E, F, d): contract ax 1


def quantize_weight(w, reduce_axes):
    """Symmetric per-output-channel int8 quantization.

    :param w: weight tensor.
    :param reduce_axes: contraction axes — the absmax is taken over these,
        leaving one scale per output channel.
    :returns: ``(w_q int8, scale f32)`` with ``w ≈ w_q * scale`` (scale
        keeps the reduced axes as size-1 dims so it broadcasts against w).
    """
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes,
                keepdims=True)
    scale = jnp.maximum(a / INT8_MAX, _EPS)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale),
                 -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale


def dynamic_quantize(x, reduce_axes=(-1,)):
    """Per-row symmetric int8 for activations (absmax over contraction axes).

    :returns: ``(x_q int8, scale f32)`` with the reduced axes kept as
        size-1 dims in ``scale``.
    """
    a = jnp.max(jnp.abs(x).astype(jnp.float32), axis=reduce_axes,
                keepdims=True)
    scale = jnp.maximum(a / INT8_MAX, _EPS)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale


def int8_einsum(eq: str, x, w_q, x_reduce_axes=(-1,)):
    """Shared int8 contraction core: quantize ``x`` per row over its
    contraction axes, contract with the int8 weight accumulating in int32.

    :returns: ``(acc float32, s_x)`` — callers apply their layout-specific
        weight-scale broadcast, multiply by ``s_x`` (reduced axes kept as
        size-1 dims), and cast to the compute dtype.
    """
    x_q, s_x = dynamic_quantize(x, x_reduce_axes)
    acc = jnp.einsum(eq, x_q, w_q, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32), s_x


class QuantDense(nn.Dense):
    """``nn.Dense`` that takes the int8 MXU path when the variables carry a
    ``"quant"`` scale for its kernel (see :func:`quantize_variables`).

    Without a quant collection this computes exactly what ``nn.Dense``
    computes (same param names/shapes/dtype promotion), so it is a drop-in
    swap everywhere the package used ``nn.Dense`` — checkpoints and init
    are unchanged.
    """

    @nn.compact
    def __call__(self, inputs):
        kernel = self.param(
            "kernel", self.kernel_init,
            (jnp.shape(inputs)[-1], self.features), self.param_dtype,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,),
                       self.param_dtype)
            if self.use_bias else None
        )
        if not self.has_variable("quant", "kernel_scale"):
            # the exact nn.Dense computation (flax/linen/linear.py)
            x, kernel, bias = nn.dtypes.promote_dtype(
                inputs, kernel, bias, dtype=self.dtype)
            y = jax.lax.dot_general(
                x, kernel, (((x.ndim - 1,), (0,)), ((), ())),
                precision=self.precision,
            )
            if bias is not None:
                y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
            return y

        s_w = self.get_variable("quant", "kernel_scale")  # [1, features]
        acc, s_x = int8_einsum("...k,kf->...f", inputs, kernel)
        # the float branch's output dtype is promote_dtype(inputs, kernel,
        # bias, dtype=self.dtype); the kernel's LOGICAL dtype here is
        # param_dtype (it is stored int8), so mirror that promotion exactly
        dtype = self.dtype or jnp.result_type(inputs, self.param_dtype)
        y = (acc * s_x * s_w.reshape(
            (1,) * (acc.ndim - 1) + (-1,))).astype(dtype)
        if bias is not None:
            y = y + jnp.reshape(bias.astype(dtype),
                                (1,) * (y.ndim - 1) + (-1,))
        return y


def _quantize_params(params: dict, quant: dict, path: str,
                     include: Optional[re.Pattern]) -> dict:
    """Recursively quantize eligible leaves; fills ``quant`` in-place with
    the mirrored scale tree. Returns the new params subtree."""
    out = {}
    for name, value in params.items():
        sub_path = f"{path}/{name}" if path else name
        if isinstance(value, dict):
            sub_quant: dict = {}
            out[name] = _quantize_params(value, sub_quant, sub_path, include)
            if sub_quant:
                quant[name] = sub_quant
            continue
        if include is not None and not include.search(sub_path):
            out[name] = value
            continue
        if name == "kernel" and getattr(value, "ndim", 0) == 2:
            q, s = quantize_weight(value, (0,))          # scale [1, N]
            out[name], quant[f"{name}_scale"] = q, s
        elif name in _MHA_QKV and getattr(value, "ndim", 0) == 3:
            q, s = quantize_weight(value, (0,))          # scale [1, n, h]
            out[name], quant[f"{name}_scale"] = q, s
        elif name == _MHA_PROJ and getattr(value, "ndim", 0) == 3:
            q, s = quantize_weight(value, (0, 2))        # scale [1, d, 1]
            out[name], quant[f"{name}_scale"] = q, s
        elif name in _MOE_BANKS and getattr(value, "ndim", 0) == 3:
            q, s = quantize_weight(value, (1,))          # scale [E, 1, out]
            out[name], quant[f"{name}_scale"] = q, s
        else:
            out[name] = value

    # grouped weights must quantize atomically: the consuming layers key
    # their whole int8 path on ONE sentinel scale (w_query_scale /
    # w1_scale), so an `include` regex that splits a group would feed raw
    # int8 integers through a float einsum (silent garbage) or crash on a
    # missing companion scale
    for group in (set(_MHA_QKV) | {_MHA_PROJ}, set(_MOE_BANKS)):
        present = [n for n in group
                   if n in out and not isinstance(out[n], dict)]
        done = [n for n in present if f"{n}_scale" in quant]
        if done and len(done) != len(present):
            raise ValueError(
                f"include pattern splits the quantization group at "
                f"{path or '<root>'!r}: {sorted(done)} quantized but "
                f"{sorted(set(present) - set(done))} not — these weights "
                "are consumed by one layer and must quantize together"
            )
    return out


def quantize_variables(variables, include: Optional[str] = None):
    """Quantize a model's variables for int8 serving.

    :param variables: the full variables dict (``{"params": ..., ...}``).
    :param include: optional regex over ``/``-joined parameter paths; only
        matching leaves are quantized (default: every eligible leaf).
    :returns: a new variables dict — eligible kernels replaced by int8
        tensors of identical shape, plus a ``"quant"`` collection holding
        the per-output-channel scales. Other collections pass through.
    """
    if "quant" in variables:
        raise ValueError("variables are already quantized")
    params = variables.get("params")
    if params is None:
        raise ValueError("variables have no 'params' collection")
    pattern = re.compile(include) if include else None
    quant: dict = {}
    new_params = _quantize_params(dict(params), quant, "", pattern)
    out = dict(variables)
    out["params"] = new_params
    if not quant:
        raise ValueError(
            "no quantizable parameters matched; expected 2-D Dense kernels "
            "or MultiHeadAttention projection tensors"
            + (f" under include={include!r}" if include else "")
        )
    out["quant"] = quant
    return out


def dequantize_variables(variables):
    """Inverse of :func:`quantize_variables` (up to quantization error) —
    restores float kernels from the int8 tensors and their scales."""

    def walk(params, quant):
        out = {}
        for name, value in params.items():
            if isinstance(value, dict):
                out[name] = walk(value, quant.get(name, {}))
            elif f"{name}_scale" in quant:
                out[name] = (value.astype(jnp.float32)
                             * quant[f"{name}_scale"])
            else:
                out[name] = value
        return out

    if "quant" not in variables:
        raise ValueError("variables carry no 'quant' collection")
    out = {k: v for k, v in variables.items() if k != "quant"}
    out["params"] = walk(dict(variables["params"]), dict(variables["quant"]))
    return out

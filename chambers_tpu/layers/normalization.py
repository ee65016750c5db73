"""L2 normalization and a stats-dtype-selectable LayerNorm.

Parity: reference ``chambers/layers/normalization.py:5-24`` wraps
``tf.nn.l2_normalize`` (x / max(||x||, eps) with eps=1e-12).
"""

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def l2_normalize(x, axis=-1, epsilon=1e-12):
    norm_sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jnp.reciprocal(jnp.sqrt(jnp.maximum(norm_sq, epsilon)))


class L2Normalization:
    """Callable layer normalizing the input by its L2 norm along ``axis``."""

    def __init__(self, axis=-1):
        self.axis = axis

    def __call__(self, inputs):
        return l2_normalize(inputs, axis=self.axis)


class FastLayerNorm(nn.Module):
    """LayerNorm whose mean/variance run in ``stats_dtype``.

    ``flax.linen.LayerNorm`` always promotes statistics to float32; under a
    bf16 mixed-precision policy that promotion is ~10% of a ViT train step
    (BASELINE.md). With ``stats_dtype=bfloat16`` the statistics stay in the
    compute dtype — exactly what the reference does under Keras
    ``mixed_float16``, where ``LayerNormalization`` computes in the layer's
    compute dtype. Parameter names/shapes (``scale``, ``bias``) match
    ``nn.LayerNorm``, so checkpoints are interchangeable; the fp32-stats
    default path belongs to ``nn.LayerNorm`` itself (see
    ``chambers_tpu.layers.transformer``), keeping exact parity numerics.
    """

    epsilon: float = 1e-6
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    stats_dtype: Any = jnp.bfloat16
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x):
        from flax.linen import dtypes as flax_dtypes

        d = x.shape[-1]
        sd = self.stats_dtype
        xs = x.astype(sd)
        mu = xs.mean(-1, keepdims=True)
        var = ((xs - mu) ** 2).mean(-1, keepdims=True)
        y = (xs - mu) * jax.lax.rsqrt(var + jnp.asarray(self.epsilon, sd))
        promote = [x]
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (d,),
                               self.param_dtype)
            promote.append(scale)
            y = y * scale.astype(sd)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (d,),
                              self.param_dtype)
            promote.append(bias)
            y = y + bias.astype(sd)
        # same output-dtype contract as nn.LayerNorm: dtype if given, else
        # the promotion of input and param dtypes — so enabling bf16 *stats*
        # never silently changes the activation dtype downstream
        out_dtype = flax_dtypes.canonicalize_dtype(*promote, dtype=self.dtype)
        return y.astype(out_dtype)

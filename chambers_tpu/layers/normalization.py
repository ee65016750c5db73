"""L2 normalization.

Parity: reference ``chambers/layers/normalization.py:5-24`` wraps
``tf.nn.l2_normalize`` (x / max(||x||, eps) with eps=1e-12).
"""

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

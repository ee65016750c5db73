"""Activation functions.

Parity: reference ``chambers/activations.py:5-56`` defines GELU with an exact
(erf) form by default and a tanh approximation behind ``approximate=True``.
The exact-erf form is part of the ViT checkpoint-parity contract (the released
weights were trained with erf GELU), so ``approximate`` defaults to False here
as well.
"""

import jax.numpy as jnp
from jax import lax

_SQRT_2 = 1.4142135623730951
_SQRT_2_OVER_PI = 0.7978845608028654


def gelu(x, approximate: bool = False):
    """Gaussian Error Linear Unit: ``x * P(X <= x)`` with ``X ~ N(0, 1)``.

    ``approximate=False`` uses the exact erf formulation; ``approximate=True``
    uses the tanh approximation (same constants as the reference).
    """
    if approximate:
        coeff = jnp.asarray(0.044715, x.dtype)
        return 0.5 * x * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (x + coeff * x * x * x)))
    return 0.5 * x * (1.0 + lax.erf(x / jnp.asarray(_SQRT_2, x.dtype)))

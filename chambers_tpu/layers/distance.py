"""Pairwise distance / similarity layers.

Parity: reference ``chambers/layers/distance.py``. Each layer consumes a list
``[a, b]`` and reduces along ``axis``. ``CosineSimilarity`` rescales to
``[0, 1]`` via ``(cos + 1) / 2`` (distance.py:84-85); the Angular/Cubic/Sqrt
subclasses use the alternative rescalings of distance.py:88-101.
"""

import math

import jax.numpy as jnp

from chambers_tpu.layers.normalization import l2_normalize


class Distance:
    def __init__(self, axis=-1, keepdims=False):
        self.axis = axis
        self.keepdims = keepdims


class L1Distance(Distance):
    """``l1 = sum(|a - b|)``."""

    def __call__(self, inputs):
        a, b = inputs
        return jnp.sum(jnp.abs(a - b), axis=self.axis, keepdims=self.keepdims)


class L2Distance(Distance):
    """``l2 = sqrt(sum((a - b)^2))``."""

    def __call__(self, inputs):
        a, b = inputs
        return jnp.sqrt(
            jnp.sum(jnp.square(a - b), axis=self.axis, keepdims=self.keepdims)
        )


class CosineSimilarity(Distance):
    """Cosine similarity rescaled to ``[0, 1]``."""

    def __call__(self, inputs):
        a, b = inputs
        return self._scale(self._cosine_similarity(a, b))

    def _cosine_similarity(self, a, b):
        a = l2_normalize(a, axis=self.axis)
        b = l2_normalize(b, axis=self.axis)
        return jnp.sum(a * b, axis=self.axis, keepdims=self.keepdims)

    def _scale(self, cos_sim):
        return (cos_sim + 1) / 2


class AngularCosineSimilarity(CosineSimilarity):
    def _scale(self, cos_sim):
        return 1 - jnp.arccos(cos_sim) / math.pi


class CubicCosineSimilarity(CosineSimilarity):
    def _scale(self, cos_sim):
        return 0.5 + 0.25 * cos_sim + 0.25 * jnp.power(cos_sim, 3)


class SqrtCosineSimilarity(CosineSimilarity):
    def _scale(self, cos_sim):
        return 1 - jnp.sqrt((1 - cos_sim) / 2)

"""Pair miners (dense-mask formulation).

Parity: reference ``chambers/miners.py``. The reference mines on *ragged*
per-row pair sets (tf.ragged.boolean_mask, miners.py:23-27); ragged shapes are
XLA-hostile, so here a miner consumes the dense ``[n, n]`` similarity matrix
plus boolean pair masks and returns refined masks. Reductions over masked
entries use ±inf identity padding, which reproduces ragged reduce_max/min
semantics exactly (including empty rows → identity).
"""

from abc import ABC, abstractmethod

import jax.numpy as jnp


def masked_max(x, mask, axis=1):
    return jnp.max(jnp.where(mask, x, -jnp.inf), axis=axis)


def masked_min(x, mask, axis=1):
    return jnp.min(jnp.where(mask, x, jnp.inf), axis=axis)


class Miner(ABC):
    """Refines positive/negative pair masks given the similarity matrix."""

    def __init__(self, name=None):
        self.name = name

    def __call__(self, similarity_matrix, positive_mask, negative_mask):
        mined_pos, mined_neg = self.compute_masks(
            similarity_matrix, positive_mask, negative_mask
        )
        return positive_mask & mined_pos, negative_mask & mined_neg

    @abstractmethod
    def compute_masks(self, similarity_matrix, positive_mask, negative_mask):
        ...

    def get_config(self):
        return {"name": self.name}

    @classmethod
    def from_config(cls, config):
        return cls(**config)


class MultiSimilarityMiner(Miner):
    """Keep positive pairs ``< max(neg) + margin`` and negative pairs
    ``> min(pos) - margin`` per row (miners.py:48-60)."""

    def __init__(self, margin, name="multi_similarity_miner"):
        super().__init__(name=name)
        self.margin = margin

    def compute_masks(self, similarity_matrix, positive_mask, negative_mask):
        pos_thresh = masked_max(similarity_matrix, negative_mask) + self.margin
        neg_thresh = masked_min(similarity_matrix, positive_mask) - self.margin

        mined_pos = similarity_matrix < pos_thresh[:, None]
        mined_neg = similarity_matrix > neg_thresh[:, None]
        return mined_pos, mined_neg

    def get_config(self):
        config = super().get_config()
        config["margin"] = self.margin
        return config

"""Pair-based metric-learning losses (dense-mask formulation).

Parity: reference ``chambers/losses/metric_learning.py``. The reference's
pipeline (metric_learning.py:29-51) is: embeddings → dot-product similarity
matrix → boolean pos/neg masks from label equality → optional diagonal /
negative-label masking → *ragged* per-row pair sets → miner → per-row loss.

Ragged tensors don't exist under XLA; every per-row reduction in the reference
is a sum/max/min over the kept pairs, so the dense reformulation keeps the
``[n, n]`` similarity matrix plus boolean masks and reduces with masked
identities — exactly equivalent, including rows with zero valid pairs
(ragged sum over an empty row = 0 → masked sum = 0). SURVEY.md §2.1 flags
this rewrite as part of the behavioral contract.

Conventions preserved:
- label −1 marks "negative-only" triplet samples; ``ignore_negative_labels``
  removes such *columns* from both masks (the reference's [n] & [n, n]
  broadcast masks candidate columns, metric_learning.py:80-83).
- ``ignore_diag`` removes mirror pairs (metric_learning.py:85-91).
- the full Keras ``Loss`` call contract (reference metric_learning.py:9
  inherits ``tf.keras.losses.Loss``): ``call`` returns the per-row vector;
  ``__call__(y_true, y_pred, sample_weight=None)`` weights row ``i``'s
  (anchor ``i``'s) loss by ``sample_weight[i]`` and reduces per the
  constructor's ``reduction`` (default ``"sum_over_batch_size"`` — the mean
  over rows when unweighted). Semantics pinned against tf.keras in
  ``tests/losses/test_loss_contract.py``.
"""

from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp

from chambers_tpu.losses.base import Loss
from chambers_tpu.miners import MultiSimilarityMiner as _MSMiner

_EPSILON = 1e-7  # keras backend epsilon
_DEFAULT_MINER = object()  # sentinel: "use the class default miner"


class PairLoss(Loss, ABC):
    def __init__(self, ignore_diag=True, ignore_negative_labels=True, miner=None,
                 name=None, reduction="sum_over_batch_size"):
        """
        :param ignore_diag: ignore the diagonal (mirror) pairs of the
            similarity matrix.
        :param ignore_negative_labels: exclude samples with negative labels
            from the candidate pairs.
        :param miner: optional pair miner.
        :param reduction: Keras ``Loss`` reduction over the per-row losses
            (``"sum_over_batch_size"`` | ``"sum"`` | ``"none"``). A
            ``sample_weight`` passed to ``__call__`` weights per ROW — pair
            ``(i, j)``'s contribution is weighted by anchor ``i``'s weight
            (the ragged reference reduces per anchor row, so the row is the
            natural "sample" of a pair loss).
        """
        super().__init__(reduction=reduction, name=name)
        self.ignore_diag = ignore_diag
        self.ignore_negative_labels = ignore_negative_labels
        self.miner = miner

    def call(self, y_true, y_pred):
        """Per-row loss vector ``[n]`` for labels ``[n]`` and embeddings
        ``[n, d]`` (or a precomputed matrix for the Matrix variants)."""
        y_true = jnp.asarray(y_true)
        y_pred = jnp.asarray(y_pred)

        similarity_matrix = self.compute_similarity_matrix(y_pred)
        pos_mask, neg_mask = self.get_signed_masks(similarity_matrix, y_true)

        if self.miner is not None:
            pos_mask, neg_mask = self.miner(similarity_matrix, pos_mask, neg_mask)

        return self.compute_loss(similarity_matrix, pos_mask, neg_mask)

    def compute_similarity_matrix(self, y_pred):
        """Dot-product similarity between all embedding pairs → ``[n, n]``."""
        return jnp.matmul(y_pred, y_pred.T)

    def compute_signed_masks(self, y_true):
        labels = jnp.reshape(y_true, [-1, 1])
        pos_mask = labels == labels.T
        return pos_mask, ~pos_mask

    def get_signed_masks(self, similarity_matrix, y_true):
        pos_mask, neg_mask = self.compute_signed_masks(y_true)

        if self.ignore_negative_labels:
            # [n] & [n, n] broadcasts over rows -> masks *columns* with
            # negative labels (metric_learning.py:80-83)
            not_triplet_neg = jnp.reshape(y_true, [-1]) >= 0
            pos_mask = pos_mask & not_triplet_neg
            neg_mask = neg_mask & not_triplet_neg

        if self.ignore_diag:
            n, m = similarity_matrix.shape
            inverse_eye = ~jnp.eye(n, m, dtype=bool)
            pos_mask = pos_mask & inverse_eye
            neg_mask = neg_mask & inverse_eye

        return pos_mask, neg_mask

    @abstractmethod
    def compute_loss(self, similarity_matrix, positive_mask, negative_mask):
        """Per-row loss from the similarity matrix and final pair masks."""
        ...


class PairMatrixLoss(PairLoss):
    """Variant where ``y_pred`` is already a similarity matrix and ``y_true``
    is a binary pair matrix (metric_learning.py:114-121)."""

    def compute_similarity_matrix(self, y_pred):
        return y_pred

    def compute_signed_masks(self, y_true):
        pos_mask = y_true.astype(bool)
        return pos_mask, ~pos_mask

    def get_signed_masks(self, similarity_matrix, y_true):
        pos_mask, neg_mask = self.compute_signed_masks(y_true)
        # ignore_negative_labels is meaningless for a binary pair matrix
        if self.ignore_diag:
            n, m = similarity_matrix.shape
            inverse_eye = ~jnp.eye(n, m, dtype=bool)
            pos_mask = pos_mask & inverse_eye
            neg_mask = neg_mask & inverse_eye
        return pos_mask, neg_mask


class _MultiSimilarityMixin:
    """MS loss (Wang et al. CVPR'19, arXiv:1904.06627):
    softplus-of-sum-exp around threshold λ with scales α (pos) / β (neg)
    (metric_learning.py:158-178)."""

    def compute_loss(self, similarity_matrix, positive_mask, negative_mask):
        # log(1 + Σ exp(x)) computed as logaddexp(0, logsumexp(x)) — exactly
        # the reference math when nothing overflows, but (a) masked pairs
        # (e.g. the diagonal of unnormalized embeddings) can never poison
        # values/gradients, and (b) large real similarities saturate to a
        # finite, correctly-sloped loss instead of inf/NaN at exp overflow
        # (beta=40 overflows float32 at sim ≈ 2.7).
        pos = self._row_term(similarity_matrix, positive_mask, -self.pos_scale)
        neg = self._row_term(similarity_matrix, negative_mask, self.neg_scale)
        return pos / self.pos_scale + neg / self.neg_scale

    def _row_term(self, sim, mask, signed_scale):
        x = signed_scale * (sim - self.threshold)
        has_pairs = jnp.any(mask, axis=1)
        x = jnp.where(mask, x, -jnp.inf)
        # rows with zero pairs: substitute a dummy row so logsumexp of
        # all--inf cannot emit NaN gradients, then zero the result
        x_safe = jnp.where(has_pairs[:, None], x, 0.0)
        lse = jax.nn.logsumexp(x_safe, axis=1)
        term = jnp.logaddexp(0.0, lse)  # = log(1 + Σ exp(x))
        return jnp.where(has_pairs, term, 0.0)


class MultiSimilarityLoss(_MultiSimilarityMixin, PairLoss):
    def __init__(self, pos_scale=2.0, neg_scale=40.0, threshold=0.5,
                 ignore_diag=True, ignore_negative_labels=True,
                 miner=_DEFAULT_MINER, name="multi_similarity_loss",
                 reduction="sum_over_batch_size"):
        if miner is _DEFAULT_MINER:
            miner = _MSMiner(margin=0.1)  # reference default, metric_learning.py:143
        super().__init__(
            ignore_diag=ignore_diag,
            ignore_negative_labels=ignore_negative_labels,
            miner=miner,
            name=name,
            reduction=reduction,
        )
        self.pos_scale = pos_scale  # alpha
        self.neg_scale = neg_scale  # beta
        self.threshold = threshold  # lambda


class MultiSimilarityLossMatrix(_MultiSimilarityMixin, PairMatrixLoss):
    def __init__(self, pos_scale=2.0, neg_scale=40.0, threshold=0.5,
                 ignore_diag=True, ignore_negative_labels=True,
                 miner=_DEFAULT_MINER, name="multi_similarity_loss",
                 reduction="sum_over_batch_size"):
        if miner is _DEFAULT_MINER:
            miner = _MSMiner(margin=0.1)
        super().__init__(
            ignore_diag=ignore_diag,
            ignore_negative_labels=ignore_negative_labels,
            miner=miner,
            name=name,
            reduction=reduction,
        )
        self.pos_scale = pos_scale
        self.neg_scale = neg_scale
        self.threshold = threshold


class ContrastiveLoss(PairLoss):
    """Similarity-space contrastive loss (metric_learning.py:239-286):
    positives below ``positive_margin`` and negatives above
    ``negative_margin`` contribute, raised to ``exponent``."""

    def __init__(self, positive_margin=1.0, negative_margin=0.3, exponent=2,
                 ignore_diag=True, ignore_negative_labels=True, miner=None,
                 name="contrastive_loss", reduction="sum_over_batch_size"):
        super().__init__(
            ignore_diag=ignore_diag,
            ignore_negative_labels=ignore_negative_labels,
            miner=miner,
            name=name,
            reduction=reduction,
        )
        self.positive_margin = positive_margin
        self.negative_margin = negative_margin
        self.exponent = exponent

    def compute_loss(self, similarity_matrix, positive_mask, negative_mask):
        pos_pair_loss = (
            jnp.power(self.positive_margin - similarity_matrix, self.exponent)
            / self.exponent
        )
        pos_loss = jnp.sum(jnp.where(positive_mask, pos_pair_loss, 0.0), axis=1)

        neg_pair_loss = (
            jnp.power(
                jnp.maximum(0.0, similarity_matrix - self.negative_margin),
                self.exponent,
            )
            / self.exponent
        )
        neg_loss = jnp.sum(jnp.where(negative_mask, neg_pair_loss, 0.0), axis=1)

        return pos_loss + neg_loss


def categorical_crossentropy_per_row(y_true, y_pred, from_logits=False):
    """Keras-semantics categorical crossentropy, per-row vector ``[n]``.

    With ``from_logits=False`` predictions are renormalized to sum to 1 and
    clipped to [eps, 1-eps] — required for NTXent parity with the reference's
    ``tf.keras.losses.CategoricalCrossentropy``.
    """
    y_true = y_true.astype(jnp.float32)
    if from_logits:
        log_p = y_pred - jax.nn.logsumexp(y_pred, axis=-1, keepdims=True)
    else:
        p = y_pred / jnp.sum(y_pred, axis=-1, keepdims=True)
        p = jnp.clip(p, _EPSILON, 1.0 - _EPSILON)
        log_p = jnp.log(p)
    return -jnp.sum(y_true * log_p, axis=-1)


def categorical_crossentropy(y_true, y_pred, from_logits=False):
    """Keras-semantics categorical crossentropy, mean over rows."""
    return jnp.mean(
        categorical_crossentropy_per_row(y_true, y_pred,
                                         from_logits=from_logits)
    )


class NTXentLoss(Loss):
    """SimCLR-style NT-Xent (metric_learning.py:290-318): similarity matrix
    over temperature, mirror pairs masked with −1e9, crossentropy against the
    one-hot positive-pair matrix.

    Usage note (inherited reference behavior): with the default
    ``from_logits=False`` the raw similarity matrix is renormalized as if it
    were probabilities — with the −1e9 diagonal this saturates the clip and
    yields zero gradients. Pass ``from_logits=True`` for a trainable SimCLR
    objective (softmax over similarities)."""

    def __init__(self, temperature=1.0, from_logits=False, name=None,
                 reduction="sum_over_batch_size"):
        super().__init__(reduction=reduction, name=name)
        self.temperature = temperature
        self.from_logits = from_logits

    def call(self, y_true, y_pred):
        """Per-row crossentropy vector ``[n]`` (row = one anchor sample)."""
        n = y_pred.shape[0]
        similarity_matrix = self.compute_similarity_matrix(y_pred) / self.temperature
        similarity_matrix = jnp.where(
            jnp.eye(n, dtype=bool), -1e9, similarity_matrix
        )

        labels = jnp.reshape(y_true, [-1, 1])
        y_onehot = (labels == labels.T).astype(jnp.int32)
        y_onehot = jnp.where(jnp.eye(n, dtype=bool), 0, y_onehot)

        return categorical_crossentropy_per_row(
            y_onehot, similarity_matrix, from_logits=self.from_logits
        )

    def compute_similarity_matrix(self, y_pred):
        return jnp.matmul(y_pred, y_pred.T)

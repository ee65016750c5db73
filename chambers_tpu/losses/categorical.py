"""Categorical / segmentation losses.

Parity: reference ``chambers/losses/categorical.py:7-32``. The class
variants (:class:`SoftDiceLoss`, :class:`CategoricalCrossentropy`) carry the
Keras ``Loss`` call contract (``sample_weight`` / ``reduction``) the
reference's losses inherit from ``tf.keras.losses.Loss``; weighted values
are pinned against tf.keras in ``tests/losses/test_loss_contract.py``.
"""

from typing import List, Optional

import jax.numpy as jnp

from chambers_tpu.losses.base import Loss
from chambers_tpu.utils.tensor import remove_indices

_EPSILON = 1e-7  # keras backend epsilon


def _per_sample_dsc(y_true, y_pred, exclude_classes: Optional[List[int]]):
    """Per-sample mean-over-classes soft DSC ``[b]`` — the shared core of
    the function form and :class:`SoftDiceLoss` (one copy of the algebra)."""
    axis = (1, 2)
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)

    intersection = jnp.sum(y_true * y_pred, axis=axis)
    channel_dsc = (2.0 * intersection + _EPSILON) / (
        jnp.sum(y_true, axis=axis) + jnp.sum(y_pred, axis=axis) + _EPSILON
    )

    if exclude_classes is not None:
        channel_dsc = remove_indices(channel_dsc, exclude_classes, axis=1)

    return jnp.mean(channel_dsc, axis=1)


def soft_dice_coefficient(y_true, y_pred, exclude_classes: Optional[List[int]] = None):
    """Mean soft Dice *loss* (1 − DSC) over classes for ``[b, h, w, c]``
    one-hot/soft segmentation maps.

    DSC = (2·TP + eps) / (2·TP + FP + FN + eps) per class, averaged over
    classes then over the batch; returns ``1 − mean DSC``.
    """
    return 1 - jnp.mean(_per_sample_dsc(y_true, y_pred, exclude_classes),
                        axis=0)


class SoftDiceLoss(Loss):
    """:func:`soft_dice_coefficient` as a Keras-contract ``Loss``.

    ``call`` returns the per-sample loss ``1 − mean-class DSC`` (shape
    ``[b]``); the default reduction's unweighted mean equals the function
    form exactly. ``sample_weight`` weights per image.
    """

    def __init__(self, exclude_classes: Optional[List[int]] = None,
                 name="soft_dice", reduction="sum_over_batch_size"):
        super().__init__(reduction=reduction, name=name)
        self.exclude_classes = exclude_classes

    def call(self, y_true, y_pred):
        return 1.0 - _per_sample_dsc(y_true, y_pred, self.exclude_classes)


class CategoricalCrossentropy(Loss):
    """``tf.keras.losses.CategoricalCrossentropy`` with the full call
    contract (``from_logits``, ``label_smoothing``, ``sample_weight``,
    ``reduction``) — the loss the reference's classification examples
    compile with (reference ``test_units/manual_test_vit_weights.py`` trains
    against Keras CE).

    With ``from_logits=False`` predictions are renormalized to sum to 1 and
    clipped to ``[eps, 1−eps]`` (Keras backend semantics).
    """

    def __init__(self, from_logits=False, label_smoothing=0.0,
                 name="categorical_crossentropy",
                 reduction="sum_over_batch_size"):
        super().__init__(reduction=reduction, name=name)
        self.from_logits = from_logits
        self.label_smoothing = float(label_smoothing)

    def call(self, y_true, y_pred):
        y_true = jnp.asarray(y_true, jnp.float32)
        y_pred = jnp.asarray(y_pred)
        if self.label_smoothing:
            n_classes = y_true.shape[-1]
            y_true = (y_true * (1.0 - self.label_smoothing)
                      + self.label_smoothing / n_classes)
        from chambers_tpu.losses.metric_learning import (
            categorical_crossentropy_per_row,
        )

        return categorical_crossentropy_per_row(
            y_true, y_pred, from_logits=self.from_logits
        )


class SparseCategoricalCrossentropy(Loss):
    """``tf.keras.losses.SparseCategoricalCrossentropy``: integer labels
    ``[b]`` (or ``[b, 1]``) against ``[b, n_classes]`` predictions — the
    label format every classification example in the Keras ecosystem the
    reference trained under uses when labels aren't one-hot."""

    def __init__(self, from_logits=False,
                 name="sparse_categorical_crossentropy",
                 reduction="sum_over_batch_size"):
        super().__init__(reduction=reduction, name=name)
        self.from_logits = from_logits

    def call(self, y_true, y_pred):
        y_true = jnp.asarray(y_true)
        y_pred = jnp.asarray(y_pred)
        if y_true.ndim == y_pred.ndim and y_true.shape[-1] == 1:
            y_true = jnp.squeeze(y_true, axis=-1)  # Keras squeeze-or-expand
        n_classes = y_pred.shape[-1]
        one_hot = jnp.equal(
            y_true.astype(jnp.int32)[..., None],
            jnp.arange(n_classes, dtype=jnp.int32),
        ).astype(jnp.float32)
        from chambers_tpu.losses.metric_learning import (
            categorical_crossentropy_per_row,
        )

        return categorical_crossentropy_per_row(
            one_hot, y_pred, from_logits=self.from_logits
        )


class MeanSquaredError(Loss):
    """``tf.keras.losses.MeanSquaredError``: mean over the last axis per
    sample; reduction/sample_weight per the Keras ``Loss`` contract."""

    def __init__(self, name="mean_squared_error",
                 reduction="sum_over_batch_size"):
        super().__init__(reduction=reduction, name=name)

    def call(self, y_true, y_pred):
        y_true = jnp.asarray(y_true, jnp.float32)
        y_pred = jnp.asarray(y_pred, jnp.float32)
        return jnp.mean(jnp.square(y_true - y_pred), axis=-1)


class BinaryCrossentropy(Loss):
    """``tf.keras.losses.BinaryCrossentropy``: elementwise BCE averaged
    over the last axis per sample.

    ``from_logits=True`` uses the numerically stable
    ``max(z,0) − z·y + log(1+exp(−|z|))`` form (tf.nn.sigmoid_cross_
    entropy_with_logits); probabilities are clipped to ``[eps, 1−eps]``
    (Keras backend semantics). ``label_smoothing`` maps targets to
    ``y·(1−s) + 0.5·s``. Value-pinned vs tf.keras in
    ``tests/losses/test_loss_contract.py``."""

    def __init__(self, from_logits=False, label_smoothing=0.0,
                 name="binary_crossentropy",
                 reduction="sum_over_batch_size"):
        super().__init__(reduction=reduction, name=name)
        self.from_logits = from_logits
        self.label_smoothing = float(label_smoothing)

    def call(self, y_true, y_pred):
        y_true = jnp.asarray(y_true, jnp.float32)
        y_pred = jnp.asarray(y_pred, jnp.float32)
        if self.label_smoothing:
            y_true = y_true * (1.0 - self.label_smoothing) \
                + 0.5 * self.label_smoothing
        if self.from_logits:
            z = y_pred
            bce = (jnp.maximum(z, 0.0) - z * y_true
                   + jnp.log1p(jnp.exp(-jnp.abs(z))))
        else:
            p = jnp.clip(y_pred, _EPSILON, 1.0 - _EPSILON)
            bce = -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log1p(-p))
        return jnp.mean(bce, axis=-1)

"""Categorical / segmentation losses.

Parity: reference ``chambers/losses/categorical.py:7-32``.
"""

from typing import List, Optional

import jax.numpy as jnp

from chambers_tpu.utils.tensor import remove_indices

_EPSILON = 1e-7  # keras backend epsilon


def soft_dice_coefficient(y_true, y_pred, exclude_classes: Optional[List[int]] = None):
    """Mean soft Dice *loss* (1 − DSC) over classes for ``[b, h, w, c]``
    one-hot/soft segmentation maps.

    DSC = (2·TP + eps) / (2·TP + FP + FN + eps) per class, averaged over
    classes then over the batch; returns ``1 − mean DSC``.
    """
    axis = (1, 2)
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)

    intersection = jnp.sum(y_true * y_pred, axis=axis)
    channel_dsc = (2.0 * intersection + _EPSILON) / (
        jnp.sum(y_true, axis=axis) + jnp.sum(y_pred, axis=axis) + _EPSILON
    )

    if exclude_classes is not None:
        channel_dsc = remove_indices(channel_dsc, exclude_classes, axis=1)

    sample_dsc = jnp.mean(channel_dsc, axis=1)
    batch_dsc = jnp.mean(sample_dsc, axis=0)
    return 1 - batch_dsc

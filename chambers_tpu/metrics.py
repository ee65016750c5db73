"""Model-quality metrics.

Parity: reference ``chambers/metrics.py``.

- ``F1`` (metrics.py:10-54): streaming F1 accumulated from precision/recall
  counts. The reference composes Keras ``Precision`` + ``Recall``; this build
  accumulates TP/FP/FN directly (same math) with ``update_state`` /
  ``result`` / ``reset_states`` so usage translates 1:1.
- ``SoftDiceCoefficient`` (metrics.py:58-83): streaming mean of
  ``|dice_loss − 1|``.
"""

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from chambers_tpu.losses.categorical import soft_dice_coefficient as _dsc_loss


class F1:
    """Streaming F1 = 2PR / (P + R) from thresholded predictions.

    :param thresholds: decision threshold(s); default 0.5.
    :param top_k: if set, only the top-k scored classes per sample count as
        positive predictions.
    :param class_id: if set, restrict to one class column.
    """

    def __init__(self, thresholds=None, top_k=None, class_id=None, name=None):
        self.thresholds = 0.5 if thresholds is None else thresholds
        self.top_k = top_k
        self.class_id = class_id
        self.name = name or "f1"
        self.reset_states()

    def update_state(self, y_true, y_pred, sample_weight=None):
        y_true = np.asarray(y_true)
        y_pred = np.asarray(y_pred)

        if self.top_k is not None:
            kth = np.argsort(-y_pred, axis=-1)[..., : self.top_k]
            mask = np.zeros_like(y_pred, dtype=bool)
            np.put_along_axis(mask, kth, True, axis=-1)
            pred_pos = (y_pred > self.thresholds) & mask
        else:
            pred_pos = y_pred > self.thresholds

        if self.class_id is not None:
            y_true = y_true[..., self.class_id]
            pred_pos = pred_pos[..., self.class_id]

        true_pos = y_true > 0.5
        w = 1.0 if sample_weight is None else np.asarray(sample_weight)

        self._tp += float(np.sum((pred_pos & true_pos) * w))
        self._fp += float(np.sum((pred_pos & ~true_pos) * w))
        self._fn += float(np.sum((~pred_pos & true_pos) * w))

    def result(self):
        precision = self._tp / (self._tp + self._fp) if (self._tp + self._fp) else 0.0
        recall = self._tp / (self._tp + self._fn) if (self._tp + self._fn) else 0.0
        if precision + recall == 0.0:
            return 0.0
        return (2 * precision * recall) / (precision + recall)

    def reset_states(self):
        self._tp = 0.0
        self._fp = 0.0
        self._fn = 0.0

    def get_config(self):
        return {
            "thresholds": self.thresholds,
            "top_k": self.top_k,
            "class_id": self.class_id,
        }


def soft_dice_coefficient(y_true, y_pred, exclude_classes: Optional[List[int]] = None):
    """DSC as a metric: ``|dice_loss − 1|`` (metrics.py:79-80)."""
    return jnp.abs(_dsc_loss(y_true, y_pred, exclude_classes=exclude_classes) - 1)


class SoftDiceCoefficient:
    """Streaming mean of the soft-Dice metric over update calls."""

    def __init__(self, exclude_classes: Optional[List[int]] = None,
                 name="soft_dice_coefficient"):
        self.exclude_classes = exclude_classes
        self.name = name
        self.reset_states()

    def update_state(self, y_true, y_pred, sample_weight=None):
        value = float(
            soft_dice_coefficient(
                jnp.asarray(y_true), jnp.asarray(y_pred),
                exclude_classes=self.exclude_classes,
            )
        )
        self._total += value
        self._count += 1

    def result(self):
        return self._total / self._count if self._count else 0.0

    def reset_states(self):
        self._total = 0.0
        self._count = 0


# Aliases (metrics.py:83)
dsc = DSC = soft_dice_coefficient

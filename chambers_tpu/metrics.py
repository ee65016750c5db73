"""Model-quality metrics.

Parity: reference ``chambers/metrics.py``.

- ``F1`` (metrics.py:10-54): streaming F1 accumulated from precision/recall
  counts. The reference composes Keras ``Precision`` + ``Recall``; this build
  accumulates TP/FP/FN directly (same math).
- ``SoftDiceCoefficient`` (metrics.py:58-83): streaming mean of
  ``|dice_loss − 1|``.

Beyond the reference's two, the Keras metrics its users pass alongside them
(``model.fit(metrics=[...])`` in the reference's training scripts) are
provided with the same streaming semantics: ``Precision``/``Recall`` (the
two F1 composes), ``Mean``, ``BinaryAccuracy``, ``CategoricalAccuracy``,
``SparseCategoricalAccuracy``, ``TopKCategoricalAccuracy`` (+Sparse), and
``AUC`` (ROC trapezoid / PR interpolation, Keras-bucketed) — each
value-pinned against tf.keras in the test suite.

TPU design: every metric is a pure functional triple so it can live *inside*
a jitted step (no per-batch host sync):

    state = metric.init()                       # pytree of device scalars
    state = metric.update(state, y_true, y_pred)  # pure, jittable
    value = metric.compute(state)                 # pure, jittable scalar

The reference's Keras-style host API (``update_state`` / ``result`` /
``reset_states``) is kept as a thin wrapper over the functional core, so
usage translates 1:1 while `Trainer` streams the same metrics on device.
"""

from typing import List, Optional

import jax
import jax.numpy as jnp

from chambers_tpu.losses.categorical import soft_dice_coefficient as _dsc_loss


class StreamingMetric:
    """Base: functional ``init/update/compute`` + Keras-style host wrappers."""

    name = "metric"

    # -- functional core (override; all three must be pure/jittable) --------
    def init(self):
        raise NotImplementedError

    def update(self, state, y_true, y_pred, sample_weight=None):
        raise NotImplementedError

    def compute(self, state):
        raise NotImplementedError

    # -- Keras-parity host API ----------------------------------------------
    def update_state(self, y_true, y_pred, sample_weight=None):
        self._state = self.update(
            self._state,
            None if y_true is None else jnp.asarray(y_true),
            None if y_pred is None else jnp.asarray(y_pred),
            sample_weight=sample_weight,
        )

    def result(self):
        return float(self.compute(self._state))

    def reset_states(self):
        self._state = self.init()


class _ConfusionMetric(StreamingMetric):
    """Shared streaming confusion counts (tp/fp/fn) behind F1 / Precision /
    Recall — thresholded predictions with Keras's ``top_k`` / ``class_id``
    semantics.

    :param thresholds: decision threshold; default 0.5.
    :param top_k: if set, only the top-k scored classes per sample count as
        positive predictions.
    :param class_id: if set, restrict to one class column.
    """

    def __init__(self, thresholds=None, top_k=None, class_id=None, name=None):
        self.thresholds = 0.5 if thresholds is None else thresholds
        self.top_k = top_k
        self.class_id = class_id
        if name is not None:
            self.name = name
        self.reset_states()

    def init(self):
        # distinct buffers per entry: the Trainer donates metric state, and
        # donating one aliased buffer twice is an error
        return {"tp": jnp.zeros((), jnp.float32),
                "fp": jnp.zeros((), jnp.float32),
                "fn": jnp.zeros((), jnp.float32)}

    def update(self, state, y_true, y_pred, sample_weight=None):
        y_true = jnp.asarray(y_true)
        y_pred = jnp.asarray(y_pred)

        if self.top_k is not None:
            # scatter-free top-k mask: one-hot the k winning indices and OR
            # them (scatters are ~50x slower than compare-reduce on v5e)
            _, kth = jax.lax.top_k(y_pred, self.top_k)
            mask = jax.nn.one_hot(
                kth, y_pred.shape[-1], dtype=jnp.bool_
            ).any(axis=-2)
            pred_pos = (y_pred > self.thresholds) & mask
        else:
            pred_pos = y_pred > self.thresholds

        if self.class_id is not None:
            y_true = y_true[..., self.class_id]
            pred_pos = pred_pos[..., self.class_id]

        true_pos = y_true > 0.5
        w = (jnp.float32(1.0) if sample_weight is None
             else jnp.asarray(sample_weight, jnp.float32))

        return {
            "tp": state["tp"] + jnp.sum((pred_pos & true_pos) * w),
            "fp": state["fp"] + jnp.sum((pred_pos & ~true_pos) * w),
            "fn": state["fn"] + jnp.sum((~pred_pos & true_pos) * w),
        }

    def get_config(self):
        return {
            "thresholds": self.thresholds,
            "top_k": self.top_k,
            "class_id": self.class_id,
        }


class F1(_ConfusionMetric):
    """Streaming F1 = 2PR / (P + R) from thresholded predictions.

    Parity: reference ``chambers/metrics.py:10-54`` (composes Keras
    ``Precision`` + ``Recall``; this accumulates TP/FP/FN directly)."""

    name = "f1"

    def compute(self, state):
        tp, fp, fn = state["tp"], state["fp"], state["fn"]
        precision = jnp.where(tp + fp > 0, tp / jnp.maximum(tp + fp, 1e-12), 0.0)
        recall = jnp.where(tp + fn > 0, tp / jnp.maximum(tp + fn, 1e-12), 0.0)
        denom = precision + recall
        return jnp.where(
            denom > 0, 2 * precision * recall / jnp.maximum(denom, 1e-12), 0.0
        )


class Precision(_ConfusionMetric):
    """Streaming precision = TP / (TP + FP) — ``tf.keras.metrics.Precision``
    (what the reference's F1 composes, metrics.py:20-33)."""

    name = "precision"

    def compute(self, state):
        tp, fp = state["tp"], state["fp"]
        return jnp.where(tp + fp > 0, tp / jnp.maximum(tp + fp, 1e-12), 0.0)


class Recall(_ConfusionMetric):
    """Streaming recall = TP / (TP + FN) — ``tf.keras.metrics.Recall``."""

    name = "recall"

    def compute(self, state):
        tp, fn = state["tp"], state["fn"]
        return jnp.where(tp + fn > 0, tp / jnp.maximum(tp + fn, 1e-12), 0.0)


class Mean(StreamingMetric):
    """Streaming (weighted) mean of scalar-reducible values —
    ``tf.keras.metrics.Mean``. ``update`` takes the value as ``y_pred``
    (``y_true`` is ignored) so it plugs into the Trainer's metric slot."""

    def __init__(self, name="mean"):
        self.name = name
        self.reset_states()

    def init(self):
        return {"total": jnp.zeros((), jnp.float32),
                "count": jnp.zeros((), jnp.float32)}

    def update(self, state, y_true, y_pred=None, sample_weight=None):
        values = jnp.asarray(y_pred if y_pred is not None else y_true,
                             jnp.float32)
        w = (jnp.ones_like(values) if sample_weight is None
             else jnp.broadcast_to(
                 jnp.asarray(sample_weight, jnp.float32), values.shape))
        return {"total": state["total"] + jnp.sum(values * w),
                "count": state["count"] + jnp.sum(w)}

    def compute(self, state):
        return jnp.where(
            state["count"] > 0,
            state["total"] / jnp.maximum(state["count"], 1e-12), 0.0)

    def get_config(self):
        return {"name": self.name}


class _MeanOfMatches(Mean):
    """Base for accuracies: a per-element match in [0, 1], mean-streamed."""

    def _matches(self, y_true, y_pred):
        raise NotImplementedError

    def update(self, state, y_true, y_pred, sample_weight=None):
        matches = self._matches(jnp.asarray(y_true), jnp.asarray(y_pred))
        return super().update(state, None, matches,
                              sample_weight=sample_weight)


class BinaryAccuracy(_MeanOfMatches):
    """``tf.keras.metrics.BinaryAccuracy``: the prediction is thresholded
    to {0, 1} and compared to ``y_true`` by EQUALITY (Keras semantics: a
    soft label like 0.3 never matches — the label is not thresholded)."""

    def __init__(self, threshold=0.5, name="binary_accuracy"):
        self.threshold = threshold
        super().__init__(name=name)

    def _matches(self, y_true, y_pred):
        pred = (y_pred > self.threshold).astype(jnp.float32)
        return jnp.asarray(y_true.astype(jnp.float32) == pred, jnp.float32)

    def get_config(self):
        return {"threshold": self.threshold, "name": self.name}


class CategoricalAccuracy(_MeanOfMatches):
    """``tf.keras.metrics.CategoricalAccuracy``: argmax(y_true) ==
    argmax(y_pred), one sample per row."""

    def __init__(self, name="categorical_accuracy"):
        super().__init__(name=name)

    def _matches(self, y_true, y_pred):
        return jnp.asarray(
            jnp.argmax(y_true, axis=-1) == jnp.argmax(y_pred, axis=-1),
            jnp.float32)


class SparseCategoricalAccuracy(_MeanOfMatches):
    """``tf.keras.metrics.SparseCategoricalAccuracy``: integer labels."""

    def __init__(self, name="sparse_categorical_accuracy"):
        super().__init__(name=name)

    def _matches(self, y_true, y_pred):
        y_true = jnp.asarray(y_true)
        if y_true.ndim == y_pred.ndim:  # trailing [..., 1] label column
            y_true = y_true[..., 0]
        return jnp.asarray(
            y_true.astype(jnp.int32) == jnp.argmax(y_pred, axis=-1),
            jnp.float32)


class TopKCategoricalAccuracy(_MeanOfMatches):
    """``tf.keras.metrics.TopKCategoricalAccuracy``: label class inside the
    top-k scored classes."""

    def __init__(self, k=5, name="top_k_categorical_accuracy"):
        self.k = int(k)
        super().__init__(name=name)

    def _label_ids(self, y_true):
        return jnp.argmax(y_true, axis=-1)

    def _matches(self, y_true, y_pred):
        labels = self._label_ids(jnp.asarray(y_true))
        _, kth = jax.lax.top_k(y_pred, self.k)
        return jnp.asarray(
            (kth == labels[..., None]).any(axis=-1), jnp.float32)

    def get_config(self):
        return {"k": self.k, "name": self.name}


class SparseTopKCategoricalAccuracy(TopKCategoricalAccuracy):
    """``tf.keras.metrics.SparseTopKCategoricalAccuracy``."""

    def __init__(self, k=5, name="sparse_top_k_categorical_accuracy"):
        super().__init__(k=k, name=name)

    def _label_ids(self, y_true):
        if y_true.ndim and y_true.shape[-1] == 1:
            y_true = y_true[..., 0]
        return y_true.astype(jnp.int32)


class AUC(StreamingMetric):
    """Streaming AUC over ``num_thresholds`` buckets —
    ``tf.keras.metrics.AUC`` semantics and numerics: thresholds are
    ``[-eps, 1/(T-1), ..., (T-2)/(T-1), 1+eps]``; ROC integrates the
    (FPR, TPR) curve trapezoidally; PR uses Keras's precision-slope
    interpolation (Davis & Goadrich). Value-pinned against tf.keras in
    ``tests/test_metrics.py``.
    """

    def __init__(self, num_thresholds=200, curve="ROC", name=None):
        if curve not in ("ROC", "PR"):
            raise ValueError(f"curve must be 'ROC'|'PR', got {curve!r}")
        if num_thresholds < 2:
            raise ValueError("num_thresholds must be >= 2")
        self.num_thresholds = int(num_thresholds)
        self.curve = curve
        self.name = name or "auc"
        eps = 1e-7
        inner = [(i + 1) / (num_thresholds - 1)
                 for i in range(num_thresholds - 2)]
        self._thresholds = jnp.asarray([-eps] + inner + [1.0 + eps],
                                       jnp.float32)
        self.reset_states()

    def init(self):
        t = self.num_thresholds
        return {k: jnp.zeros((t,), jnp.float32)
                for k in ("tp", "fp", "tn", "fn")}

    def update(self, state, y_true, y_pred, sample_weight=None):
        y_true = jnp.asarray(y_true, jnp.float32).reshape(-1)
        y_pred = jnp.asarray(y_pred, jnp.float32).reshape(-1)
        w = (jnp.ones_like(y_pred) if sample_weight is None
             else jnp.broadcast_to(
                 jnp.asarray(sample_weight, jnp.float32).reshape(-1),
                 y_pred.shape))
        # [T, N] compare-reduce (no scatters — see the F1 top_k note)
        pred_pos = y_pred[None, :] > self._thresholds[:, None]
        pos = (y_true > 0.5)[None, :]
        return {
            "tp": state["tp"] + jnp.sum((pred_pos & pos) * w[None, :], axis=1),
            "fp": state["fp"] + jnp.sum((pred_pos & ~pos) * w[None, :], axis=1),
            "tn": state["tn"] + jnp.sum((~pred_pos & ~pos) * w[None, :], axis=1),
            "fn": state["fn"] + jnp.sum((~pred_pos & pos) * w[None, :], axis=1),
        }

    @staticmethod
    def _safe_div(num, den):
        return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)

    def compute(self, state):
        tp, fp, tn, fn = (state[k] for k in ("tp", "fp", "tn", "fn"))
        if self.curve == "ROC":
            x = self._safe_div(fp, fp + tn)
            y = self._safe_div(tp, tp + fn)
            heights = (y[:-1] + y[1:]) / 2.0
            return jnp.sum((x[:-1] - x[1:]) * heights)
        # PR: Keras interpolate_pr_auc (keras/metrics/confusion_metrics.py)
        dtp = tp[:-1] - tp[1:]
        p = tp + fp
        dp = p[:-1] - p[1:]
        prec_slope = self._safe_div(dtp, jnp.maximum(dp, 0.0))
        intercept = tp[1:] - prec_slope * p[1:]
        safe_p_ratio = jnp.where(
            (p[:-1] > 0) & (p[1:] > 0),
            self._safe_div(p[:-1], jnp.maximum(p[1:], 0.0)),
            jnp.ones_like(p[1:]))
        pr_auc_increment = self._safe_div(
            prec_slope * (dtp + intercept * jnp.log(safe_p_ratio)),
            jnp.maximum(tp[1:] + fn[1:], 0.0))
        return jnp.sum(pr_auc_increment)

    def get_config(self):
        return {"num_thresholds": self.num_thresholds, "curve": self.curve,
                "name": self.name}


def soft_dice_coefficient(y_true, y_pred, exclude_classes: Optional[List[int]] = None):
    """DSC as a metric: ``|dice_loss − 1|`` (metrics.py:79-80)."""
    return jnp.abs(_dsc_loss(y_true, y_pred, exclude_classes=exclude_classes) - 1)


class SoftDiceCoefficient(StreamingMetric):
    """Streaming mean of the soft-Dice metric over update calls."""

    def __init__(self, exclude_classes: Optional[List[int]] = None,
                 name="soft_dice_coefficient"):
        self.exclude_classes = exclude_classes
        self.name = name
        self.reset_states()

    def init(self):
        return {"total": jnp.zeros((), jnp.float32),
                "count": jnp.zeros((), jnp.float32)}

    def update(self, state, y_true, y_pred, sample_weight=None):
        value = soft_dice_coefficient(
            y_true, y_pred, exclude_classes=self.exclude_classes
        )
        return {"total": state["total"] + value, "count": state["count"] + 1.0}

    def compute(self, state):
        return jnp.where(
            state["count"] > 0,
            state["total"] / jnp.maximum(state["count"], 1.0), 0.0,
        )


# Aliases (metrics.py:83)
dsc = DSC = soft_dice_coefficient

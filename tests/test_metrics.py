"""Keras-family streaming metrics (Precision/Recall/accuracies/Mean/AUC).

The reference's F1 composes tf.keras Precision + Recall (reference
metrics.py:10-54); its training scripts pass the other Keras metrics
alongside. Self-consistency always runs; value pins against real tf.keras
run when TF is installed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chambers_tpu.metrics import (
    AUC,
    BinaryAccuracy,
    CategoricalAccuracy,
    Mean,
    Precision,
    Recall,
    SparseCategoricalAccuracy,
    SparseTopKCategoricalAccuracy,
    TopKCategoricalAccuracy,
)


class TestSelfConsistency:
    def test_precision_recall_counts(self):
        y_true = np.array([1, 1, 0, 0, 1])
        y_pred = np.array([0.9, 0.2, 0.8, 0.1, 0.7])
        p, r = Precision(), Recall()
        p.update_state(y_true, y_pred)
        r.update_state(y_true, y_pred)
        np.testing.assert_allclose(p.result(), 2 / 3, rtol=1e-6)  # tp=2 fp=1
        np.testing.assert_allclose(r.result(), 2 / 3, rtol=1e-6)  # fn=1
        # streaming invariance under identical re-update
        p.update_state(y_true, y_pred)
        np.testing.assert_allclose(p.result(), 2 / 3, rtol=1e-6)

    def test_mean_weighted(self):
        m = Mean()
        m.update_state(None, np.array([1.0, 3.0]),
                       sample_weight=np.array([1.0, 3.0]))
        np.testing.assert_allclose(m.result(), (1 + 9) / 4, rtol=1e-6)

    def test_accuracies(self):
        ca = CategoricalAccuracy()
        ca.update_state(np.eye(3)[[0, 1, 2]],
                        np.array([[0.9, 0.1, 0.0],
                                  [0.2, 0.5, 0.3],
                                  [0.6, 0.3, 0.1]]))
        np.testing.assert_allclose(ca.result(), 2 / 3, rtol=1e-6)

        sca = SparseCategoricalAccuracy()
        sca.update_state(np.array([0, 1, 2]),
                         np.array([[0.9, 0.1, 0.0],
                                   [0.2, 0.5, 0.3],
                                   [0.6, 0.3, 0.1]]))
        np.testing.assert_allclose(sca.result(), 2 / 3, rtol=1e-6)

        ba = BinaryAccuracy()
        ba.update_state(np.array([1.0, 0.0, 1.0, 0.0]),
                        np.array([0.9, 0.4, 0.2, 0.6]))
        np.testing.assert_allclose(ba.result(), 0.5, rtol=1e-6)
        # Keras compares the label by EQUALITY: soft labels never match
        soft = BinaryAccuracy()
        soft.update_state(np.array([0.3, 0.3]), np.array([0.2, 0.9]))
        np.testing.assert_allclose(soft.result(), 0.0)

    def test_top_k_accuracy(self):
        tk = TopKCategoricalAccuracy(k=2)
        tk.update_state(np.eye(4)[[0, 3]],
                        np.array([[0.5, 0.4, 0.05, 0.05],   # 0 in top-2
                                  [0.4, 0.3, 0.2, 0.1]]))   # 3 not
        np.testing.assert_allclose(tk.result(), 0.5, rtol=1e-6)
        stk = SparseTopKCategoricalAccuracy(k=2)
        stk.update_state(np.array([0, 3]),
                         np.array([[0.5, 0.4, 0.05, 0.05],
                                   [0.4, 0.3, 0.2, 0.1]]))
        np.testing.assert_allclose(stk.result(), 0.5, rtol=1e-6)

    def test_auc_perfect_and_random(self):
        auc = AUC(num_thresholds=200)
        y = np.array([0, 0, 1, 1], np.float32)
        auc.update_state(y, np.array([0.1, 0.2, 0.8, 0.9]))
        np.testing.assert_allclose(auc.result(), 1.0, atol=1e-3)
        auc.reset_states()
        auc.update_state(y, y)  # predictions == labels, still perfect
        np.testing.assert_allclose(auc.result(), 1.0, atol=1e-3)

    def test_auc_validates_args(self):
        with pytest.raises(ValueError, match="curve"):
            AUC(curve="ROCK")
        with pytest.raises(ValueError, match="num_thresholds"):
            AUC(num_thresholds=1)

    def test_functional_cores_jittable(self):
        y_true = jnp.asarray(np.random.RandomState(0).randint(0, 2, 64),
                             jnp.float32)
        y_pred = jnp.asarray(np.random.RandomState(1).rand(64), jnp.float32)
        for metric in (Precision(), Recall(), AUC(num_thresholds=16),
                       BinaryAccuracy(), Mean()):
            @jax.jit
            def run(yt, yp, m=metric):
                return m.compute(m.update(m.init(), yt, yp))

            assert np.isfinite(float(run(y_true, y_pred)))


class TestKerasPins:
    def _stream(self, ours, theirs, batches):
        for y_true, y_pred in batches:
            ours.update_state(y_true, y_pred)
            theirs.update_state(y_true, y_pred)
        np.testing.assert_allclose(ours.result(),
                                   float(theirs.result().numpy()),
                                   rtol=1e-5, atol=1e-6)

    def _binary_batches(self, n=3, size=64):
        rng = np.random.RandomState(7)
        return [(rng.randint(0, 2, size).astype(np.float32),
                 rng.rand(size).astype(np.float32)) for _ in range(n)]

    def test_precision_recall(self):
        tf = pytest.importorskip("tensorflow")
        self._stream(Precision(), tf.keras.metrics.Precision(),
                     self._binary_batches())
        self._stream(Recall(), tf.keras.metrics.Recall(),
                     self._binary_batches())

    def test_auc_roc_and_pr(self):
        tf = pytest.importorskip("tensorflow")
        for curve in ("ROC", "PR"):
            self._stream(
                AUC(num_thresholds=200, curve=curve),
                tf.keras.metrics.AUC(num_thresholds=200, curve=curve),
                self._binary_batches())

    def test_accuracies(self):
        tf = pytest.importorskip("tensorflow")
        rng = np.random.RandomState(3)
        probs = rng.rand(4, 32, 10).astype(np.float32)
        labels = rng.randint(0, 10, (4, 32))
        one_hot = np.eye(10, dtype=np.float32)[labels]
        self._stream(CategoricalAccuracy(),
                     tf.keras.metrics.CategoricalAccuracy(),
                     list(zip(one_hot, probs)))
        self._stream(SparseCategoricalAccuracy(),
                     tf.keras.metrics.SparseCategoricalAccuracy(),
                     list(zip(labels.astype(np.float32), probs)))
        self._stream(TopKCategoricalAccuracy(k=3),
                     tf.keras.metrics.TopKCategoricalAccuracy(k=3),
                     list(zip(one_hot, probs)))
        self._stream(BinaryAccuracy(),
                     tf.keras.metrics.BinaryAccuracy(),
                     self._binary_batches())

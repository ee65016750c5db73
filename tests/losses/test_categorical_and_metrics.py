"""Dice loss and streaming metric tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from chambers_tpu.losses import soft_dice_coefficient
from chambers_tpu.metrics import F1, SoftDiceCoefficient, dsc


def test_dice_perfect_prediction_is_zero():
    y = np.zeros((2, 4, 4, 3), np.float32)
    y[..., 0] = 1.0
    loss = float(soft_dice_coefficient(jnp.asarray(y), jnp.asarray(y)))
    np.testing.assert_allclose(loss, 0.0, atol=1e-6)


def test_dice_worst_prediction_near_one():
    y_true = np.zeros((1, 4, 4, 2), np.float32)
    y_true[..., 0] = 1.0
    y_pred = np.zeros_like(y_true)
    y_pred[..., 1] = 1.0
    loss = float(soft_dice_coefficient(jnp.asarray(y_true), jnp.asarray(y_pred)))
    np.testing.assert_allclose(loss, 1.0, atol=1e-5)


def test_dice_manual_value():
    y_true = np.zeros((1, 2, 2, 2), np.float32)
    y_true[0, :, :, 0] = [[1, 1], [0, 0]]
    y_true[0, :, :, 1] = [[0, 0], [1, 1]]
    y_pred = np.zeros_like(y_true)
    y_pred[0, :, :, 0] = [[1, 0], [0, 0]]
    y_pred[0, :, :, 1] = [[0, 1], [1, 1]]
    eps = 1e-7
    dsc0 = (2 * 1 + eps) / (2 + 1 + eps)
    dsc1 = (2 * 2 + eps) / (2 + 3 + eps)
    expected = 1 - (dsc0 + dsc1) / 2
    loss = float(soft_dice_coefficient(jnp.asarray(y_true), jnp.asarray(y_pred)))
    np.testing.assert_allclose(loss, expected, rtol=1e-5)


def test_dice_exclude_classes():
    y_true = np.zeros((1, 2, 2, 3), np.float32)
    y_true[..., 0] = 1.0
    y_pred = y_true.copy()
    # class 2 badly wrong, but excluded
    y_pred2 = y_pred.copy()
    y_pred2[..., 2] = 1.0
    loss = float(
        soft_dice_coefficient(
            jnp.asarray(y_true), jnp.asarray(y_pred2), exclude_classes=[2]
        )
    )
    np.testing.assert_allclose(loss, 0.0, atol=1e-5)


def test_dsc_metric_is_abs_loss_minus_one():
    y = np.zeros((1, 4, 4, 2), np.float32)
    y[..., 0] = 1.0
    metric = float(dsc(jnp.asarray(y), jnp.asarray(y)))
    np.testing.assert_allclose(metric, 1.0, atol=1e-6)


def test_f1_metric_streaming():
    f1 = F1()
    y_true = np.array([1, 1, 0, 0, 1])
    y_pred = np.array([0.9, 0.2, 0.8, 0.1, 0.7])
    f1.update_state(y_true, y_pred)
    # tp=2 (0.9, 0.7), fp=1 (0.8), fn=1 (0.2)
    precision, recall = 2 / 3, 2 / 3
    np.testing.assert_allclose(
        f1.result(), 2 * precision * recall / (precision + recall), rtol=1e-6
    )
    # streaming: second identical batch leaves F1 unchanged
    f1.update_state(y_true, y_pred)
    np.testing.assert_allclose(
        f1.result(), 2 * precision * recall / (precision + recall), rtol=1e-6
    )
    f1.reset_states()
    assert f1.result() == 0.0


def test_f1_class_id():
    f1 = F1(class_id=1)
    y_true = np.array([[0, 1], [1, 0], [0, 1]])
    y_pred = np.array([[0.1, 0.9], [0.9, 0.1], [0.6, 0.4]])
    f1.update_state(y_true, y_pred)
    # class 1: tp=1, fp=0, fn=1 -> P=1, R=0.5 -> F1=2/3
    np.testing.assert_allclose(f1.result(), 2 / 3, rtol=1e-6)


def test_f1_top_k():
    f1 = F1(top_k=1, thresholds=0.0)
    y_true = np.array([[0, 1, 0]])
    y_pred = np.array([[0.2, 0.5, 0.3]])
    f1.update_state(y_true, y_pred)
    np.testing.assert_allclose(f1.result(), 1.0)


def test_f1_functional_core_is_jittable():
    """init/update/compute run inside jit (device-resident streaming)."""
    import jax

    f1 = F1(top_k=2, thresholds=0.1)
    y_true = jnp.asarray(np.array([[0, 1, 1, 0], [1, 0, 0, 1]], np.float32))
    y_pred = jnp.asarray(
        np.array([[0.2, 0.9, 0.6, 0.05], [0.8, 0.3, 0.1, 0.7]], np.float32)
    )

    @jax.jit
    def run(y_true, y_pred):
        state = f1.init()
        state = f1.update(state, y_true, y_pred)
        state = f1.update(state, y_true, y_pred)
        return f1.compute(state)

    jitted = float(run(y_true, y_pred))
    host = F1(top_k=2, thresholds=0.1)
    host.update_state(y_true, y_pred)
    host.update_state(y_true, y_pred)
    np.testing.assert_allclose(jitted, host.result(), rtol=1e-6)
    # top_k=2 picks (0.9, 0.6) and (0.8, 0.7): tp=4, fp=0, fn=0 per batch
    np.testing.assert_allclose(jitted, 1.0, rtol=1e-6)


def test_dice_metric_functional_core_is_jittable():
    import jax

    m = SoftDiceCoefficient()
    y = jnp.asarray(np.eye(4, dtype=np.float32)[None, None])

    @jax.jit
    def run(y):
        state = m.init()
        state = m.update(state, y, y)
        return m.compute(state)

    np.testing.assert_allclose(float(run(y)), 1.0, atol=1e-6)


def test_soft_dice_metric_streaming():
    m = SoftDiceCoefficient()
    y = np.zeros((1, 4, 4, 2), np.float32)
    y[..., 0] = 1.0
    m.update_state(y, y)
    np.testing.assert_allclose(m.result(), 1.0, atol=1e-6)
    m.reset_states()
    assert m.result() == 0.0

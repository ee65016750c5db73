"""LR schedules: the tf.keras.optimizers.schedules family the reference's
users wrap in LinearWarmup (reference schedules.py:5-48). Self-consistency
always runs; value pins against real tf.keras run when TF is installed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chambers_tpu.schedules import (
    CosineDecay,
    ExponentialDecay,
    LinearWarmup,
    PiecewiseConstantDecay,
    PolynomialDecay,
)

STEPS = np.asarray([0, 1, 7, 50, 99, 100, 101, 250, 1000], np.float32)


class TestSelfConsistency:
    def test_cosine_endpoints_and_floor(self):
        s = CosineDecay(0.1, decay_steps=100, alpha=0.05)
        np.testing.assert_allclose(float(s(0)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(s(100)), 0.1 * 0.05, rtol=1e-5)
        assert float(s(500)) == float(s(100))  # clamped past decay_steps
        assert float(s(50)) == pytest.approx(0.1 * (0.95 * 0.5 + 0.05))

    def test_exponential_staircase(self):
        s = ExponentialDecay(1.0, decay_steps=10, decay_rate=0.5)
        np.testing.assert_allclose(float(s(10)), 0.5, rtol=1e-6)
        np.testing.assert_allclose(float(s(5)), 0.5 ** 0.5, rtol=1e-6)
        st = ExponentialDecay(1.0, 10, 0.5, staircase=True)
        assert float(st(5)) == 1.0
        assert float(st(19)) == 0.5

    def test_piecewise(self):
        s = PiecewiseConstantDecay([100, 200], [1.0, 0.5, 0.1])
        assert float(s(0)) == 1.0
        assert float(s(100)) == 1.0  # boundary is inclusive on the left
        assert float(s(101)) == 0.5
        assert float(s(200)) == 0.5
        assert float(s(201)) == pytest.approx(0.1)

    def test_piecewise_arity_check(self):
        with pytest.raises(ValueError, match="boundaries"):
            PiecewiseConstantDecay([10], [1.0])

    def test_polynomial_linear_and_cycle(self):
        s = PolynomialDecay(1.0, decay_steps=100, end_learning_rate=0.0,
                            power=1.0)
        np.testing.assert_allclose(float(s(50)), 0.5, rtol=1e-6)
        assert float(s(1000)) == 0.0
        c = PolynomialDecay(1.0, 100, end_learning_rate=0.0, power=1.0,
                            cycle=True)
        # step 150: horizon doubles to 200 -> frac = 1 - 150/200
        np.testing.assert_allclose(float(c(150)), 0.25, rtol=1e-6)

    def test_jittable_and_warmup_wrappable(self):
        inner = CosineDecay(0.1, 1000)
        sched = LinearWarmup(inner, warmup_steps=100)
        lr = jax.jit(lambda t: sched(t))(jnp.asarray(50.0))
        np.testing.assert_allclose(float(lr), 50 * (0.1 / 100), rtol=1e-6)
        lr = jax.jit(lambda t: sched(t))(jnp.asarray(600.0))
        np.testing.assert_allclose(float(lr), float(inner(500.0)), rtol=1e-6)


class TestKerasPins:
    def _pin(self, ours, theirs):
        got = np.asarray([float(ours(s)) for s in STEPS])
        want = np.asarray([float(theirs(s)) for s in STEPS])
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)

    def test_cosine(self):
        tf = pytest.importorskip("tensorflow")
        self._pin(CosineDecay(0.1, 100, alpha=0.03),
                  tf.keras.optimizers.schedules.CosineDecay(
                      0.1, 100, alpha=0.03))

    def test_exponential(self):
        tf = pytest.importorskip("tensorflow")
        for staircase in (False, True):
            self._pin(
                ExponentialDecay(0.2, 33, 0.7, staircase=staircase),
                tf.keras.optimizers.schedules.ExponentialDecay(
                    0.2, 33, 0.7, staircase=staircase))

    def test_piecewise(self):
        tf = pytest.importorskip("tensorflow")
        self._pin(
            PiecewiseConstantDecay([100, 250], [1.0, 0.55, 0.1]),
            tf.keras.optimizers.schedules.PiecewiseConstantDecay(
                [100, 250], [1.0, 0.55, 0.1]))

    def test_polynomial(self):
        tf = pytest.importorskip("tensorflow")
        for cycle, power in ((False, 1.0), (False, 2.0), (True, 0.5)):
            self._pin(
                PolynomialDecay(0.3, 100, 1e-3, power=power, cycle=cycle),
                tf.keras.optimizers.schedules.PolynomialDecay(
                    0.3, 100, 1e-3, power=power, cycle=cycle))

"""Learning-rate schedules.

Parity: reference ``chambers/schedules.py:5-48``: ``LinearWarmup`` wraps a
scalar, callable, or schedule. ``ramp=True`` ramps linearly from 0 to the
inner schedule's step-0 rate over ``warmup_steps``, then runs the inner
schedule shifted by ``warmup_steps``. ``ramp=False`` multiplies the inner
schedule by ``min(1, step / warmup_steps)``.

Schedules are plain ``step -> lr`` callables compatible with optax.
"""

import jax.numpy as jnp


class LinearWarmup:
    def __init__(self, learning_rate, warmup_steps, ramp=True):
        self.learning_rate = learning_rate
        self.warmup_steps = float(warmup_steps)
        self.ramp = ramp
        if ramp:
            self.step_size = self._get_learning_rate(0) / warmup_steps

    def __call__(self, step):
        step = jnp.asarray(step, jnp.float32)
        if self.ramp:
            return jnp.where(
                step < self.warmup_steps,
                step * self.step_size,
                self._get_learning_rate(step - self.warmup_steps),
            )
        warmup_percent = step / self.warmup_steps
        lr_mult = jnp.minimum(1.0, warmup_percent)
        return self._get_learning_rate(step) * lr_mult

    def _get_learning_rate(self, step):
        if callable(self.learning_rate):
            try:
                return self.learning_rate(step)
            except TypeError:
                return self.learning_rate()
        return self.learning_rate

    def get_config(self):
        return {
            "learning_rate": self.learning_rate,
            "warmup_steps": self.warmup_steps,
            "ramp": self.ramp,
        }

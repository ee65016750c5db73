"""Generic utilities.

Parity: reference ``chambers/utils/generic.py``.
"""

import inspect
import os
import random
import sys
import time
from typing import Optional

import jax
import numpy as np


def deserialize_object(identifier, module_objects, module_name, **kwargs):
    """String → object resolution against a registry dict (generic.py:9-23)."""
    if isinstance(identifier, str):
        obj = module_objects.get(identifier)
        if obj is None:
            raise ValueError("Unknown " + module_name + ":" + identifier)
        if inspect.isclass(obj) or callable(obj):
            return obj(**kwargs)
        return obj
    raise ValueError(
        "Could not interpret serialized " + module_name + ": " + str(identifier)
    )


def effective_cpu_count() -> int:
    """Usable core count: respects affinity/cgroup pinning, where
    ``os.cpu_count()`` reports the whole machine."""
    import os

    try:
        return len(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        return os.cpu_count() or 1


def set_random_seed(seed: int):
    """Seed python/numpy; return a jax PRNG key.

    The reference also sets ``TF_DETERMINISTIC_OPS`` (generic.py:43-51); JAX
    computations are deterministic by construction given the returned key —
    thread it through your pipeline (SURVEY.md §5.2).
    """
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def set_dtype_policy_deep(module, dtype):
    """Return ``module`` rebuilt with compute dtype ``dtype`` applied deeply
    (generic.py:26-29).

    The reference mutates a built Keras model's per-layer dtype policies in
    place. Flax modules are immutable dataclasses whose submodules are
    constructed at trace time, so the counterpart is a ``clone``: every
    chambers_tpu model/layer threads its ``dtype`` attribute down to all of
    its submodules (that threading IS the "deep" part), and the returned
    clone shares parameters — variables stay float32, activations compute in
    ``dtype``, exactly the TPU mixed-precision policy of
    :func:`use_mixed_precision`.

    ``dtype`` may be a jnp dtype or a policy name ("bfloat16",
    "mixed_bfloat16", ...).
    """
    if isinstance(dtype, str):
        dtype = use_mixed_precision(dtype)
    if "dtype" not in getattr(module, "__dataclass_fields__", {}):
        raise ValueError(
            f"{type(module).__name__} takes no `dtype` attribute; pass dtype "
            "to its submodules at construction instead")
    return module.clone(dtype=dtype)


def use_mixed_precision(dtype="bfloat16"):
    """Return the activation dtype for mixed-precision model construction.

    On TPU the idiomatic policy is bfloat16 activations with float32 params —
    pass the returned dtype as the ``dtype=`` argument of models/layers (the
    classifier output is always cast back to float32, mirroring the
    reference's output-cast layer, vision_transformer.py:395).
    """
    import jax.numpy as jnp

    policies = {
        "bfloat16": jnp.bfloat16,
        "mixed_bfloat16": jnp.bfloat16,
        "float16": jnp.float16,
        "mixed_float16": jnp.float16,
        "float32": jnp.float32,
    }
    if dtype not in policies:
        raise ValueError(f"Unknown precision policy '{dtype}'")
    print("Computation dtype:", dtype)
    print("Variable dtype: float32")
    return policies[dtype]


def get_model_memory_usage(batch_size: int, model, input_shape=None,
                           dtype_bytes: int = 4) -> float:
    """Static memory estimate in GB: parameters + batched activations.

    Equivalent of generic.py:54-89. Without Keras's per-layer output shapes,
    activations are estimated from the jaxpr of a forward pass when
    ``input_shape`` is given; otherwise only parameter memory is counted.
    """
    n_params = sum(int(p.size) for p in jax.tree.leaves(model.variables))
    total = n_params * dtype_bytes

    if input_shape is not None:
        import jax.numpy as jnp

        x = jnp.zeros((1,) + tuple(input_shape), jnp.float32)
        closed = jax.make_jaxpr(
            lambda v, b: model.module.apply(v, b, deterministic=True)
        )(model.variables, x)
        act_elems = 0
        for eqn in closed.jaxpr.eqns:
            for var in eqn.outvars:
                aval = var.aval
                if hasattr(aval, "shape") and aval.shape:
                    act_elems += int(np.prod(aval.shape))
        total += act_elems * batch_size * dtype_bytes

    return round(total / 1024.0 ** 3, 3)


class Timer:
    """Context-manager wall-clock timer with device sync."""

    def __init__(self, sync=None):
        self._sync = sync

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync is not None:
            jax.block_until_ready(self._sync)
        self.elapsed = time.perf_counter() - self.start


class ProgressBar:
    """Host-side progress bar attachable to a dataset
    (generic.py:92-166 equivalent; the original is a graph-mode tf.print
    bar — here a plain stderr writer)."""

    def __init__(self, total: int, cols: int = 30, stream=None):
        self.total = int(total)
        self.cols = cols
        self.stream = stream or sys.stderr
        self._steps = 0
        self._start_time = time.time()

    def update(self, n):
        self._steps = int(n)
        self._report()

    def add(self, n):
        self._steps += int(n)
        self._report()

    def _report(self):
        frac = self._steps / max(self.total, 1)
        n_complete = int(frac * self.cols)
        n_current = 1 if self.cols - n_complete > 0 else 0
        bar = "=" * n_complete + ">" * n_current
        bar = bar + "." * (self.cols - len(bar))
        elapsed = time.time() - self._start_time
        per_step = elapsed / max(self._steps, 1)
        self.stream.write(
            f"\r{self._steps}/{self.total} [{bar}] - {per_step:.2f}s/step"
        )
        self.stream.flush()

    def dataset_apply_fn(self, dataset):
        bar = self

        def gen():
            for el in dataset:
                bar.add(1)
                yield el

        from chambers_tpu.data.core import Dataset

        return Dataset(gen)

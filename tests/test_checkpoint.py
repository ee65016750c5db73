"""Orbax checkpoint/resume and profiling-helper tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from flax import linen as nn

from chambers_tpu.models import Model
from chambers_tpu.training import Trainer
from chambers_tpu.training.checkpoint import CheckpointCallback, CheckpointManager
from chambers_tpu.utils.profiling import benchmark, device_memory_stats


class _Net(nn.Module):
    @nn.compact
    def __call__(self, x, deterministic=True):
        return nn.Dense(1)(nn.relu(nn.Dense(8)(x)))


def _trainer(seed=0):
    module = _Net()
    variables = module.init(jax.random.PRNGKey(seed), jnp.zeros((1, 4)))
    model = Model(module, variables)
    return Trainer(model, loss=lambda yt, yp: jnp.mean((yt - yp) ** 2),
                   optimizer=optax.adam(1e-2), seed=seed)


def _data(n=4):
    rng = np.random.RandomState(0)
    return [
        (rng.randn(8, 4).astype(np.float32), rng.randn(8, 1).astype(np.float32))
        for _ in range(n)
    ]


def test_save_restore_roundtrip(tmp_path):
    trainer = _trainer()
    trainer.fit(_data(), epochs=2, verbose=False)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    step = int(trainer.state.step)
    ckpt.save(step, trainer.state)
    ckpt.wait()
    assert ckpt.latest_step() == step

    trainer2 = _trainer(seed=1)
    restored = ckpt.restore_latest(trainer2.state)
    assert restored is not None
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        restored.params, trainer.state.params,
    )
    assert int(restored.step) == step
    ckpt.close()


def test_restore_latest_none_when_empty(tmp_path):
    ckpt = CheckpointManager(str(tmp_path / "empty"))
    assert ckpt.restore_latest({"x": jnp.zeros(2)}) is None
    ckpt.close()


def test_max_to_keep(tmp_path):
    ckpt = CheckpointManager(str(tmp_path / "keep"), max_to_keep=2)
    state = {"w": jnp.ones(3)}
    for step in range(5):
        ckpt.save(step, state)
    ckpt.wait()
    assert ckpt.latest_step() == 4
    assert len(ckpt.all_steps()) <= 2
    ckpt.close()


def test_checkpoint_callback_resume(tmp_path):
    trainer = _trainer()
    callback = CheckpointCallback(str(tmp_path / "cb"), trainer)
    trainer.fit(_data(), epochs=2, callbacks=[callback], verbose=False)
    step_after = int(trainer.state.step)

    # new trainer resumes exactly
    trainer2 = _trainer(seed=9)
    callback2 = CheckpointCallback(str(tmp_path / "cb"), trainer2)
    assert callback2.restore_into(trainer2)
    assert int(trainer2.state.step) == step_after
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        trainer2.state.params, trainer.state.params,
    )
    callback.manager.close()
    callback2.manager.close()


def test_benchmark_helper():
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((128, 128))
    stats = benchmark(f, x, warmup=1, iters=3)
    assert stats["p50_s"] >= 0
    assert len(stats["times_s"]) == 3


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert stats is None or isinstance(stats, dict)


def test_restore_legacy_checkpoint_without_extra_vars(tmp_path):
    """Checkpoints written before TrainState gained extra_vars (r3 BN
    support) must still restore: params/opt_state/rng/step come from the
    file, batch stats keep the trainer's current values."""

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            return nn.Dense(2)(x)

    module = Net()
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    trainer = Trainer(Model(module, variables),
                      loss=lambda yt, yp: jnp.mean((yt - yp) ** 2),
                      optimizer=optax.adam(1e-2))

    # simulate a pre-extra_vars checkpoint: the old 4-field layout
    legacy_state = {
        "params": jax.tree.map(lambda p: p + 1.0, trainer.state.params),
        "opt_state": trainer.state.opt_state,
        "rng": trainer.state.rng,
        "step": jnp.asarray(7, jnp.int32),
    }
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, legacy_state)
    mgr.wait()

    cb = CheckpointCallback(str(tmp_path / "ckpt"), trainer)
    assert cb.restore_into(trainer)
    assert int(trainer.state.step) == 7
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(trainer.state.params)[0]),
        np.asarray(jax.tree.leaves(legacy_state["params"])[0]))
    cb.manager.close()
    mgr.close()


def test_checkpoint_resume_on_dp_mesh(tmp_path):
    """Orbax save/restore of a mesh-sharded TrainState: training resumes
    with identical params/step on the 8-device DP mesh (§5.3 under
    parallelism, not just single-device)."""
    from chambers_tpu.parallel import create_mesh

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            return nn.Dense(1)(x)

    rng = np.random.RandomState(0)
    data = [(rng.randn(16, 4).astype(np.float32),
             rng.randn(16, 1).astype(np.float32)) for _ in range(3)]
    mesh = create_mesh({"data": 8})

    def make_trainer():
        module = Net()
        variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
        return Trainer(Model(module, variables),
                       loss=lambda yt, yp: jnp.mean((yt - yp) ** 2),
                       optimizer=optax.adam(1e-2), mesh=mesh)

    t1 = make_trainer()
    cb = CheckpointCallback(str(tmp_path / "ckpt"), t1)
    t1.fit(data, epochs=2, callbacks=[cb], verbose=False)
    cb.manager.wait()
    step_after = int(t1.state.step)
    params_after = jax.tree.map(np.asarray, t1.state.params)

    t2 = make_trainer()
    cb2 = CheckpointCallback(str(tmp_path / "ckpt"), t2)
    assert cb2.restore_into(t2)
    assert int(t2.state.step) == step_after
    for a, b in zip(jax.tree.leaves(t2.state.params),
                    jax.tree.leaves(params_after)):
        np.testing.assert_array_equal(np.asarray(a), b)
    # restored state still trains on the mesh
    h = t2.fit(data, epochs=1, verbose=False)
    assert np.isfinite(h[0]["loss"])
    cb.manager.close()
    cb2.manager.close()


def test_checkpoint_restore_across_topologies(tmp_path):
    """Production elasticity: a checkpoint written from one mesh restores
    onto a DIFFERENT topology. Orbax reshards to the target state's
    shardings, so TP-sharded kernels written from a {data:2, model:4} mesh
    land correctly on {data:4, model:2} and on a single device (serving).
    The reference has no equivalent (single-process Keras .h5 files)."""
    from jax.sharding import PartitionSpec as P

    from chambers_tpu.parallel import create_mesh

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            return nn.Dense(1)(nn.relu(nn.Dense(8, name="wide")(x)))

    rules = [("wide/kernel", P(None, "model"))]
    rng = np.random.RandomState(0)
    data = [(rng.randn(16, 4).astype(np.float32),
             rng.randn(16, 1).astype(np.float32)) for _ in range(2)]

    def make_trainer(mesh_shape):
        module = Net()
        variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
        mesh = create_mesh(mesh_shape) if mesh_shape else None
        return Trainer(
            Model(module, variables),
            loss=lambda yt, yp: jnp.mean((yt - yp) ** 2),
            optimizer=optax.adam(1e-2),
            mesh=mesh,
            param_sharding_rules=rules if mesh else None,
        )

    t1 = make_trainer({"data": 2, "model": 4})
    cb = CheckpointCallback(str(tmp_path / "ckpt"), t1)
    t1.fit(data, epochs=1, callbacks=[cb], verbose=False)
    cb.manager.wait()
    step_after = int(t1.state.step)
    params_after = jax.tree.map(np.asarray, t1.state.params)

    for shape in ({"data": 4, "model": 2}, None):
        t2 = make_trainer(shape)
        cb2 = CheckpointCallback(str(tmp_path / "ckpt"), t2)
        assert cb2.restore_into(t2), shape
        assert int(t2.state.step) == step_after
        for a, b in zip(jax.tree.leaves(t2.state.params),
                        jax.tree.leaves(params_after)):
            np.testing.assert_array_equal(np.asarray(a), b)
        if shape:
            # the restored kernel is genuinely sharded on the NEW mesh
            wide = t2.state.params["wide"]["kernel"]
            assert wide.sharding.spec == P(None, "model")
            assert wide.sharding.mesh.shape["model"] == shape["model"]
        h = t2.fit(data, epochs=1, verbose=False)
        assert np.isfinite(h[0]["loss"])
        cb2.manager.close()
    cb.manager.close()


class TestPreemption:
    """PreemptionCheckpoint: SIGTERM -> durable save at the next batch
    boundary, clean stop, exact resume (SURVEY §5.3 elastic recovery)."""

    def test_stop_training_ends_fit_early(self):
        from chambers_tpu.callbacks import Callback

        class StopAtEpoch0(Callback):
            def on_epoch_end(self, epoch, logs=None):
                self.model.stop_training = True

        trainer = _trainer()
        history = trainer.fit(_data(), epochs=5, verbose=False,
                              callbacks=[StopAtEpoch0()])
        assert len(history) == 1

    def test_sigterm_saves_and_stops(self, tmp_path):
        import os
        import signal

        from chambers_tpu.callbacks import Callback
        from chambers_tpu.training.checkpoint import PreemptionCheckpoint

        class SendSigterm(Callback):
            """Deliver SIGTERM to ourselves during batch 1 of epoch 0 —
            exactly what a TPU reclaim does to the training process."""
            def __init__(self):
                self.sent = False

            def on_train_batch_begin(self, batch, logs=None):
                if batch == 1 and not self.sent:
                    self.sent = True
                    os.kill(os.getpid(), signal.SIGTERM)

        trainer = _trainer()
        pc = PreemptionCheckpoint(str(tmp_path / "pc"), trainer)
        prev_handler = signal.getsignal(signal.SIGTERM)
        history = trainer.fit(_data(8), epochs=3, verbose=False,
                              callbacks=[SendSigterm(), pc])
        # stopped in epoch 0, after batch 2 (the boundary after the signal)
        assert len(history) == 1
        saved_step = int(trainer.state.step)
        assert saved_step == 2
        assert pc.manager.latest_step() == saved_step
        # the original handler is back once fit returns
        assert signal.getsignal(signal.SIGTERM) is prev_handler

        # resume in a fresh trainer: exact step and params
        trainer2 = _trainer(seed=1)
        assert pc.restore_into(trainer2)
        assert int(trainer2.state.step) == saved_step
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            trainer2.state.params, trainer.state.params)

    def test_save_every_steps_cadence(self, tmp_path):
        from chambers_tpu.training.checkpoint import PreemptionCheckpoint

        trainer = _trainer()
        pc = PreemptionCheckpoint(str(tmp_path / "cadence"), trainer,
                                  max_to_keep=10, save_every_steps=2)
        trainer.fit(_data(5), epochs=1, verbose=False, callbacks=[pc])
        pc.manager.wait()
        # steps 2 and 4 from the cadence, 5 from on_train_end
        assert pc.manager.all_steps() == [2, 4, 5]

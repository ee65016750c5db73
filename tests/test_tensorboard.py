"""TensorBoard event-file interop (reference callbacks.py:39-46 wires
tf.keras.callbacks.TensorBoard into every experiment).

The self round-trip always runs; the byte-level gates run against real
TensorFlow when installed — files written here must read through
``tf.compat.v1.train.summary_iterator`` (what TensorBoard itself loads),
and files written by ``tf.summary`` must read here.
"""

import glob
import os

import numpy as np
import optax
import pytest
from flax import linen as nn

from chambers_tpu.callbacks import ExperimentCallback, TensorBoard
from chambers_tpu.models import Model
from chambers_tpu.training import Trainer
from chambers_tpu.utils.tensorboard import SummaryWriter, read_events


def _scalars(path):
    out = []
    for e in read_events(path):
        for v in e.get("values", []):
            if "simple_value" in v:
                out.append((e["step"], v["tag"], v["simple_value"]))
    return out


class TestSelfRoundTrip:
    def test_scalars(self, tmp_path):
        with SummaryWriter(str(tmp_path)) as w:
            w.add_scalar("loss", 0.5, step=1)
            w.add_scalar("loss", 0.25, step=2)
            path = w.path
        events = list(read_events(path))
        assert events[0]["file_version"] == "brain.Event:2"
        assert _scalars(path) == [(1, "loss", 0.5), (2, "loss", 0.25)]

    def test_histogram_int_bins(self, tmp_path):
        values = np.random.RandomState(0).randn(500)
        with SummaryWriter(str(tmp_path)) as w:
            w.add_histogram("h", values, step=3, bins=20)
            path = w.path
        (event,) = [e for e in read_events(path) if "values" in e]
        histo = event["values"][0]["histo"]
        assert event["step"] == 3
        assert histo["num"] == 500
        np.testing.assert_allclose(histo["sum"], values.sum())
        np.testing.assert_allclose(histo["sum_squares"],
                                   np.square(values).sum())
        assert histo["bucket"].sum() == 500
        assert len(histo["bucket_limit"]) == 20

    def test_histogram_default_buckets_cover_all(self, tmp_path):
        values = np.random.RandomState(1).randn(200) * 100
        with SummaryWriter(str(tmp_path)) as w:
            w.add_histogram("h", values, step=0)
            path = w.path
        (event,) = [e for e in read_events(path) if "values" in e]
        assert event["values"][0]["histo"]["bucket"].sum() == 200

    def test_text(self, tmp_path):
        with SummaryWriter(str(tmp_path)) as w:
            w.add_text("note", "hello **world**", step=0)
            path = w.path
        (event,) = [e for e in read_events(path) if "values" in e]
        assert bytes(event["values"][0]["tensor"].item()) == b"hello **world**"

    def test_closed_writer_raises(self, tmp_path):
        w = SummaryWriter(str(tmp_path))
        w.close()
        with pytest.raises(ValueError, match="closed"):
            w.add_scalar("x", 1.0, step=0)


class TestTFInterop:
    def test_tf_reads_our_file(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        values = np.random.RandomState(0).randn(300)
        with SummaryWriter(str(tmp_path)) as w:
            w.add_scalar("loss", 0.125, step=7)
            w.add_histogram("weights", values, step=7, bins=16)
            w.add_text("cfg", "abc", step=0)
            path = w.path
        events = list(tf.compat.v1.train.summary_iterator(path))
        assert events[0].file_version == "brain.Event:2"
        kinds = {}
        for e in events[1:]:
            for v in e.summary.value:
                kinds[v.tag] = (e.step, v)
        step, v = kinds["loss"]
        assert step == 7 and v.simple_value == 0.125
        step, v = kinds["weights"]
        assert v.histo.num == 300
        np.testing.assert_allclose(v.histo.sum, values.sum())
        assert sum(v.histo.bucket) == 300
        assert len(v.histo.bucket_limit) == len(v.histo.bucket) == 16
        _, v = kinds["cfg"]
        assert tf.make_ndarray(v.tensor) == b"abc"
        assert v.metadata.plugin_data.plugin_name == "text"

    def test_we_read_tf_file(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        w = tf.summary.create_file_writer(str(tmp_path))
        with w.as_default():
            tf.summary.scalar("acc", 0.75, step=3)
            tf.summary.text("note", "abc", step=0)
        w.close()
        (path,) = glob.glob(str(tmp_path / "*tfevents*"))
        got = {}
        for e in read_events(path):
            for v in e.get("values", []):
                got[v["tag"]] = (e["step"], v)
        # TF2 writes scalars as DT_FLOAT tensors, not simple_value
        step, v = got["acc"]
        assert step == 3
        np.testing.assert_allclose(v["tensor"], 0.75)
        _, v = got["note"]
        assert bytes(np.asarray(v["tensor"]).reshape(-1)[0]) == b"abc"


class _Net(nn.Module):
    @nn.compact
    def __call__(self, x, deterministic=True):
        return nn.Dense(1)(nn.relu(nn.Dense(8)(x)))


def _mse(y_true, y_pred):
    import jax.numpy as jnp

    return jnp.mean((y_true - y_pred) ** 2)


def _data(n=3, seed=0):
    rng = np.random.RandomState(seed)
    return [(rng.randn(8, 4).astype(np.float32),
             rng.randn(8, 1).astype(np.float32)) for _ in range(n)]


def _make_trainer():
    import jax
    import jax.numpy as jnp

    module = _Net()
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    return Trainer(Model(module, variables), loss=_mse,
                   optimizer=optax.adam(1e-2))


class TestCallback:
    def test_epoch_scalars_split_train_validation(self, tmp_path):
        trainer = _make_trainer()
        cb = TensorBoard(str(tmp_path))
        history = trainer.fit(_data(), epochs=2, callbacks=[cb],
                              validation_data=_data(seed=1), verbose=False)
        (train_file,) = glob.glob(str(tmp_path / "train" / "*tfevents*"))
        (val_file,) = glob.glob(str(tmp_path / "validation" / "*tfevents*"))
        train = _scalars(train_file)
        val = _scalars(val_file)
        # same tag in both dirs => TensorBoard overlays the curves
        assert [t for _, t, _ in train] == ["epoch_loss", "epoch_loss"]
        assert [t for _, t, _ in val] == ["epoch_loss", "epoch_loss"]
        for i, logs in enumerate(history):
            np.testing.assert_allclose(train[i][2], logs["loss"], rtol=1e-6)
            np.testing.assert_allclose(val[i][2], logs["val_loss"], rtol=1e-6)

    def test_batch_freq_and_histograms(self, tmp_path):
        trainer = _make_trainer()
        cb = TensorBoard(str(tmp_path), update_freq="batch",
                         histogram_freq=1)
        trainer.fit(_data(n=3), epochs=2, callbacks=[cb], verbose=False)
        (train_file,) = glob.glob(str(tmp_path / "train" / "*tfevents*"))
        tags = [t for _, t, _ in _scalars(train_file)]
        assert tags.count("batch_loss") == 6  # 3 batches x 2 epochs
        histo_tags = {
            v["tag"]
            for e in read_events(train_file)
            for v in e.get("values", [])
            if "histo" in v
        }
        assert "Dense_0/kernel" in histo_tags
        assert "Dense_1/bias" in histo_tags

    def test_bad_update_freq_raises(self, tmp_path):
        with pytest.raises(ValueError, match="update_freq"):
            TensorBoard(str(tmp_path), update_freq="step")

    def test_experiment_callback_writes_tfevents(self, tmp_path):
        trainer = _make_trainer()
        exp = ExperimentCallback(str(tmp_path / "experiments"),
                                 checkpoint_monitor="loss")
        trainer.fit(_data(), epochs=1, callbacks=[exp], verbose=False)
        files = glob.glob(
            os.path.join(exp.log_dir, "train", "*tfevents*"))
        assert files, "ExperimentCallback did not produce tfevents"
        assert [t for _, t, _ in _scalars(files[0])] == ["epoch_loss"]

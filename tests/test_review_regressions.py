"""Regression tests for the round-1 code-review findings."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from chambers_tpu.data import Dataset
from chambers_tpu.losses import MultiSimilarityLoss, soft_dice_coefficient
from chambers_tpu.models import Model
from chambers_tpu.training import Trainer
from chambers_tpu.utils.tensor import remove_diagonal, remove_indices


def test_remove_indices_jittable():
    out = jax.jit(lambda x: remove_indices(x, [1, 3], axis=0))(jnp.arange(5.0))
    np.testing.assert_array_equal(np.asarray(out), [0.0, 2.0, 4.0])

    out = jax.jit(lambda x: remove_diagonal(x))(jnp.arange(9.0).reshape(3, 3))
    np.testing.assert_array_equal(
        np.asarray(out), [[1.0, 2.0], [3.0, 5.0], [6.0, 7.0]]
    )

    # dice with exclude_classes inside jit (the original failure mode)
    y = jnp.zeros((1, 4, 4, 3)).at[..., 0].set(1.0)
    loss = jax.jit(
        lambda a, b: soft_dice_coefficient(a, b, exclude_classes=[2])
    )(y, y)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)


def test_ms_loss_gradients_finite_with_unnormalized_embeddings():
    """exp over masked (diagonal) similarities must not poison gradients."""
    rng = np.random.RandomState(0)
    emb = (rng.randn(8, 16) * 2.0).astype(np.float32)  # ||x||^2 >> 2.7
    labels = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3])
    loss = MultiSimilarityLoss()

    value, grads = jax.value_and_grad(
        lambda e: loss(labels, e)
    )(jnp.asarray(emb))
    assert np.isfinite(float(value))
    assert np.isfinite(np.asarray(grads)).all()


def test_dataset_cache_survives_partial_iteration():
    ds = Dataset.range(5).cache()
    assert [int(x) for x in ds.take(3)] == [0, 1, 2]  # partial pass
    assert [int(x) for x in ds] == [0, 1, 2, 3, 4]    # full pass commits
    assert [int(x) for x in ds] == [0, 1, 2, 3, 4]    # served from cache


def test_flash_attention_causal_cross_length():
    """Causal with tq != tk must match the XLA tril(k=tv-tq) convention,
    in both forward and backward."""
    from chambers_tpu.layers.attention import scaled_dot_product_attention
    from chambers_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 2, 4, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 8, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 8, 64).astype(np.float32))

    out_f = flash_attention(q, v, k, causal=True)
    out_x = scaled_dot_product_attention(q, v, k, causal=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), atol=2e-5)

    gf = jax.grad(lambda q: jnp.sum(flash_attention(q, v, k, causal=True) ** 2))(q)
    gx = jax.grad(
        lambda q: jnp.sum(scaled_dot_product_attention(q, v, k, causal=True) ** 2)
    )(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=1e-3,
                               rtol=1e-3)

    # longer, block-crossing case
    q2 = jnp.asarray(rng.randn(1, 1, 130, 64).astype(np.float32))
    k2 = jnp.asarray(rng.randn(1, 1, 260, 64).astype(np.float32))
    v2 = jnp.asarray(rng.randn(1, 1, 260, 64).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(flash_attention(q2, v2, k2, causal=True)),
        np.asarray(scaled_dot_product_attention(q2, v2, k2, causal=True)),
        atol=2e-5,
    )


class _Net(nn.Module):
    @nn.compact
    def __call__(self, x, deterministic=True):
        return nn.Dense(1)(x)


def _model():
    module = _Net()
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    return Model(module, variables)


def _data(n=4):
    rng = np.random.RandomState(0)
    return [(rng.randn(8, 4).astype(np.float32),
             rng.randn(8, 1).astype(np.float32)) for _ in range(n)]


def test_trainer_refit_after_sync(tmp_path):
    """sync_model must copy — a second fit() donates the state and would
    otherwise delete the arrays backing model.variables."""
    model = _model()
    trainer = Trainer(model, loss=lambda a, b: jnp.mean((a - b) ** 2),
                      optimizer=optax.adam(1e-2))
    trainer.fit(_data(), epochs=1, verbose=False)
    out1 = model(np.zeros((1, 4), np.float32))  # uses synced variables
    trainer.fit(_data(), epochs=1, verbose=False)
    out2 = model(np.zeros((1, 4), np.float32))  # must not raise 'deleted'
    assert np.isfinite(np.asarray(out1)).all()
    assert np.isfinite(np.asarray(out2)).all()
    model.save_weights(str(tmp_path / "w.msgpack"))  # buffers alive


def test_trainer_generator_exhaustion_raises():
    model = _model()
    trainer = Trainer(model, loss=lambda a, b: jnp.mean((a - b) ** 2),
                      optimizer=optax.adam(1e-2))
    gen = (batch for batch in _data())  # single-pass generator
    import pytest

    with pytest.raises(ValueError, match="re-iterable"):
        trainer.fit(gen, epochs=3, verbose=False)


def test_trainer_steps_per_epoch_advances_stream():
    """With steps_per_epoch the iterator persists: epochs see different data."""
    model = _model()
    seen = []

    def dataset():
        rng = np.random.RandomState(0)
        for i in range(100):
            x = np.full((4, 4), float(i), np.float32)
            seen.append(i)
            yield x, np.zeros((4, 1), np.float32)

    class Reiterable:
        def __iter__(self):
            return dataset()

    trainer = Trainer(model, loss=lambda a, b: jnp.mean((a - b) ** 2),
                      optimizer=optax.adam(1e-2))
    trainer.fit(Reiterable(), epochs=3, steps_per_epoch=5, verbose=False)
    # 3 epochs x 5 steps consumed 15 *distinct* stream elements
    assert seen[:15] == list(range(15))
    # no per-epoch restarts; the device prefetcher legitimately reads up to
    # its depth (2) ahead of the last trained step (tf.data prefetch ditto)
    assert len(seen) <= 17


def test_tp_opt_state_sharded_like_params():
    from chambers_tpu.layers import MultiHeadAttention
    from chambers_tpu.parallel import VIT_TENSOR_PARALLEL_RULES, create_mesh

    class AttnNet(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            h = MultiHeadAttention(head_dim=4, num_heads=4, dropout_rate=0.0,
                                   name="multi_head_attention")([x, x])
            return nn.Dense(1)(h[:, 0])

    module = AttnNet()
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 16)))
    mesh = create_mesh({"data": 4, "model": 2})
    trainer = Trainer(
        Model(module, variables),
        loss=lambda a, b: jnp.mean((a - b) ** 2),
        optimizer=optax.adam(1e-2),
        mesh=mesh,
        param_sharding_rules=VIT_TENSOR_PARALLEL_RULES,
    )
    # Adam mu for w_query must carry the same 'model' sharding as the param
    mu = trainer.state.opt_state[0].mu["multi_head_attention"]["w_query"]
    assert mu.sharding.spec == (None, "model", None)


def test_random_contrast_keras_tuple_semantics():
    from chambers_tpu.augmentations import RandomContrast

    rc = RandomContrast((0.2, 0.3))
    assert abs(rc.lower - 0.8) < 1e-6 and abs(rc.upper - 1.3) < 1e-6
    rc = RandomContrast(0.5)
    assert abs(rc.lower - 0.5) < 1e-6 and abs(rc.upper - 1.5) < 1e-6


def test_random_crop_upscales_small_inputs():
    from chambers_tpu.augmentations import RandomCrop

    small = np.zeros((2, 20, 30, 3), np.uint8)
    out = RandomCrop(32, 32)(jnp.asarray(small), key=jax.random.PRNGKey(0))
    assert out.shape == (2, 32, 32, 3)
    out = RandomCrop(32, 32)(jnp.asarray(small), training=False)
    assert out.shape == (2, 32, 32, 3)


def test_records_bytes_roundtrip(tmp_path):
    from chambers_tpu.data import dataset_to_records, records_to_dataset

    elements = [(b"\xff\xd8raw-jpeg-bytes\x00", np.int64(1)),
                ("a string", np.int64(2))]
    path = str(tmp_path / "b.records")
    dataset_to_records(Dataset.from_generator(lambda: iter(elements)), path)
    restored = list(records_to_dataset(path))
    assert restored[0][0] == elements[0][0] and isinstance(restored[0][0], bytes)
    assert restored[1][0] == "a string" and isinstance(restored[1][0], str)


def test_prefetch_thread_released_on_abandon():
    import threading
    import time as _time

    before = threading.active_count()
    for _ in range(5):
        for x in Dataset.range(1000).prefetch(2):
            break  # abandon immediately
    _time.sleep(0.5)  # give producers time to observe stop + exit
    after = threading.active_count()
    assert after <= before + 1  # no accumulation of leaked producers


def test_predict_empty_batch():
    result = _model().predict(np.zeros((0, 4), np.float32))
    assert result.shape == (0, 1)


def test_evaluate_accepts_plain_callback_list():
    from chambers_tpu.callbacks import Callback

    events = []

    class Rec(Callback):
        def on_test_begin(self, logs=None):
            events.append("begin")

    trainer = Trainer(_model(), loss=lambda a, b: jnp.mean((a - b) ** 2),
                      optimizer=optax.adam(1e-2))
    trainer.evaluate(_data(2), callbacks=[Rec()], verbose=False)
    assert events == ["begin"]


def test_csv_logger_supports_refit(tmp_path):
    from chambers_tpu.callbacks import CSVLogger

    path = str(tmp_path / "log.csv")
    logger = CSVLogger(path)
    trainer = Trainer(_model(), loss=lambda a, b: jnp.mean((a - b) ** 2),
                      optimizer=optax.adam(1e-2))
    trainer.fit(_data(2), epochs=1, callbacks=[logger], verbose=False)
    trainer.fit(_data(2), epochs=1, callbacks=[logger], verbose=False)
    rows = open(path).read().strip().splitlines()
    assert len(rows) == 3  # header + 2 epochs across two fits


def test_lsa_rejects_more_targets_than_queries():
    import pytest

    from chambers_tpu.losses.detection import _lsa_host

    with pytest.raises(ValueError, match="rows <= cols"):
        _lsa_host(np.zeros((5, 3), np.float32))


def test_paired_giou_matches_pairwise_diagonal():
    from chambers_tpu.losses.detection import (
        generalized_box_iou,
        paired_generalized_box_iou,
    )

    rng = np.random.RandomState(0)
    a = np.sort(rng.rand(6, 2, 2), axis=1).reshape(6, 4).astype(np.float32)
    b = np.sort(rng.rand(6, 2, 2), axis=1).reshape(6, 4).astype(np.float32)
    paired = np.asarray(paired_generalized_box_iou(jnp.asarray(a), jnp.asarray(b)))
    diag = np.diagonal(np.asarray(generalized_box_iou(jnp.asarray(a), jnp.asarray(b))))
    np.testing.assert_allclose(paired, diag, atol=1e-6)


# --- round-5 review findings -------------------------------------------------

class _TinyNet(nn.Module):
    classes: int = 3

    @nn.compact
    def __call__(self, x, deterministic=True):
        return nn.Dense(self.classes)(x)


def _tiny_model(classes=3, seed=0):
    module = _TinyNet(classes=classes)
    variables = module.init(jax.random.PRNGKey(seed), jnp.zeros((1, 4)))
    return Model(module, variables)


def test_windowed_fit_survives_partial_tail_batch():
    """steps_per_execution>1 + a partial tail batch: the window must cut at
    the shape boundary (and push the tail into its own window) instead of
    crashing jnp.stack. n=72 @ batch 16 -> batches 16,16,16,16,8."""
    from chambers_tpu.losses import SparseCategoricalCrossentropy

    rng = np.random.RandomState(0)
    x = rng.randn(72, 4).astype(np.float32)
    y = rng.randint(0, 3, size=(72,)).astype(np.int32)

    def run(spe):
        model = _tiny_model()
        model.compile(optax.sgd(1e-2),
                      SparseCategoricalCrossentropy(from_logits=True),
                      steps_per_execution=spe)
        return model.fit(x, y, batch_size=16, epochs=2, shuffle=False,
                         verbose=False)

    h1, h3 = run(1), run(3)
    for a, b in zip(h1, h3):
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)


def test_windowed_evaluate_survives_partial_tail_batch():
    from chambers_tpu.losses import SparseCategoricalCrossentropy

    rng = np.random.RandomState(1)
    x = rng.randn(40, 4).astype(np.float32)
    y = rng.randint(0, 3, size=(40,)).astype(np.int32)

    def run(spe):
        model = _tiny_model()
        model.compile(optax.sgd(1e-2),
                      SparseCategoricalCrossentropy(from_logits=True),
                      steps_per_execution=spe)
        return model.evaluate(x, y, batch_size=16, verbose=False,
                              return_dict=True)

    np.testing.assert_allclose(run(1)["loss"], run(4)["loss"], rtol=1e-6)


def test_class_weight_label_column_squeezes():
    """[b, 1] integer label columns must weight by the LABEL, not by
    argmax-over-one-column (which is always class 0)."""
    from chambers_tpu.losses import SparseCategoricalCrossentropy

    rng = np.random.RandomState(2)
    x = rng.randn(16, 4).astype(np.float32)
    y = rng.randint(0, 3, size=(16,)).astype(np.int32)
    cw = {0: 5.0, 1: 1.0, 2: 1.0}
    loss = SparseCategoricalCrossentropy(from_logits=True)

    def run(labels):
        trainer = Trainer(_tiny_model(), loss=loss,
                          optimizer=optax.sgd(1e-2))
        hist = trainer.fit([(x, labels)], epochs=1, verbose=False,
                           class_weight=cw)
        return hist[0]["loss"]

    np.testing.assert_allclose(run(y[:, None]), run(y), rtol=1e-6)


def test_weighted_metric_callable_on_unweighted_dataset():
    """weighted_metrics callables degrade to weights-of-ones when the
    dataset carries no sample weights (Keras), instead of crashing on
    sample_weight=None."""
    def weighted_mae(y_true, y_pred, sw):
        err = jnp.abs(y_pred[jnp.arange(y_pred.shape[0]), y_true])
        return jnp.sum(err * sw) / jnp.sum(sw)

    rng = np.random.RandomState(3)
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randint(0, 3, size=(8,)).astype(np.int32)
    from chambers_tpu.losses import SparseCategoricalCrossentropy

    trainer = Trainer(_tiny_model(),
                      loss=SparseCategoricalCrossentropy(from_logits=True),
                      optimizer=optax.sgd(1e-2),
                      weighted_metrics={"w_mae": weighted_mae})
    logs = trainer.evaluate([(x, y)], verbose=False)
    ones = trainer.evaluate([(x, y, np.ones(8, np.float32))], verbose=False)
    np.testing.assert_allclose(logs["w_mae"], ones["w_mae"], rtol=1e-6)


def test_facade_rejects_sample_weight_with_iterable():
    import pytest

    model = _tiny_model()
    model.compile("adam", "mse")
    batches = [(np.zeros((4, 4), np.float32), np.zeros((4, 3), np.float32))]
    w = np.ones(4, np.float32)
    with pytest.raises(ValueError, match="sample_weight"):
        model.fit(batches, sample_weight=w)
    with pytest.raises(ValueError, match="sample_weight"):
        model.evaluate(batches, sample_weight=w)


def test_validation_split_keras_boundary():
    """Keras trains on int(n*(1-split)): n=10, split=0.33 -> 6 train / 4 val."""
    from chambers_tpu.models.model import _ArrayBatcher  # noqa: F401

    seen = {}

    class _SpyBatcher(list):
        pass

    model = _tiny_model()
    model.compile(optax.sgd(1e-2), "mse")
    x = np.random.RandomState(4).randn(10, 4).astype(np.float32)
    y = np.zeros((10, 3), np.float32)
    orig_fit = model.trainer.fit

    def spy_fit(dataset, **kw):
        seen["train_n"] = dataset.n
        seen["val_n"] = kw["validation_data"].n
        return orig_fit(dataset, **kw)

    model.trainer.fit = spy_fit
    try:
        model.fit(x, y, batch_size=5, epochs=1, validation_split=0.33,
                  verbose=False)
    finally:
        model.trainer.fit = orig_fit
    assert seen == {"train_n": 6, "val_n": 4}


def test_early_stopping_patience_zero_stops_at_epoch_one():
    """tf.keras order of operations: patience=0 stops at epoch 1 even on a
    monotonically improving metric (wait=0 >= patience=0)."""
    from chambers_tpu.callbacks import EarlyStopping

    class _Stub:
        stop_training = False

        def get_weights(self):
            return {}

    es = EarlyStopping(monitor="val_loss", patience=0)
    stub = _Stub()
    es.set_model(stub)
    es.on_train_begin()
    es.on_epoch_end(0, {"val_loss": 1.0})
    assert not stub.stop_training  # never on the very first epoch
    es.on_epoch_end(1, {"val_loss": 0.5})  # improving — still stops
    assert stub.stop_training and es.stopped_epoch == 1

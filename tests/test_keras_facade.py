"""The Keras front door: ``model.compile`` / ``model.fit`` / ``model.evaluate``.

The reference's training scripts are Keras scripts — ``model.compile(...)``
then ``model.fit(...)`` (reference test_units/manual_test_vit_weights.py
trains exactly this way). These tests pin the facade: string
optimizer/loss resolution, Keras list-form metrics, weight sync-back after
fit, Trainer kwargs pass-through, and the two Keras-staple losses added
with it (SparseCategoricalCrossentropy, MeanSquaredError).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from flax import linen as nn

from chambers_tpu.losses import (
    CategoricalCrossentropy,
    MeanSquaredError,
    SparseCategoricalCrossentropy,
)
from chambers_tpu.metrics import SparseCategoricalAccuracy
from chambers_tpu.models import Model


class _Net(nn.Module):
    classes: int = 4

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(32)(x)
        x = nn.relu(x)
        return nn.Dense(self.classes)(x)


def _model(classes=4, seed=0):
    module = _Net(classes=classes)
    variables = module.init(jax.random.PRNGKey(seed), jnp.zeros((1, 8)))
    return Model(module, variables)


def _data(n=64, classes=4, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, 8).astype(np.float32)
    y = rng.randint(0, classes, size=(n,)).astype(np.int32)
    return [(x[i:i + 16], y[i:i + 16]) for i in range(0, n, 16)]


class TestSparseCEAndMSE:
    def test_sparse_ce_equals_dense_ce_on_one_hot(self):
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(8, 5).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 5, size=(8,)))
        sparse = SparseCategoricalCrossentropy(from_logits=True)
        dense = CategoricalCrossentropy(from_logits=True)
        one_hot = jnp.eye(5)[labels]
        np.testing.assert_allclose(
            np.asarray(sparse(labels, logits)),
            np.asarray(dense(one_hot, logits)), rtol=1e-6)
        # [b, 1] labels squeeze (Keras squeeze-or-expand)
        np.testing.assert_allclose(
            np.asarray(sparse(labels[:, None], logits)),
            np.asarray(sparse(labels, logits)), rtol=1e-6)

    def test_sparse_ce_value_pinned_vs_optax(self):
        rng = np.random.RandomState(1)
        logits = jnp.asarray(rng.randn(16, 7).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 7, size=(16,)))
        got = SparseCategoricalCrossentropy(from_logits=True)(labels, logits)
        want = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)

    def test_sparse_ce_probabilities_mode(self):
        probs = jnp.asarray([[0.8, 0.1, 0.1], [0.2, 0.5, 0.3]], jnp.float32)
        labels = jnp.asarray([0, 1])
        got = SparseCategoricalCrossentropy()(labels, probs)
        want = -(np.log(0.8) + np.log(0.5)) / 2
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)

    def test_mse_keras_semantics(self):
        """Per-sample mean over the LAST axis, then batch mean (Keras MSE),
        with sample_weight and reduction from the Loss contract."""
        yt = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        yp = jnp.asarray([[1.0, 0.0], [0.0, 4.0]])
        per_sample = np.asarray([2.0, 4.5])
        mse = MeanSquaredError()
        np.testing.assert_allclose(np.asarray(mse(yt, yp)),
                                   per_sample.mean(), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(MeanSquaredError(reduction="none")(yt, yp)),
            per_sample, rtol=1e-6)
        w = jnp.asarray([2.0, 0.0])
        np.testing.assert_allclose(
            np.asarray(mse(yt, yp, sample_weight=w)),
            (per_sample * [2.0, 0.0]).sum() / 2, rtol=1e-6)


class TestCompileFitEvaluate:
    def test_compile_fit_trains_and_syncs_weights(self):
        model = _model()
        before = jax.tree.map(np.asarray, model.variables)
        model.compile("adam", SparseCategoricalCrossentropy(from_logits=True),
                      metrics=[SparseCategoricalAccuracy()])
        hist = model.fit(_data(), epochs=3, verbose=False)
        losses = [h["loss"] for h in hist]
        assert losses[-1] < losses[0]
        assert "sparse_categorical_accuracy" in hist[0]
        # Keras semantics: the model owns the trained weights
        after = model.variables
        moved = jax.tree.map(
            lambda a, b: float(np.abs(a - np.asarray(b)).max()),
            before, after)
        assert max(jax.tree.leaves(moved)) > 0
        # and eager inference uses them (predict == direct apply)
        x = _data()[0][0]
        np.testing.assert_allclose(
            model.predict(x, batch_size=16), np.asarray(model(x)), atol=1e-6)

    def test_evaluate_returns_logs(self):
        model = _model()
        model.compile(optax.adam(1e-3),
                      SparseCategoricalCrossentropy(from_logits=True),
                      metrics={"acc": SparseCategoricalAccuracy()})
        logs = model.evaluate(_data(), verbose=False, return_dict=True)
        assert "loss" in logs and "acc" in logs
        assert np.isfinite(logs["loss"])

    def test_trainer_kwargs_pass_through(self):
        """steps_per_execution reaches the Trainer and N=2 matches N=1."""
        loss = SparseCategoricalCrossentropy(from_logits=True)
        h1 = _model(seed=3).compile(
            optax.sgd(1e-2), loss,
        ).fit(_data(seed=5), epochs=1, verbose=False)
        h2 = _model(seed=3).compile(
            optax.sgd(1e-2), loss, steps_per_execution=2,
        ).fit(_data(seed=5), epochs=1, verbose=False)
        np.testing.assert_allclose(h1[0]["loss"], h2[0]["loss"], rtol=1e-6)

    def test_mse_string_and_regression(self):
        rng = np.random.RandomState(2)
        x = rng.randn(64, 8).astype(np.float32)
        w_true = rng.randn(8, 1).astype(np.float32)
        y = x @ w_true
        model = Model(
            _Net(classes=1),
            _Net(classes=1).init(jax.random.PRNGKey(0), jnp.zeros((1, 8))))
        model.compile("adam", "mse")
        data = [(x[i:i + 16], y[i:i + 16]) for i in range(0, 64, 16)]
        hist = model.fit(data, epochs=5, verbose=False)
        assert hist[-1]["loss"] < hist[0]["loss"]

    def test_errors(self):
        model = _model()
        with pytest.raises(ValueError, match="not compiled"):
            model.fit(_data())
        with pytest.raises(ValueError, match="unknown optimizer"):
            model.compile("adamax", "mse")
        with pytest.raises(ValueError, match="unknown loss"):
            model.compile("adam", "hinge")
        with pytest.raises(ValueError, match="duplicate"):
            model.compile("adam", "mse",
                          metrics=[lambda yt, yp: jnp.mean(yp),
                                   lambda yt, yp: jnp.mean(yt)])
        # string loss resolves to the Keras default (from_logits=False),
        # exactly as tf.keras's string resolution does
        model.compile("adam", "sparse_categorical_crossentropy")
        assert model.trainer.loss.from_logits is False
        # named callables in list form are fine
        def top_logit(yt, yp):
            return jnp.mean(jnp.max(yp, axis=-1))
        model.compile("adam", "mse", metrics=[top_logit])
        assert "top_logit" in model.trainer.metrics


class TestStringMetrics:
    def test_accuracy_infers_sparse_from_loss(self):
        model = _model()
        model.compile("adam", "sparse_categorical_crossentropy",
                      metrics=["accuracy"])
        logs = model.evaluate(_data(), return_dict=True)
        assert "accuracy" in logs  # reported under the user's string
        assert 0.0 <= logs["accuracy"] <= 1.0

    def test_accuracy_not_inferable_raises(self):
        model = _model()
        with pytest.raises(ValueError, match="infer"):
            model.compile("adam", "mse", metrics=["accuracy"])

    def test_explicit_strings_resolve(self):
        from chambers_tpu import metrics as M

        model = _model()
        model.compile(
            "adam", "sparse_categorical_crossentropy",
            metrics=["sparse_categorical_accuracy",
                     M.SparseTopKCategoricalAccuracy(k=2)])
        logs = model.evaluate(_data(), return_dict=True)
        assert "sparse_categorical_accuracy" in logs
        assert "sparse_top_k_categorical_accuracy" in logs

    def test_unknown_metric_string_raises(self):
        model = _model()
        with pytest.raises(ValueError, match="unknown metric string"):
            model.compile("adam", "mse", metrics=["nope"])

    def test_binary_crossentropy_string_and_accuracy(self):
        module = _Net(classes=1)
        variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))
        model = Model(module, variables)
        model.compile("adam", "binary_crossentropy", metrics=["accuracy"])
        rng = np.random.RandomState(0)
        x = rng.randn(32, 8).astype(np.float32)
        y = rng.randint(0, 2, size=(32, 1)).astype(np.float32)
        logs = model.evaluate([(x, y)], return_dict=True)
        assert "accuracy" in logs and np.isfinite(logs["loss"])


class TestArrayFormFit:
    def test_fit_arrays_trains_and_splits(self):
        rng = np.random.RandomState(1)
        x = rng.randn(80, 8).astype(np.float32)
        # learnable targets (a fixed linear rule), so the loss must descend
        y = np.argmax(x[:, :4] + 0.1 * rng.randn(80, 4), axis=1) \
            .astype(np.int32)
        model = _model()
        model.compile("adam", "sparse_categorical_crossentropy",
                      metrics=["accuracy"])
        history = model.fit(x, y, batch_size=16, epochs=3,
                            validation_split=0.25, verbose=False)
        assert len(history) == 3
        # Keras semantics: val metrics present, split taken from the tail
        assert "val_loss" in history[-1] and "val_accuracy" in history[-1]
        assert history[-1]["loss"] < history[0]["loss"]  # it actually trains

    def test_fit_arrays_requires_targets(self):
        model = _model()
        model.compile("adam", "mse")
        with pytest.raises(ValueError, match="needs targets"):
            model.fit(np.zeros((8, 8), np.float32))

    def test_validation_split_bounds_checked(self):
        model = _model()
        model.compile("adam", "sparse_categorical_crossentropy")
        x = np.zeros((8, 8), np.float32)
        y = np.zeros((8,), np.int32)
        with pytest.raises(ValueError, match="validation_split"):
            model.fit(x, y, validation_split=1.5)

    def test_shuffle_reshuffles_per_epoch_seeded(self):
        from chambers_tpu.models.model import _ArrayBatcher

        x = np.arange(12, dtype=np.float32)[:, None]
        y = np.arange(12, dtype=np.int32)
        b = _ArrayBatcher([x, y], batch_size=4, shuffle=True, seed=7)
        ep1 = np.concatenate([yy for _, yy in b])
        ep2 = np.concatenate([yy for _, yy in b])
        assert sorted(ep1) == list(range(12)) == sorted(ep2)
        assert not np.array_equal(ep1, ep2)  # reshuffled between epochs
        b2 = _ArrayBatcher([x, y], batch_size=4, shuffle=True, seed=7)
        np.testing.assert_array_equal(
            ep1, np.concatenate([yy for _, yy in b2]))  # seeded, reproducible

    def test_evaluate_arrays_matches_iterable_form(self):
        rng = np.random.RandomState(2)
        x = rng.randn(48, 8).astype(np.float32)
        y = rng.randint(0, 4, size=(48,)).astype(np.int32)
        model = _model()
        model.compile("adam", "sparse_categorical_crossentropy",
                      metrics=["accuracy"])
        a = model.evaluate(x, y, batch_size=16, verbose=False,
                           return_dict=True)
        b = model.evaluate([(x[i:i + 16], y[i:i + 16])
                            for i in range(0, 48, 16)], verbose=False,
                           return_dict=True)
        assert a["loss"] == pytest.approx(b["loss"], rel=1e-6)
        assert a["accuracy"] == pytest.approx(b["accuracy"], rel=1e-6)

    def test_sample_weight_array_threads_through(self):
        rng = np.random.RandomState(3)
        x = rng.randn(32, 8).astype(np.float32)
        y = rng.randint(0, 4, size=(32,)).astype(np.int32)
        w = np.zeros((32,), np.float32)
        w[:16] = 1.0
        model = _model()
        model.compile("adam", "sparse_categorical_crossentropy")
        weighted = model.evaluate(x, y, batch_size=32, sample_weight=w,
                                  verbose=False, return_dict=True)
        half = model.evaluate(x[:16], y[:16], batch_size=16, verbose=False,
                              return_dict=True)
        # zero-weighted tail contributes nothing: sum(w*l)/n == half-sum/32
        assert weighted["loss"] == pytest.approx(half["loss"] * 16 / 32,
                                                 rel=1e-5)


class TestArrayFormComposition:
    def test_array_fit_windowed_equals_unwindowed(self):
        """_ArrayBatcher composes with steps_per_execution>1: same seeded
        reshuffle stream, so the window scan must reproduce the per-step
        losses exactly."""
        rng = np.random.RandomState(5)
        x = rng.randn(64, 8).astype(np.float32)
        y = rng.randint(0, 4, size=(64,)).astype(np.int32)

        def run(spe):
            model = _model(seed=3)
            model.compile(optax.sgd(1e-2),
                          "sparse_categorical_crossentropy",
                          metrics=["accuracy"],
                          steps_per_execution=spe)
            return model.fit(x, y, batch_size=16, epochs=2, seed=11,
                             verbose=False)
        h1, h4 = run(1), run(4)
        for a, b in zip(h1, h4):
            assert a["loss"] == pytest.approx(b["loss"], rel=1e-6)
            assert a["accuracy"] == pytest.approx(b["accuracy"], rel=1e-6)

    def test_array_fit_on_dp_mesh(self):
        """Array-form fit through compile(mesh=): batches shard over the
        data axis; loss matches the single-device run exactly."""
        import jax
        from jax.sharding import Mesh

        devs = np.array(jax.devices()[:8])
        rng = np.random.RandomState(6)
        x = rng.randn(64, 8).astype(np.float32)
        y = rng.randint(0, 4, size=(64,)).astype(np.int32)

        def run(mesh):
            model = _model(seed=4)
            model.compile(optax.sgd(1e-2),
                          "sparse_categorical_crossentropy", mesh=mesh)
            return model.fit(x, y, batch_size=16, epochs=1, seed=13,
                             shuffle=False, verbose=False)
        single = run(None)
        with Mesh(devs, ("data",)) as mesh:
            sharded = run(mesh)
        assert single[-1]["loss"] == pytest.approx(
            sharded[-1]["loss"], rel=1e-5)

    def test_validation_data_tuple_of_arrays(self):
        """Keras validation_data=(x_val, y_val) tuple form batches
        unshuffled — equal to passing the batch-iterable form."""
        rng = np.random.RandomState(7)
        x = rng.randn(48, 8).astype(np.float32)
        y = rng.randint(0, 4, size=(48,)).astype(np.int32)
        xv = rng.randn(16, 8).astype(np.float32)
        yv = rng.randint(0, 4, size=(16,)).astype(np.int32)

        def run(val):
            model = _model(seed=8)
            model.compile(optax.sgd(1e-2),
                          "sparse_categorical_crossentropy")
            return model.fit(x, y, batch_size=16, epochs=1, shuffle=False,
                             validation_data=val, verbose=False)
        a = run((xv, yv))
        b = run([(xv, yv)])
        assert a[-1]["val_loss"] == pytest.approx(b[-1]["val_loss"],
                                                  rel=1e-6)


class TestKerasReturnContract:
    def test_evaluate_returns_list_in_compile_order(self):
        """Keras default: evaluate -> [loss, *metrics] (compile order), so
        `loss, acc = model.evaluate(...)` works unchanged."""
        from chambers_tpu import metrics as M

        model = _model()
        model.compile("adam", "sparse_categorical_crossentropy",
                      metrics=["accuracy", M.SparseTopKCategoricalAccuracy(k=2)])
        out = model.evaluate(_data(), verbose=False)
        assert isinstance(out, list) and len(out) == 3
        logs = model.evaluate(_data(), verbose=False, return_dict=True)
        assert out[0] == pytest.approx(logs["loss"])
        assert out[1] == pytest.approx(logs["accuracy"])
        assert out[2] == pytest.approx(
            logs["sparse_top_k_categorical_accuracy"])

    def test_evaluate_returns_scalar_without_metrics(self):
        model = _model()
        model.compile("adam", "sparse_categorical_crossentropy")
        out = model.evaluate(_data(), verbose=False)
        assert np.isscalar(out) or isinstance(out, float)

    def test_predict_uses_compiled_mesh(self):
        """A model compiled with a DP mesh predicts with batches sharded
        over the data axis — outputs identical to single-device."""
        from jax.sharding import Mesh

        rng = np.random.RandomState(9)
        x = rng.randn(32, 8).astype(np.float32)
        model = _model(seed=10)
        single = model.predict(x, batch_size=16)
        devs = np.array(jax.devices()[:8])
        with Mesh(devs, ("data",)) as mesh:
            model.compile("adam", "sparse_categorical_crossentropy",
                          mesh=mesh)
            model._jit_apply = None
            sharded = model.predict(x, batch_size=16)
        np.testing.assert_allclose(single, sharded, atol=1e-6)

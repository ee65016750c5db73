"""ViT/DeiT backbone tests: construction, pooling, presets, weight import."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chambers_tpu.models.backbones.vision_transformer import (
    DistilledVisionTransformer,
    VisionTransformer,
    ViTB16,
    ViTS16,
    DeiTS16,
    WEIGHTS_HASHES,
    _get_model_info,
)


def _small_vit(**kwargs):
    defaults = dict(
        patch_size=8, patch_dim=32, n_encoder_layers=2, n_heads=4, ff_dim=64,
        dropout_rate=0.0,
    )
    defaults.update(kwargs)
    return VisionTransformer(**defaults)


def test_vit_forward_shapes():
    vit = _small_vit(include_top=True, classes=10, pooling="cls")
    x = jnp.zeros((2, 32, 32, 3))
    variables = vit.init(jax.random.PRNGKey(0), x)
    out = vit.apply(variables, x)
    assert out.shape == (2, 10)
    assert out.dtype == jnp.float32


@pytest.mark.parametrize("pooling,expected", [
    ("cls", (2, 32)), ("avg", (2, 32)), ("max", (2, 32)), ("sum", (2, 32)),
    (None, (2, 17, 32)),
])
def test_vit_pooling_variants(pooling, expected):
    vit = _small_vit(include_top=False, pooling=pooling)
    x = jnp.ones((2, 32, 32, 3))
    variables = vit.init(jax.random.PRNGKey(0), x)
    out = vit.apply(variables, x)
    assert out.shape == expected


def test_vit_pooling_math():
    """avg/sum/max pools exclude the CLS token (vision_transformer.py:174-181)."""
    vit_seq = _small_vit(include_top=False, pooling=None)
    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    variables = vit_seq.init(jax.random.PRNGKey(0), jnp.asarray(x))
    seq = np.asarray(vit_seq.apply(variables, jnp.asarray(x)))

    vit_avg = _small_vit(include_top=False, pooling="avg")
    avg = np.asarray(vit_avg.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(avg, seq[:, 1:].mean(1), atol=1e-5)

    vit_cls = _small_vit(include_top=False, pooling="cls")
    cls = np.asarray(vit_cls.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(cls, seq[:, 0], atol=1e-6)


def test_vit_feature_head_is_tanh_bounded():
    vit = _small_vit(include_top=False, feature_dim=16)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    variables = vit.init(jax.random.PRNGKey(0), x)
    out = np.asarray(vit.apply(variables, x))
    assert out.shape == (2, 16)
    assert (np.abs(out) <= 1.0).all()


def test_deit_returns_two_heads():
    deit = DistilledVisionTransformer(
        patch_size=8, patch_dim=32, n_encoder_layers=2, n_heads=4, ff_dim=64,
        dropout_rate=0.0, classes=7, pooling="cls",
    )
    x = jnp.zeros((2, 32, 32, 3))
    variables = deit.init(jax.random.PRNGKey(0), x)
    out = deit.apply(variables, x)
    assert isinstance(out, list) and len(out) == 2
    assert out[0].shape == (2, 7) and out[1].shape == (2, 7)

    deit_avg = DistilledVisionTransformer(
        patch_size=8, patch_dim=32, n_encoder_layers=2, n_heads=4, ff_dim=64,
        dropout_rate=0.0, classes=7, pooling="cls", return_dist_token=False,
    )
    merged = deit_avg.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(merged), (np.asarray(out[0]) + np.asarray(out[1])) / 2, atol=1e-6
    )


def test_vitb16_param_count():
    """ViT-B/16 @224 with top ≈ 86.6M params (the published figure)."""
    model = ViTB16(weights=None, input_shape=(224, 224, 3))
    n = model.count_params()
    assert 86_000_000 < n < 87_000_000, n


def test_gelu_approximate_knob():
    """gelu_approximate=True (tanh GELU, ~15% faster on the VPU) produces
    outputs close to — but not identical with — the erf parity default,
    with the same parameters."""
    import jax.numpy as jnp

    exact = ViTS16(weights=None, input_shape=(224, 224, 3))
    approx = ViTS16(weights=None, input_shape=(224, 224, 3),
                    gelu_approximate=True)
    x = np.random.RandomState(0).rand(2, 224, 224, 3).astype(np.float32)
    out_e = np.asarray(exact.module.apply(exact.variables, jnp.asarray(x),
                                          deterministic=True))
    out_a = np.asarray(approx.module.apply(exact.variables, jnp.asarray(x),
                                           deterministic=True))
    assert not np.array_equal(out_e, out_a)
    np.testing.assert_allclose(out_a, out_e, atol=0.05)


def test_deit_preset_builds():
    model = DeiTS16(weights=None, input_shape=(224, 224, 3))
    out = model(np.zeros((1, 224, 224, 3), np.float32))
    assert out[0].shape == (1, 1000)


def test_preset_input_validation():
    with pytest.raises(ValueError, match="require `input_shape`"):
        ViTS16(weights="imagenet_224_deit", input_shape=(128, 128, 3))
    # unknown spec treated as a file path -> FileNotFoundError
    with pytest.raises(Exception):
        ViTS16(weights="/nonexistent/path.h5", input_shape=(224, 224, 3))


def test_weights_registry_info():
    assert _get_model_info("imagenet21k", "vitb16") == (224, True)
    assert _get_model_info("imagenet21k+_384", "vitb16") == (384, False)
    assert _get_model_info(None, "vitb16") == (224, False)
    assert set(WEIGHTS_HASHES) == {
        "vits16", "vitb16", "vitb32", "vitl16", "vitl32", "deits16", "deitb16"
    }


def test_model_predict_batches():
    model = ViTS16(weights=None, input_shape=(32, 32, 3), classes=5)  # noqa: the preset fixes patch dims
    x = np.random.RandomState(0).randn(5, 32, 32, 3).astype(np.float32)
    out = model.predict(x, batch_size=2)
    assert out.shape == (5, 5)
    direct = np.asarray(model(x))
    np.testing.assert_allclose(out, direct, atol=1e-5)


def test_model_save_load_roundtrip(tmp_path):
    model = _small_vit(include_top=True, classes=3)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    from chambers_tpu.models import Model

    m = Model(model, variables)
    out1 = np.asarray(m(np.asarray(x)))
    path = str(tmp_path / "w.msgpack")
    m.save_weights(path)

    m2 = Model(model, model.init(jax.random.PRNGKey(1), x))
    assert not np.allclose(np.asarray(m2(np.asarray(x))), out1)
    m2.load_weights(path)
    np.testing.assert_allclose(np.asarray(m2(np.asarray(x))), out1, atol=1e-6)


def test_model_summary_groups_and_totals():
    """Keras-style summary: grouped rows, exact total, silent print_fn."""
    import jax

    from chambers_tpu.models import Model

    vit = VisionTransformer(
        patch_size=8, patch_dim=32, n_encoder_layers=2, n_heads=4,
        ff_dim=64, dropout_rate=0.0, classes=10)
    variables = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    model = Model(vit, variables)
    captured = []
    text = model.summary(depth=2, print_fn=captured.append)
    assert captured == [text]
    assert f"Total params: {model.count_params():,}" in text
    assert "encoder/layers_0" in text
    # depth=1 merges the encoder rows
    text1 = model.summary(depth=1, print_fn=lambda s: None)
    assert "encoder/layers_0" not in text1 and "encoder" in text1

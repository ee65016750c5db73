"""Keras-preprocessing-equivalent layer tests + SPP pooling + ScaledAttention."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chambers_tpu.augmentations import (
    CenterCrop,
    RandomContrast,
    RandomCrop,
    RandomFlip,
    RandomHeight,
    RandomRotation,
    RandomTranslation,
    RandomWidth,
    RandomZoom,
    Rescaling,
    Resizing,
)


@pytest.fixture
def batch():
    rng = np.random.RandomState(0)
    return rng.randint(0, 256, (4, 16, 16, 3), np.uint8)


def test_resizing(batch):
    out = Resizing(8, 12)(batch)
    assert out.shape == (4, 8, 12, 3)
    assert out.dtype == jnp.uint8


def test_rescaling(batch):
    out = np.asarray(Rescaling(1 / 255.0)(batch))
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, batch / 255.0, atol=1e-6)


def test_center_crop(batch):
    out = np.asarray(CenterCrop(8, 8)(batch))
    np.testing.assert_array_equal(out, batch[:, 4:12, 4:12])
    with pytest.raises(ValueError):
        CenterCrop(32, 32)(jnp.asarray(batch))


def test_random_crop(batch):
    key = jax.random.PRNGKey(0)
    out = np.asarray(RandomCrop(8, 8)(jnp.asarray(batch), key=key))
    assert out.shape == (4, 8, 8, 3)
    # every crop window must exist somewhere in the source image
    for i in range(4):
        found = any(
            (batch[i, y:y + 8, x:x + 8] == out[i]).all()
            for y in range(9) for x in range(9)
        )
        assert found
    # not training -> center crop
    np.testing.assert_array_equal(
        np.asarray(RandomCrop(8, 8)(jnp.asarray(batch), training=False)),
        batch[:, 4:12, 4:12],
    )


def test_random_flip(batch):
    key = jax.random.PRNGKey(3)
    out = np.asarray(RandomFlip("horizontal")(jnp.asarray(batch), key=key))
    for i in range(4):
        assert (out[i] == batch[i]).all() or (out[i] == batch[i, :, ::-1]).all()
    np.testing.assert_array_equal(
        np.asarray(RandomFlip()(jnp.asarray(batch), training=False)), batch
    )


def test_random_rotation_changes_images(batch):
    out = np.asarray(
        RandomRotation(0.25)(jnp.asarray(batch), key=jax.random.PRNGKey(0))
    )
    assert out.shape == batch.shape
    assert not (out == batch).all()


def test_random_translation_and_zoom(batch):
    key = jax.random.PRNGKey(1)
    out = RandomTranslation(0.3, 0.3)(jnp.asarray(batch), key=key)
    assert out.shape == batch.shape
    out = RandomZoom(0.3)(jnp.asarray(batch), key=key)
    assert out.shape == batch.shape
    # zero-factor zoom is identity (nearest at exact centers)
    out = np.asarray(RandomZoom((0.0, 0.0), interpolation="nearest")(
        jnp.asarray(batch), key=key))
    np.testing.assert_array_equal(out, batch)


def test_random_contrast_preserves_mean(batch):
    key = jax.random.PRNGKey(2)
    x = batch.astype(np.float32)
    out = np.asarray(RandomContrast(0.5)(jnp.asarray(x), key=key))
    np.testing.assert_allclose(
        out.mean(axis=(1, 2)), x.mean(axis=(1, 2)), rtol=1e-3
    )


def test_random_height_width(batch):
    key = jax.random.PRNGKey(4)
    out = RandomHeight((0.5, 0.5))(jnp.asarray(batch), key=key)
    assert out.shape == (4, 24, 16, 3)
    out = RandomWidth((-0.5, -0.5))(jnp.asarray(batch), key=key)
    assert out.shape == (4, 16, 8, 3)


def test_spatial_pyramid_pooling():
    from chambers_tpu.layers import RoiPooling_OG

    x = np.zeros((1, 8, 8, 2), np.float32)
    x[0, 0, 0, 0] = 5.0   # top-left cell
    x[0, 7, 7, 1] = 9.0   # bottom-right cell
    rois = np.array([[[0, 0, 8, 8]]], np.float32)  # full image
    out = np.asarray(RoiPooling_OG(pool_list=[1, 2])([jnp.asarray(x), jnp.asarray(rois)]))
    # output: [1, 1, C * (1 + 4)] = [1, 1, 10]
    assert out.shape == (1, 1, 10)
    level1 = out[0, 0, :2]
    np.testing.assert_array_equal(level1, [5.0, 9.0])
    # level 2: cell (0,0) ch0 = 5; cell (1,1) ch1 = 9
    level2 = out[0, 0, 2:].reshape(2, 2, 2)
    assert level2[0, 0, 0] == 5.0
    assert level2[1, 1, 1] == 9.0
    assert level2[0, 1, 0] == 0.0


def test_scaled_attention_layer():
    from chambers_tpu.layers import ScaledAttention

    rng = np.random.RandomState(0)
    q = rng.randn(2, 4, 5, 8).astype(np.float32)
    v = rng.randn(2, 4, 7, 8).astype(np.float32)
    out = ScaledAttention()( [jnp.asarray(q), jnp.asarray(v)] )
    assert out.shape == (2, 4, 5, 8)
    out_static = ScaledAttention(key_dim=8)([jnp.asarray(q), jnp.asarray(v)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_static), atol=1e-6)

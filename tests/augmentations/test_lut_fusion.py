"""LUT-fused pointwise path must reproduce each op exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from chambers_tpu.augmentations.augmentation_schemes import RandAugment
from chambers_tpu.ops import image_ops


@pytest.fixture
def batch():
    rng = np.random.RandomState(0)
    return rng.randint(0, 256, (3, 12, 12, 3), np.uint8)


LUT_OP_INDICES = {
    0: "AutoContrast", 1: "Equalize", 2: "Invert", 3: "Brightness",
    4: "Contrast", 11: "Posterize", 12: "Solarize", 13: "SolarizeAdd",
}


@pytest.mark.parametrize("op_index", sorted(LUT_OP_INDICES))
def test_lut_matches_direct_op(batch, op_index):
    ra = RandAugment(n_transforms=1, magnitude=10, elementwise=True)
    idx = jnp.full((batch.shape[0],), op_index, jnp.int32)
    fused = np.asarray(ra._apply_lut_ops(jnp.asarray(batch), idx,
                                         jnp.asarray(batch)))
    direct = np.asarray(ra.transforms[op_index](jnp.asarray(batch)))
    np.testing.assert_array_equal(fused, direct)


def test_lut_mixed_selection(batch):
    """Different ops per image in one call."""
    ra = RandAugment(n_transforms=1, magnitude=10, elementwise=True)
    idx = jnp.asarray([2, 12, 5])  # invert, solarize, color (non-LUT)
    marker = jnp.full_like(jnp.asarray(batch), 7)
    fused = np.asarray(ra._apply_lut_ops(jnp.asarray(batch), idx, marker))
    np.testing.assert_array_equal(fused[0], 255 - batch[0])
    np.testing.assert_array_equal(
        fused[1], np.asarray(ra.transforms[12](jnp.asarray(batch)))[1]
    )
    np.testing.assert_array_equal(fused[2], 7)  # non-LUT: untouched


def test_lut_half_magnitude(batch):
    ra = RandAugment(n_transforms=1, magnitude=5, elementwise=True)
    for op_index in (3, 4, 11, 12, 13):
        idx = jnp.full((batch.shape[0],), op_index, jnp.int32)
        fused = np.asarray(ra._apply_lut_ops(jnp.asarray(batch), idx,
                                             jnp.asarray(batch)))
        direct = np.asarray(ra.transforms[op_index](jnp.asarray(batch)))
        np.testing.assert_array_equal(fused, direct)


def test_apply_channel_luts_layout():
    """LUT row order is (image-major, channel-minor)."""
    img = np.zeros((2, 2, 2, 3), np.uint8)
    img[1, :, :, 2] = 10
    luts = np.tile(np.arange(256, dtype=np.uint8), (6, 1))
    luts[5] = 255 - luts[5]  # image 1, channel 2
    out = np.asarray(image_ops.apply_channel_luts(jnp.asarray(img),
                                                  jnp.asarray(luts)))
    np.testing.assert_array_equal(out[0], img[0])
    np.testing.assert_array_equal(out[1, :, :, 2], 245)
    np.testing.assert_array_equal(out[1, :, :, :2], 0)


def test_lut_tables_survive_retrace(batch):
    """Static LUT tables must be trace-independent constants (regression for
    a tracer leak when the same RandAugment was jitted at two shapes)."""
    import jax

    ra = RandAugment(n_transforms=1, magnitude=10, elementwise=True)
    f = jax.jit(lambda im, k: ra(im, key=k))
    out1 = f(jnp.asarray(batch), jax.random.PRNGKey(0))
    bigger = np.concatenate([batch, batch], axis=1)  # new shape -> retrace
    out2 = f(jnp.asarray(bigger), jax.random.PRNGKey(0))
    assert out1.shape == batch.shape and out2.shape == bigger.shape

"""Separable (gather-free) affine warp vs the dense gather warp.

The policy schemes route their per-round warp through
``transform_affine_separable`` (three barrel-shift shear passes). Single-shear
maps — shear-x/y, translate-x/y, identity — must match the gather warp
bit-for-bit; rotation is allowed per-pass-rounding divergence of at most one
source pixel (asserted via a smooth image bound and a mismatch-rate cap).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chambers_tpu.ops import image_ops


def _rand_img(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 256, size=shape, dtype=np.uint8))


def _assert_match_except_ties(img, mats, want, got):
    """Exact match except where the source coordinate sits within float noise
    of a nearest-rounding boundary (k + 0.5). At such ties XLA's FMA
    contraction in the dense gather and the per-row shift of the separable
    path can legitimately round to adjacent sources (e.g. 0.3*25 == 7.5);
    both are valid nearest picks of the same float32 transform."""
    b, h, w, _ = img.shape
    t = np.asarray(mats, np.float64)
    x = np.arange(w)[None, None, :]
    y = np.arange(h)[None, :, None]
    sx = t[:, 0, None, None] * x + t[:, 1, None, None] * y + t[:, 2, None, None]
    sy = t[:, 3, None, None] * x + t[:, 4, None, None] * y + t[:, 5, None, None]

    def near_tie(s):
        f = s + 0.5
        return np.abs(f - np.round(f)) < 1e-4

    tie = (near_tie(sx) | near_tie(sy))[..., None]
    mismatch = np.asarray(want) != np.asarray(got)
    bad = mismatch & ~np.broadcast_to(tie, mismatch.shape)
    assert not bad.any(), np.argwhere(bad)[:10]


def _smooth_img(b, h, w, c):
    y = np.linspace(0, 200, h)[None, :, None, None]
    x = np.linspace(0, 55, w)[None, None, :, None]
    img = (y + x) % 256
    return jnp.asarray(np.broadcast_to(img, (b, h, w, c)).astype(np.uint8))


@pytest.mark.parametrize("level", [0.3, -0.3, 0.17, 0.0])
def test_shear_x_exact(level):
    img = _rand_img((3, 41, 57, 3), seed=1)
    mats = image_ops.shear_x_matrices(jnp.full((3,), level))
    want = image_ops.transform(img, mats, "nearest", 128)
    got = image_ops.transform_affine_separable(img, mats, 128)
    _assert_match_except_ties(img, mats, want, got)


@pytest.mark.parametrize("level", [0.3, -0.22])
def test_shear_y_exact(level):
    img = _rand_img((2, 50, 36, 3), seed=2)
    mats = image_ops.shear_y_matrices(jnp.full((2,), level))
    want = image_ops.transform(img, mats, "nearest", 128)
    got = image_ops.transform_affine_separable(img, mats, 128)
    _assert_match_except_ties(img, mats, want, got)


@pytest.mark.parametrize("px", [100.0, -100.0, 33.7, 0.0])
@pytest.mark.parametrize("axis", ["x", "y"])
def test_translate_exact(px, axis):
    img = _rand_img((2, 64, 48, 3), seed=3)
    builder = (image_ops.translate_x_matrices if axis == "x"
               else image_ops.translate_y_matrices)
    mats = builder(jnp.full((2,), px))
    want = image_ops.transform(img, mats, "nearest", 128)
    got = image_ops.transform_affine_separable(img, mats, 128)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_identity_exact():
    img = _rand_img((2, 30, 30, 1), seed=4)
    mats = image_ops.identity_matrices(2)
    got = image_ops.transform_affine_separable(img, mats, 128)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(got))


def test_mixed_batch_matches_per_image():
    """Per-image matrices: each image must see only its own transform."""
    img = _rand_img((4, 40, 40, 3), seed=5)
    mats = jnp.concatenate([
        image_ops.identity_matrices(1),
        image_ops.shear_x_matrices(jnp.asarray([0.25])),
        image_ops.translate_y_matrices(jnp.asarray([-17.0])),
        image_ops.shear_y_matrices(jnp.asarray([-0.3])),
    ])
    got = image_ops.transform_affine_separable(img, mats, 128)
    for i in range(4):
        want_i = image_ops.transform(img[i:i + 1], mats[i:i + 1],
                                     "nearest", 128)
        _assert_match_except_ties(img[i:i + 1], mats[i:i + 1],
                                  want_i, got[i:i + 1])


@pytest.mark.parametrize("deg", [0.0, 5.0, 15.0, 30.0, -30.0])
def test_rotate_within_one_pixel(deg):
    """Rotation rounds per pass: every output pixel must equal the dense
    nearest warp up to a one-pixel source displacement. On a smooth gradient
    image (max |grad| ~5/px along either axis) that bounds |diff| tightly;
    fill-boundary pixels may swap with content so we bound their count."""
    h = w = 64
    img = _smooth_img(2, h, w, 3)
    rad = deg * np.pi / 180.0
    mats = image_ops.rotation_matrices(jnp.full((2,), rad), h, w)
    want = np.asarray(image_ops.transform(img, mats, "nearest", 128)
                      ).astype(np.int32)
    got = np.asarray(image_ops.transform_affine_separable(img, mats, 128)
                     ).astype(np.int32)
    if deg == 0.0:
        np.testing.assert_array_equal(want, got)
        return
    diff = np.abs(want - got)
    interior = diff[diff <= 16]  # <=1px displacement on the gradient
    boundary_frac = (diff > 16).mean()
    assert boundary_frac < 0.06, boundary_frac
    assert (interior <= 16).all()


def test_rotate_90_multiple_is_near_exact():
    """At 90 deg about the center of a square image the 3-shear composite is
    the same integer permutation wherever intermediates stay in frame."""
    img = _rand_img((1, 33, 33, 1), seed=6)
    mats = image_ops.rotation_matrices(jnp.asarray([np.pi / 2]), 33, 33)
    want = np.asarray(image_ops.transform(img, mats, "nearest", 128))
    # 90 deg shears need tan(45 deg)=1 excursions: pad generously
    got = np.asarray(
        image_ops.transform_affine_separable(img, mats, 128, pad=40))
    assert (want == got).mean() > 0.95


def test_decompose_affine_shears_recomposes():
    rng = np.random.default_rng(7)
    degs = rng.uniform(-30, 30, size=8)
    mats = image_ops.rotation_matrices(jnp.asarray(np.deg2rad(degs)), 224, 224)
    A1, B1, A2, B2, A3, B3 = map(np.asarray,
                                 image_ops.decompose_affine_shears(mats))
    t = np.asarray(mats)
    # recompose: source_x/y from the three-shear cascade
    a0 = 1 + A1 * A2
    a1 = a0 * A3 + A1
    a2 = a0 * B3 + A1 * B2 + B1
    b0 = A2
    b1 = 1 + A2 * A3
    b2 = A2 * B3 + B2
    np.testing.assert_allclose(
        np.stack([a0, a1, a2, b0, b1, b2], 1), t[:, :6], rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("deg", [45.0, -45.0])
def test_policy_warp_pad_covers_large_magnitudes(deg):
    """RandAugment(magnitude=15) rotates up to 45°, whose shear excursions
    exceed the 30° default pad — _policy_warp must size the pad from the
    caller's actual rotation cap so intermediates aren't clipped to fill."""
    from chambers_tpu.augmentations.augmentation_schemes import _policy_warp

    h = w = 64
    img = _smooth_img(2, h, w, 3)
    rad = deg * np.pi / 180.0
    mats = image_ops.rotation_matrices(jnp.full((2,), rad), h, w)
    want = np.asarray(image_ops.transform(img, mats, "nearest", 128)
                      ).astype(np.int32)
    got = np.asarray(_policy_warp(img, mats, max_rotation_rad=abs(rad))
                     ).astype(np.int32)
    # same ±1px-source bound as test_rotate_within_one_pixel — in particular
    # no band of clipped-to-fill content from undersized padding
    diff = np.abs(want - got)
    boundary_frac = (diff > 16).mean()
    assert boundary_frac < 0.06, boundary_frac
    # and the amount of surviving (non-fill) content matches the dense warp
    want_fill = (np.asarray(want) == 128).mean()
    got_fill = (np.asarray(got) == 128).mean()
    assert abs(want_fill - got_fill) < 0.03, (want_fill, got_fill)


def test_policy_warp_used_by_randaugment_still_valid_uint8():
    from chambers_tpu.augmentations.augmentation_schemes import RandAugment

    img = _rand_img((4, 32, 32, 3), seed=8)
    ra = RandAugment(n_transforms=2, magnitude=10, elementwise=True)
    out = ra(img, key=jax.random.PRNGKey(0), training=True)
    assert out.shape == img.shape and out.dtype == jnp.uint8

"""The Pallas VMEM-resident warp must be bit-identical to the XLA
separable path (`image_ops.transform_affine_separable`) — same stage order,
same masks, same fill semantics. On TPU the dispatch in
transform_affine_separable takes the kernel automatically; here the kernel
runs in interpret mode against the XLA path on identical inputs."""

import numpy as np
import jax.numpy as jnp
import pytest

from chambers_tpu.ops import image_ops
from chambers_tpu.ops.warp_pallas import transform_affine_separable_pallas


def _random_det1_mats(rng, h, w, n):
    mats = [np.asarray(image_ops.identity_matrices(1))[0]]
    for i in range(n - 1):
        kind = i % 4
        if kind == 0:
            m = image_ops.rotation_matrices(
                np.float32(rng.uniform(-0.5, 0.5)), h, w)
        elif kind == 1:
            m = image_ops.shear_x_matrices(np.float32(rng.uniform(-0.3, 0.3)))
        elif kind == 2:
            m = image_ops.shear_y_matrices(np.float32(rng.uniform(-0.3, 0.3)))
        else:
            m = image_ops.translate_x_matrices(
                np.float32(rng.uniform(-20, 20)))
        mats.append(np.asarray(m)[0])
    return np.stack(mats)


@pytest.mark.parametrize("h,w,pad", [(64, 64, 11), (48, 80, 9)])
def test_pallas_warp_bit_identical(h, w, pad):
    rng = np.random.RandomState(0)
    b, c = 6, 3
    imgs = rng.randint(0, 256, (b, h, w, c), dtype=np.uint8)
    mats = _random_det1_mats(rng, h, w, b)

    want = image_ops.transform_affine_separable(
        imgs, mats, fill_value=128, pad=pad)
    got = transform_affine_separable_pallas(
        imgs, mats, fill_value=128, pad=pad, interpret=True)
    assert bool(jnp.all(want == got)), int(jnp.sum(want != got))


def test_pallas_warp_fill_value_and_identity():
    rng = np.random.RandomState(1)
    b, h, w, c = 2, 32, 32, 3
    imgs = rng.randint(0, 256, (b, h, w, c), dtype=np.uint8)
    # identity transform must return the input exactly, any fill
    mats = np.asarray(image_ops.identity_matrices(b))
    got = transform_affine_separable_pallas(
        imgs, mats, fill_value=0, pad=5, interpret=True)
    assert bool(jnp.all(got == imgs))
    # large translate pushes everything out: all fill
    mats = np.asarray(image_ops.translate_x_matrices(np.full(b, 1000.0)))
    got = transform_affine_separable_pallas(
        imgs, mats, fill_value=77, pad=5, interpret=True)
    assert bool(jnp.all(got == 77))


def test_pallas_warp_fill_cast_matches_xla_path():
    """Out-of-range / numpy-scalar fills resolve through the same dtype
    conversion as the XLA path's `jnp.asarray(fill_value, uint8)` instead
    of raising only on the kernel path."""
    rng = np.random.RandomState(3)
    b, h, w, c = 2, 32, 32, 3
    imgs = rng.randint(0, 256, (b, h, w, c), dtype=np.uint8)
    mats = np.asarray(image_ops.translate_x_matrices(np.full(b, 1000.0)))
    for fill in (np.float32(7.0), np.uint8(9), np.float32(300.5)):
        want = image_ops.transform_affine_separable(
            imgs, mats, fill_value=fill, pad=5)
        got = transform_affine_separable_pallas(
            imgs, mats, fill_value=fill, pad=5, interpret=True)
        assert bool(jnp.all(want == got)), fill
    # out-of-range Python scalars raise the same OverflowError on BOTH
    # paths (jax's weakly-typed scalar check) — no backend divergence
    with pytest.raises(OverflowError):
        image_ops.transform_affine_separable(
            imgs, mats, fill_value=256.5, pad=5)
    with pytest.raises(OverflowError):
        transform_affine_separable_pallas(
            imgs, mats, fill_value=256.5, pad=5, interpret=True)


def test_fused_round_kernel_matches_masked_composition():
    """The per-image-dispatch round kernel (each image computes only its
    sampled op) must be bit-identical to the masked compute-all composition,
    including the PRNG stream (CutOut centers derive from the same key
    split). Seeds 0+1 deterministically draw all 16 op classes at batch 16
    (verified by replaying the key splits), so two seeds give full op
    coverage at half the interpret-mode cost of the original four."""
    import jax

    from chambers_tpu.augmentations.augmentation_schemes import RandAugment

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 256, (16, 64, 64, 3), dtype=np.uint8))

    # magnitude 9 is adversarial for blend rounding: float32(1.72)·(−75)
    # rounds to exactly −129.0 as a separate multiply but not as an FMA —
    # the case the contraction pin in blend/the kernel exists for
    for magnitude in (10, 9):
        for seed in range(2):
            key = jax.random.PRNGKey(seed)
            aug = RandAugment(n_transforms=2, magnitude=magnitude,
                              elementwise=True)
            aug.fused_round_kernel = False
            want = aug(imgs, key=key)
            aug_k = RandAugment(n_transforms=2, magnitude=magnitude,
                                elementwise=True)
            aug_k.fused_round_kernel = True  # interpret mode on CPU
            got = aug_k(imgs, key=key)
            diff = int(jnp.sum(want != got))
            assert diff == 0, (magnitude, seed, diff)


def test_fused_round_kernel_zero_magnitude():
    """magnitude=0: CutOut has mask_size 0 (identity contract) and every
    geometry magnitude is 0 — kernel and composition must still agree."""
    import jax

    from chambers_tpu.augmentations.augmentation_schemes import RandAugment

    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randint(0, 256, (8, 32, 32, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(7)
    aug = RandAugment(n_transforms=2, magnitude=0, elementwise=True)
    aug.fused_round_kernel = False
    want = aug(imgs, key=key)
    aug_k = RandAugment(n_transforms=2, magnitude=0, elementwise=True)
    aug_k.fused_round_kernel = True
    got = aug_k(imgs, key=key)
    assert bool(jnp.all(want == got))


def test_autoaugment_fused_stage_matches_masked_composition():
    """AutoAugment's per-image stage through the dispatch kernel (warp /
    per-image-factor Color / passthrough, chance gate folded into the
    class) must be bit-identical to the masked compute-all composition.
    Seeds {0, 5, 6} deterministically draw every one of the V0 table's 33
    op specs at batch 16 (verified by replaying the policy/stage key
    splits), so three seeds give full coverage at half the interpret-mode
    cost of the original six."""
    import jax

    from chambers_tpu.augmentations.augmentation_schemes import AutoAugment

    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randint(0, 256, (16, 64, 64, 3), dtype=np.uint8))

    for seed in (0, 5, 6):
        key = jax.random.PRNGKey(seed)
        aug = AutoAugment(elementwise=True)
        aug.fused_round_kernel = False
        want = aug(imgs, key=key)
        aug_k = AutoAugment(elementwise=True)
        aug_k.fused_round_kernel = True  # interpret mode on CPU
        got = aug_k(imgs, key=key)
        diff = int(jnp.sum(want != got))
        assert diff == 0, (seed, diff)


def test_fused_round_vmem_gate():
    """The auto-dispatch gate must admit 224px and 384px (both proven to
    compile and run on-chip with the row-chunked pointwise branches) and
    reject sizes whose WARP-branch u8 working set alone approaches the
    16 MB scoped-VMEM stack."""
    from chambers_tpu.augmentations.augmentation_schemes import (
        _fused_round_fits_vmem,
    )

    assert _fused_round_fits_vmem(jnp.zeros((2, 224, 224, 3), jnp.uint8))
    assert _fused_round_fits_vmem(jnp.zeros((2, 384, 384, 3), jnp.uint8))
    assert not _fused_round_fits_vmem(jnp.zeros((2, 768, 768, 3), jnp.uint8))


def test_fused_round_kernel_row_chunked_branches():
    """COLOR and SHARPNESS strip-mine f32 temporaries over 128-row chunks
    (the whole-image formulation busts scoped VMEM at 384px); at h > 128
    the multi-chunk path — including sharpness's ±1-row halo across the
    chunk seam — must stay bit-identical to the image_ops reference ops."""
    import jax

    from chambers_tpu.ops import warp_pallas as wpk

    rng = np.random.RandomState(7)
    b, h, w = 5, 160, 96  # two chunks: rows [0,128) and [128,160)
    imgs = jnp.asarray(rng.randint(0, 256, (b, h, w, 3), dtype=np.uint8))
    ident = jnp.broadcast_to(jnp.asarray(image_ops.identity_matrices(1))[0],
                             (b, 8))
    zeros = jnp.zeros((b,), jnp.int32)

    # force the strip-mined path (small images normally compile whole-image)
    budget = wpk._POINTWISE_WHOLE_IMAGE_BUDGET
    wpk._POINTWISE_WHOLE_IMAGE_BUDGET = 0
    try:
        for cls, want_fn in (
            (wpk.COLOR, lambda x: image_ops.color(x, 1.72)),
            (wpk.SHARPNESS, lambda x: image_ops.sharpness(x, 1.72)),
        ):
            got = wpk.fused_round_pallas(
                imgs, ident, jnp.full((b,), cls, jnp.int32), zeros, zeros,
                fill_value=128, pad=4, color_factor=1.72, sharp_factor=1.72,
                cut_half=0, cut_fill=0, interpret=True,
            )
            want = want_fn(imgs)
            assert int(jnp.sum(want != got)) == 0, cls
    finally:
        wpk._POINTWISE_WHOLE_IMAGE_BUDGET = budget

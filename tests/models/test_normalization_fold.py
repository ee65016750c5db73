"""Exactness of fold_imagenet_normalization.

The fold absorbs ``ImageNetNormalization`` (all three ``preprocess_input``
modes — /root/reference/chambers/augmentations/image_augmentations.py:621-682)
into the ViT patch-embed conv so the model consumes raw [0, 255] pixels.
Because the patch embedding is a non-overlapping VALID conv, the fold is
algebraically exact: these tests pin ≤1e-6 relative error in float32 and a
bfloat16-rounding-sized envelope in the bf16 mixed-precision pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chambers_tpu.augmentations import ImageNetNormalization
from chambers_tpu.models.backbones import (
    VisionTransformer,
    fold_imagenet_normalization,
)
from chambers_tpu.models.backbones.vision_transformer import (
    DistilledVisionTransformer,
)


def _tiny_vit(**kw):
    return VisionTransformer(
        patch_size=8, patch_dim=32, n_encoder_layers=2, n_heads=4,
        ff_dim=64, dropout_rate=0.0, include_top=True, classes=7,
        classifier_activation=None, pooling="cls", **kw,
    )


def _uint8_batch(seed=0, b=4, size=32):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (b, size, size, 3), np.uint8)


@pytest.mark.parametrize("mode", ["tf", "torch", "caffe"])
def test_fold_matches_unfused_fp32(mode):
    """fp32: folded(raw uint8) == model(normalize(uint8)) to ≤1e-6 rel."""
    vit = _tiny_vit()
    x8 = _uint8_batch()
    variables = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    ref = vit.apply(variables, ImageNetNormalization(mode=mode)(x8),
                    deterministic=True)
    folded = fold_imagenet_normalization(variables, mode=mode)
    out = vit.apply(folded, jnp.asarray(x8, jnp.float32), deterministic=True)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize("mode", ["tf", "torch", "caffe"])
def test_fold_patch_tokens_exact(mode):
    """The conv output itself (pre-encoder) matches to fp32 roundoff —
    isolates the fold algebra from encoder error accumulation."""
    vit = _tiny_vit()
    x8 = _uint8_batch(seed=1)
    variables = vit.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))

    def patches(v, x):
        from flax import linen as nn

        conv = nn.Conv(features=32, kernel_size=(8, 8), strides=(8, 8),
                       padding="VALID")
        return conv.apply({"params": v["params"]["patch_embeddings"]}, x)

    ref = patches(variables, ImageNetNormalization(mode=mode)(x8))
    folded = fold_imagenet_normalization(variables, mode=mode)
    out = patches(folded, jnp.asarray(x8, jnp.float32))
    # atol covers fp32 cancellation roundoff: the folded path's partial sums
    # run at O(|W|·255) before the bias correction lands (caffe's ~120-count
    # means make this the worst case); a few fp32 ulps of that magnitude.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=5e-3)


def test_fold_bf16_pipeline_close():
    """bf16 compute (the bench configuration): the folded pipeline on raw
    uint8 stays within bf16 rounding of the unfused normalize+cast path."""
    vit = _tiny_vit(dtype=jnp.bfloat16)
    x8 = _uint8_batch(seed=2)
    variables = vit.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)))

    ref = np.asarray(vit.apply(variables, ImageNetNormalization(mode="tf")(x8),
                               deterministic=True), np.float32)
    folded = fold_imagenet_normalization(variables, mode="tf")
    out = np.asarray(vit.apply(folded, jnp.asarray(x8), deterministic=True),
                     np.float32)
    # bf16 has ~2-3 decimal digits; logits are O(1) here, so a bf16-rounding
    # envelope of ~0.1 absolute is the expected noise floor
    np.testing.assert_allclose(out, ref, rtol=0.1, atol=0.1)
    assert np.abs(out - ref).max() < 0.1


def test_fold_deit_and_unmutated_input():
    """Works on DistilledVisionTransformer; the input pytree is unchanged."""
    deit = DistilledVisionTransformer(
        patch_size=8, patch_dim=32, n_encoder_layers=1, n_heads=4,
        ff_dim=64, dropout_rate=0.0, include_top=True, classes=5,
        classifier_activation=None, return_dist_token=False, pooling="cls",
    )
    x8 = _uint8_batch(seed=3)
    variables = deit.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)))
    before = jax.tree.map(np.asarray, variables)

    folded = fold_imagenet_normalization(variables, mode="tf")
    ref = deit.apply(variables, ImageNetNormalization(mode="tf")(x8),
                     deterministic=True)
    out = deit.apply(folded, jnp.asarray(x8, jnp.float32),
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        before, variables)  # no in-place mutation


def test_fold_rejects_non_vit_trees():
    with pytest.raises(ValueError, match="patch_embeddings"):
        fold_imagenet_normalization({"params": {"dense": {}}})
    with pytest.raises(ValueError, match="Unknown mode"):
        fold_imagenet_normalization(
            {"params": {"patch_embeddings": {}}}, mode="keras")

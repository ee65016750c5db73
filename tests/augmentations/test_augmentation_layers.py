"""Augmentation layer / policy tests.

ImageNetNormalization golden values and ResizingMinMax shapes replicate the
reference's own golden tests
(test_units/augmentations/test_image_augmentations.py:21-80).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chambers_tpu import augmentations
from chambers_tpu.augmentations import (
    AutoAugment,
    ImageNetNormalization,
    RandAugment,
    RandomChance,
    RandomChoice,
    ResizingMinMax,
)

# The reference's 4x4 golden image (test_image_augmentations.py:5-15)
IMG = np.array(
    [
        [139, 186, 208, 200],
        [175, 201, 198, 200],
        [166, 191, 193, 195],
        [124, 155, 172, 151],
    ],
    np.uint8,
)
IMG = np.stack([IMG, IMG, IMG], axis=-1)[None]  # [1, 4, 4, 3]
IMG_NOT_SQUARE = IMG[:, :, :3, :]


def test_imagenet_normalization_caffe():
    target = np.array(
        [
            [35.060997, 82.061, 104.061, 96.061],
            [71.061, 97.061, 94.061, 96.061],
            [62.060997, 87.061, 89.061, 91.061],
            [20.060997, 51.060997, 68.061, 47.060997],
        ],
        np.float32,
    )
    x = np.asarray(ImageNetNormalization(mode="caffe")(IMG))[0, ..., 0]
    np.testing.assert_array_equal(x, target)


def test_imagenet_normalization_tf():
    target = np.array(
        [
            [0.0901961327, 0.458823562, 0.631372571, 0.568627477],
            [0.372549057, 0.576470613, 0.552941203, 0.568627477],
            [0.301960826, 0.498039246, 0.513725519, 0.529411793],
            [-0.0274509788, 0.215686321, 0.349019647, 0.184313774],
        ],
        np.float32,
    )
    x = np.asarray(ImageNetNormalization(mode="tf")(IMG))[0, ..., 0]
    np.testing.assert_array_equal(x, target)


def test_imagenet_normalization_torch():
    target = np.array(
        [
            [0.262436897, 1.06730032, 1.44404483, 1.30704677],
            [0.878928, 1.32417154, 1.27279735, 1.30704677],
            [0.724805236, 1.15292406, 1.1871736, 1.22142303],
            [0.00556548592, 0.536432922, 0.827553749, 0.467933923],
        ],
        np.float32,
    )
    x = np.asarray(ImageNetNormalization(mode="torch")(IMG))[0, ..., 0]
    np.testing.assert_allclose(x, target, atol=1e-6)


def test_imagenet_normalization_unknown_mode():
    with pytest.raises(ValueError, match="Unknown mode"):
        ImageNetNormalization(mode="bogus")


def test_resizing_min_max_shapes():
    assert ResizingMinMax(min_side=100)(IMG_NOT_SQUARE).shape == (1, 133, 100, 3)
    assert ResizingMinMax(max_side=100)(IMG_NOT_SQUARE).shape == (1, 100, 75, 3)
    assert ResizingMinMax(min_side=100, max_side=100)(IMG_NOT_SQUARE).shape == (1, 100, 75, 3)
    assert ResizingMinMax(min_side=100, max_side=50)(IMG_NOT_SQUARE).shape == (1, 50, 37, 3)
    with pytest.raises(ValueError):
        ResizingMinMax()


@pytest.fixture
def batch():
    rng = np.random.RandomState(0)
    return rng.randint(0, 256, (4, 16, 16, 3), np.uint8)


def test_random_chance_extremes(batch):
    key = jax.random.PRNGKey(0)
    invert = augmentations.Invert()
    always = RandomChance(invert, 1.0)
    never = RandomChance(invert, 0.0)
    np.testing.assert_array_equal(np.asarray(always(batch, key=key)), 255 - batch)
    np.testing.assert_array_equal(np.asarray(never(batch, key=key)), batch)


def test_random_chance_elementwise_mixes(batch):
    invert = augmentations.Invert()
    chance = RandomChance(invert, 0.5, elementwise=True)
    out = np.asarray(chance(batch, key=jax.random.PRNGKey(3)))
    per_image_inverted = [
        (out[i] == 255 - batch[i]).all() or (out[i] == batch[i]).all()
        for i in range(len(batch))
    ]
    assert all(per_image_inverted)


def test_random_choice_applies_one_of(batch):
    transforms = [augmentations.Invert(), augmentations.Solarize(0)]
    choice = RandomChoice(transforms, n_transforms=1)
    out = np.asarray(choice(batch, key=jax.random.PRNGKey(0)))
    # Solarize(0) == invert for all pixels >= 0... except pixels < 0 impossible
    # so both branches give 255 - x here; check exactly that
    np.testing.assert_array_equal(out, 255 - batch)


def test_random_choice_elementwise_per_image(batch):
    transforms = [augmentations.Invert(), _Identity()]
    choice = RandomChoice(transforms, n_transforms=1, elementwise=True)
    out = np.asarray(choice(batch, key=jax.random.PRNGKey(1)))
    for i in range(len(batch)):
        assert (out[i] == batch[i]).all() or (out[i] == 255 - batch[i]).all()


class _Identity(augmentations.image_augmentations.ImageAugmentation):
    def __call__(self, images, key=None, training=True):
        return images


def test_randaugment_shapes_and_dtype(batch):
    ra = RandAugment(n_transforms=2, magnitude=10)
    out = ra(batch, key=jax.random.PRNGKey(0))
    assert out.shape == batch.shape
    assert out.dtype == jnp.uint8


def test_randaugment_not_training_is_identity(batch):
    ra = RandAugment(n_transforms=2, magnitude=10)
    out = np.asarray(ra(batch, key=None, training=False))
    np.testing.assert_array_equal(out, batch)


def test_randaugment_requires_key(batch):
    ra = RandAugment(n_transforms=1, magnitude=5)
    with pytest.raises(ValueError, match="requires a PRNG"):
        ra(batch)


def test_randaugment_deterministic_given_key(batch):
    ra = RandAugment(n_transforms=2, magnitude=10)
    out1 = np.asarray(ra(batch, key=jax.random.PRNGKey(7)))
    out2 = np.asarray(ra(batch, key=jax.random.PRNGKey(7)))
    np.testing.assert_array_equal(out1, out2)
    out3 = np.asarray(ra(batch, key=jax.random.PRNGKey(8)))
    assert not (out1 == out3).all()


def test_randaugment_batch_mode(batch):
    ra = RandAugment(n_transforms=1, magnitude=10, elementwise=False)
    out = np.asarray(ra(batch, key=jax.random.PRNGKey(0)))
    assert out.shape == batch.shape


def test_randaugment_jits(batch):
    ra = RandAugment(n_transforms=2, magnitude=10)
    fn = jax.jit(lambda imgs, key: ra(imgs, key=key))
    out = np.asarray(fn(jnp.asarray(batch), jax.random.PRNGKey(0)))
    assert out.shape == batch.shape


def test_autoaugment_policy_table():
    aa = AutoAugment()
    assert len(aa.policies) == 25
    # dedup: far fewer unique op instances than 50
    assert len(aa._ops) < 40


def test_autoaugment_applies(batch):
    aa = AutoAugment()
    out = np.asarray(aa(batch, key=jax.random.PRNGKey(0)))
    assert out.shape == batch.shape
    np.testing.assert_array_equal(
        np.asarray(aa(batch, key=None, training=False)), batch
    )


def test_autoaugment_elementwise_matches_golden():
    """The fused LUT/shared-Color rewrite of the elementwise path must be
    bit-identical to the original one-pass-per-op implementation (golden
    outputs captured from it at the same PRNG keys)."""
    import os

    path = os.path.join(os.path.dirname(__file__),
                        "golden_autoaugment_elementwise.npz")
    data = np.load(path)
    aa = AutoAugment(elementwise=True)
    for seed in (0, 1, 7):
        out = np.asarray(
            aa(jnp.asarray(data["batch"]), key=jax.random.PRNGKey(seed))
        )
        np.testing.assert_array_equal(out, data[f"seed{seed}"])


def test_autoaugment_batch_mode(batch):
    aa = AutoAugment(elementwise=False)
    out = np.asarray(aa(batch, key=jax.random.PRNGKey(0)))
    assert out.shape == batch.shape


def test_autoaugment_jits(batch):
    aa = AutoAugment()
    fn = jax.jit(lambda imgs, key: aa(imgs, key=key))
    out = np.asarray(fn(jnp.asarray(batch), jax.random.PRNGKey(0)))
    assert out.shape == batch.shape


def test_magnitude_translators():
    from chambers_tpu.augmentations import augmentation_schemes as s

    assert s._magnitude_to_enhance_kwargs(10)["factor"] == pytest.approx(1.9)
    assert s._magnitude_to_enhance_kwargs(0) == {"factor": 0.1}
    assert s._magnitude_to_shear_kwargs(10)["level"] == 0.3
    assert s._magnitude_to_translate_kwargs(5)["pixels"] == 50.0
    assert s._magnitude_to_posterize_kwargs(10) == {"bits": 4}
    assert s._magnitude_to_solarize_kwargs(5) == {"threshold": 128}
    assert s._magnitude_to_solarizeadd_kwargs(10) == {"addition": 110}
    assert s._magnitude_to_rotate_kwargs(10)["degrees"] == 30.0
    assert s._magnitude_to_cutout_kwargs(5)["mask_size"] == 40
    assert s._magnitude_to_cutout_kwargs(5)["constant_values"] == 128

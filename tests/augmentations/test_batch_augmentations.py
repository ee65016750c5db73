"""MixUp / CutMix: exact mixing math, label-pixel consistency, jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chambers_tpu.augmentations import CutMix, MixUp, mixup_or_cutmix


@pytest.fixture
def batch():
    rng = np.random.RandomState(0)
    images = rng.rand(8, 16, 16, 3).astype(np.float32)
    labels = rng.randint(0, 5, 8)
    return jnp.asarray(images), jnp.asarray(labels)


class TestMixUp:
    def test_exact_convex_combination(self, batch):
        images, labels = batch
        op = MixUp(alpha=0.4, num_classes=5)
        key = jax.random.PRNGKey(1)
        mixed, y = op(images, labels, key)
        lam = float(jax.random.beta(key, 0.4, 0.4, ()))
        np.testing.assert_allclose(
            np.asarray(mixed),
            lam * np.asarray(images) + (1 - lam) * np.asarray(images[::-1]),
            atol=1e-6)
        one_hot = np.eye(5)[np.asarray(labels)]
        np.testing.assert_allclose(
            np.asarray(y), lam * one_hot + (1 - lam) * one_hot[::-1],
            atol=1e-6)

    def test_labels_sum_to_one_and_smoothing(self, batch):
        images, labels = batch
        op = MixUp(alpha=0.2, num_classes=5, label_smoothing=0.1)
        _, y = op(images, labels, jax.random.PRNGKey(2))
        np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, atol=1e-6)
        assert np.asarray(y).min() >= 0.1 / 5 - 1e-6

    def test_per_example_lambdas_differ(self, batch):
        images, labels = batch
        op = MixUp(alpha=0.2, num_classes=5, per_example=True)
        mixed, y = op(images, labels, jax.random.PRNGKey(3))
        # recover per-image lambda from the labels of distinct-class pairs
        one_hot = np.eye(5)[np.asarray(labels)]
        lam = np.asarray(y)[np.arange(8), np.asarray(labels)]
        assert len(np.unique(np.round(lam, 4))) > 1

    def test_uint8_roundtrip_and_eval_mode(self, batch):
        images, labels = batch
        u8 = (np.asarray(images) * 255).astype(np.uint8)
        op = MixUp(alpha=0.2, num_classes=5)
        mixed, _ = op(jnp.asarray(u8), labels, jax.random.PRNGKey(4))
        assert mixed.dtype == jnp.uint8
        x, y = op(jnp.asarray(u8), labels, jax.random.PRNGKey(4),
                  training=False)
        np.testing.assert_array_equal(np.asarray(x), u8)
        np.testing.assert_allclose(np.asarray(y), np.eye(5)[np.asarray(labels)])

    def test_soft_labels_pass_through(self, batch):
        images, _ = batch
        soft = jnp.full((8, 5), 0.2)
        _, y = MixUp(alpha=0.2)(images, soft, jax.random.PRNGKey(5))
        np.testing.assert_allclose(np.asarray(y), 0.2, atol=1e-6)

    def test_int_labels_without_classes_raise(self, batch):
        images, labels = batch
        with pytest.raises(ValueError, match="num_classes"):
            MixUp(alpha=0.2)(images, labels, jax.random.PRNGKey(0))


class TestCutMix:
    def test_label_weight_matches_pixel_fraction(self, batch):
        images, labels = batch
        op = CutMix(alpha=1.0, num_classes=5)
        mixed, y = op(images, labels, jax.random.PRNGKey(7))
        mixed, images_np = np.asarray(mixed), np.asarray(images)
        flipped = images_np[::-1]
        from_flip = np.all(mixed == flipped, axis=-1) & ~np.all(
            flipped == images_np, axis=-1)
        # fraction of pasted pixels (image 0 vs its partner differs a.e.)
        frac = from_flip[0].mean()
        one_hot = np.eye(5)[np.asarray(labels)]
        # labels must equal lam*y + (1-lam)*flip(y) with lam = 1 - frac
        want = (1 - frac) * one_hot + frac * one_hot[::-1]
        np.testing.assert_allclose(np.asarray(y), want, atol=1e-5)

    def test_box_is_rectangular_paste(self, batch):
        images, labels = batch
        mixed, _ = CutMix(alpha=1.0, num_classes=5)(
            images, labels, jax.random.PRNGKey(8))
        diff = np.any(np.asarray(mixed) != np.asarray(images), axis=-1)[0]
        ys, xs = np.nonzero(diff)
        if len(ys):  # a clipped-to-empty box is legal (lam ~ 1)
            hbox = ys.max() - ys.min() + 1
            wbox = xs.max() - xs.min() + 1
            assert diff.sum() == hbox * wbox  # solid rectangle

    def test_jit_and_switcher(self, batch):
        images, labels = batch
        mix = MixUp(alpha=0.2, num_classes=5)
        cut = CutMix(alpha=1.0, num_classes=5)

        @jax.jit
        def step(imgs, labs, key):
            return mixup_or_cutmix(imgs, labs, key, mixup=mix, cutmix=cut)

        for s in range(4):
            x, y = step(images, labels, jax.random.PRNGKey(s))
            assert x.shape == images.shape and y.shape == (8, 5)
            np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, atol=1e-6)

"""Batch-level label-mixing augmentations: MixUp and CutMix.

No reference counterpart (chambers/augmentations stops at CutOut) — these
are the other half of the standard ViT/DeiT training recipe (mixup:
Zhang et al. 2018; cutmix: Yun et al. 2019; both in the DeiT recipe the
released DeiT weights were trained with), supplied TPU-natively: whole
batches, one ``jax.random`` key, no host branching, everything jittable.

Unlike the pixel-only ops in ``image_augmentations``, these transform the
LABELS too, so the call signature is ``op(images, labels, key) ->
(mixed_images, mixed_labels)``. Integer labels are one-hot encoded (with
optional label smoothing); already-soft ``[b, classes]`` targets pass
through the same mixing math. Pairing partner is the flipped batch
(``images[::-1]``) — the standard constant-memory choice.

Float images mix exactly; uint8 images are blended in float32 and rounded
back (mixup belongs after normalization in most pipelines — apply it to the
float model inputs when you can).
"""

from typing import Optional

import jax
import jax.numpy as jnp


def _as_soft_labels(labels, num_classes: Optional[int],
                    label_smoothing: float):
    labels = jnp.asarray(labels)
    if labels.ndim == 1:
        if num_classes is None:
            raise ValueError(
                "integer labels need num_classes= to one-hot encode")
        on = 1.0 - label_smoothing + label_smoothing / num_classes
        off = label_smoothing / num_classes
        return jax.nn.one_hot(labels, num_classes) * (on - off) + off
    return labels.astype(jnp.float32)


def _mix_images(images, partner, lam):
    """lam·images + (1−lam)·partner, preserving an integer input dtype."""
    dtype = images.dtype
    x = images.astype(jnp.float32)
    mixed = lam * x + (1.0 - lam) * partner.astype(jnp.float32)
    if jnp.issubdtype(dtype, jnp.integer):
        info = jnp.iinfo(dtype)
        return jnp.clip(jnp.round(mixed), info.min, info.max).astype(dtype)
    return mixed.astype(dtype)


class MixUp:
    """mixup: convex-combine each image (and its target) with the flipped
    batch, ``lam ~ Beta(alpha, alpha)``.

    ``per_example=False`` (default, timm's choice) draws ONE lambda per
    batch; ``True`` draws a ``[b]`` vector.
    """

    stochastic = True

    def __init__(self, alpha: float = 0.2, num_classes: Optional[int] = None,
                 label_smoothing: float = 0.0, per_example: bool = False):
        if alpha <= 0:
            raise ValueError(f"alpha={alpha} must be > 0")
        self.alpha = float(alpha)
        self.num_classes = num_classes
        self.label_smoothing = float(label_smoothing)
        self.per_example = per_example

    def __call__(self, images, labels, key, training: bool = True):
        y = _as_soft_labels(labels, self.num_classes, self.label_smoothing)
        if not training:
            return images, y
        shape = (images.shape[0],) if self.per_example else ()
        lam = jax.random.beta(key, self.alpha, self.alpha, shape)
        lam_img = lam[:, None, None, None] if self.per_example else lam
        lam_lab = lam[:, None] if self.per_example else lam
        mixed = _mix_images(images, images[::-1], lam_img)
        return mixed, lam_lab * y + (1.0 - lam_lab) * y[::-1]


class CutMix:
    """cutmix: paste a random rectangle from the flipped batch and mix the
    targets by the EXACT pasted-pixel fraction.

    One ``lam ~ Beta(alpha, alpha)`` and one box per batch (timm's
    default). The box has aspect-matched sides ``sqrt(1 - lam)`` and clips
    at the borders; the label weight uses the realized (post-clip) area, so
    targets always match the pixels.
    """

    stochastic = True

    def __init__(self, alpha: float = 1.0, num_classes: Optional[int] = None,
                 label_smoothing: float = 0.0):
        if alpha <= 0:
            raise ValueError(f"alpha={alpha} must be > 0")
        self.alpha = float(alpha)
        self.num_classes = num_classes
        self.label_smoothing = float(label_smoothing)

    def __call__(self, images, labels, key, training: bool = True):
        y = _as_soft_labels(labels, self.num_classes, self.label_smoothing)
        if not training:
            return images, y
        b, h, w, _ = images.shape
        k_lam, k_y, k_x = jax.random.split(key, 3)
        lam = jax.random.beta(k_lam, self.alpha, self.alpha)
        cut = jnp.sqrt(1.0 - lam)
        half_h = 0.5 * cut * h
        half_w = 0.5 * cut * w
        cy = jax.random.uniform(k_y, (), minval=0.0, maxval=float(h))
        cx = jax.random.uniform(k_x, (), minval=0.0, maxval=float(w))

        rows = jnp.arange(h, dtype=jnp.float32)[:, None]   # [h, 1]
        cols = jnp.arange(w, dtype=jnp.float32)[None, :]   # [1, w]
        in_box = ((jnp.abs(rows + 0.5 - cy) < half_h)
                  & (jnp.abs(cols + 0.5 - cx) < half_w))   # [h, w]
        mixed = jnp.where(in_box[None, :, :, None], images[::-1], images)
        # realized mix weight: exact fraction of pixels KEPT from the
        # original image (box clipping makes the nominal lam wrong)
        lam_real = 1.0 - jnp.mean(in_box.astype(jnp.float32))
        return mixed, lam_real * y + (1.0 - lam_real) * y[::-1]


def mixup_or_cutmix(images, labels, key, *, mixup: MixUp, cutmix: CutMix,
                    switch_prob: float = 0.5, training: bool = True):
    """Apply MixUp or CutMix (one coin per batch, timm's ``switch_prob``).

    Jittable: both branches trace once under ``lax.cond`` and only the
    chosen one executes per step.
    """
    k_switch, k_op = jax.random.split(key)
    if not training:
        return mixup(images, labels, k_op, training=False)
    use_cutmix = jax.random.bernoulli(k_switch, switch_prob)
    return jax.lax.cond(
        use_cutmix,
        lambda args: cutmix(args[0], args[1], args[2]),
        lambda args: mixup(args[0], args[1], args[2]),
        (images, labels, k_op),
    )

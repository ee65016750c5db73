"""Image-augmentation layers (batched uint8 NHWC, PRNG-key driven).

Parity: reference ``chambers/augmentations/image_augmentations.py``. Each
reference Keras layer becomes a callable with signature
``op(images, key=None, training=True)`` — images are whole uint8 batches
``[b, h, w, c]``; stochastic decisions (sign flips, cutout offsets, chance/
choice draws) come from an explicit ``jax.random`` key instead of global TF
RNG state (determinism by construction, SURVEY.md §5.2).

TPU-first redesign (SURVEY.md §3.5): where the reference dispatches per-image
work through ``tf.map_fn`` + nested ``tf.cond`` chains (RandomChoice,
image_augmentations.py:563-617), these layers stay batched and branchless —
random *signs and parameters* are per-image vectors into vectorized kernels
(``chambers_tpu.ops.image_ops``), and op *selection* is either a
``lax.switch`` (whole-batch choice) or a compute-all-and-mask select
(per-image choice).
"""

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from chambers_tpu.ops import image_ops


class ImageAugmentation:
    """Base class: deterministic ops ignore ``key``; stochastic ops require
    one when ``training=True``."""

    stochastic = False

    def __call__(self, images, key=None, training: bool = True):
        raise NotImplementedError

    def _require_key(self, key):
        if key is None:
            raise ValueError(
                f"{type(self).__name__} is stochastic and requires a PRNG `key`."
            )
        return key

    def __repr__(self):
        return f"{type(self).__name__}()"


class AutoContrast(ImageAugmentation):
    def __call__(self, images, key=None, training=True):
        return image_ops.autocontrast(images)


class Equalize(ImageAugmentation):
    def __call__(self, images, key=None, training=True):
        return image_ops.equalize(images)


class Invert(ImageAugmentation):
    def __call__(self, images, key=None, training=True):
        return image_ops.invert(images)


class _RandomSignOp(ImageAugmentation):
    """Ops whose magnitude randomly flips sign per image
    (the reference's ``_randomly_negate_value``, applied per batch there,
    per image here)."""

    stochastic = True

    def _signed(self, key, batch, value):
        sign = image_ops.random_sign(key, (batch,))
        return sign * value


class Rotate(_RandomSignOp):
    def __init__(self, degrees, interpolation="nearest", fill_mode="constant",
                 fill_value=0.0):
        if fill_mode != "constant":
            raise NotImplementedError("Only fill_mode='constant' is supported.")
        self.fill_mode = fill_mode
        self.degrees = degrees
        self.interpolation = interpolation
        self.fill_value = fill_value
        self._radians = degrees * math.pi / 180.0

    def __call__(self, images, key=None, training=True):
        radians = self._signed(self._require_key(key), images.shape[0], self._radians)
        return image_ops.rotate(
            images, radians, interpolation=self.interpolation,
            fill_value=self.fill_value,
        )


class Posterize(ImageAugmentation):
    def __init__(self, bits):
        self.bits = bits

    def __call__(self, images, key=None, training=True):
        return image_ops.posterize(images, self.bits)


class Solarize(ImageAugmentation):
    def __init__(self, threshold=128):
        self.threshold = threshold

    def __call__(self, images, key=None, training=True):
        return image_ops.solarize(images, self.threshold)


class SolarizeAdd(ImageAugmentation):
    def __init__(self, addition=0, threshold=128):
        self.addition = addition
        self.threshold = threshold

    def __call__(self, images, key=None, training=True):
        return image_ops.solarize_add(images, self.addition, self.threshold)


class Color(ImageAugmentation):
    def __init__(self, factor):
        self.factor = factor

    def __call__(self, images, key=None, training=True):
        return image_ops.color(images, self.factor)


class Contrast(ImageAugmentation):
    def __init__(self, factor):
        self.factor = factor

    def __call__(self, images, key=None, training=True):
        return image_ops.contrast(images, self.factor)


class Brightness(ImageAugmentation):
    def __init__(self, factor):
        self.factor = factor

    def __call__(self, images, key=None, training=True):
        return image_ops.brightness(images, self.factor)


class Sharpness(ImageAugmentation):
    def __init__(self, factor):
        self.factor = factor

    def __call__(self, images, key=None, training=True):
        return image_ops.sharpness(images, self.factor)


class ShearX(_RandomSignOp):
    def __init__(self, level, interpolation="nearest", fill_mode="constant",
                 fill_value=0.0):
        if fill_mode != "constant":
            raise NotImplementedError("Only fill_mode='constant' is supported.")
        self.fill_mode = fill_mode
        self.level = level
        self.interpolation = interpolation
        self.fill_value = fill_value

    def __call__(self, images, key=None, training=True):
        level = self._signed(self._require_key(key), images.shape[0], self.level)
        return image_ops.shear_x(
            images, level, interpolation=self.interpolation,
            fill_value=self.fill_value,
        )


class ShearY(_RandomSignOp):
    def __init__(self, level, interpolation="nearest", fill_mode="constant",
                 fill_value=0.0):
        if fill_mode != "constant":
            raise NotImplementedError("Only fill_mode='constant' is supported.")
        self.fill_mode = fill_mode
        self.level = level
        self.interpolation = interpolation
        self.fill_value = fill_value

    def __call__(self, images, key=None, training=True):
        level = self._signed(self._require_key(key), images.shape[0], self.level)
        return image_ops.shear_y(
            images, level, interpolation=self.interpolation,
            fill_value=self.fill_value,
        )


class TranslateX(_RandomSignOp):
    def __init__(self, pixels, interpolation="nearest", fill_mode="constant",
                 fill_value=0.0):
        if fill_mode != "constant":
            raise NotImplementedError("Only fill_mode='constant' is supported.")
        self.fill_mode = fill_mode
        self.pixels = pixels
        self.interpolation = interpolation
        self.fill_value = fill_value

    def __call__(self, images, key=None, training=True):
        pixels = self._signed(self._require_key(key), images.shape[0], self.pixels)
        return image_ops.translate_x(
            images, pixels, interpolation=self.interpolation,
            fill_value=self.fill_value,
        )


class TranslateY(_RandomSignOp):
    def __init__(self, pixels, interpolation="nearest", fill_mode="constant",
                 fill_value=0.0):
        if fill_mode != "constant":
            raise NotImplementedError("Only fill_mode='constant' is supported.")
        self.fill_mode = fill_mode
        self.pixels = pixels
        self.interpolation = interpolation
        self.fill_value = fill_value

    def __call__(self, images, key=None, training=True):
        pixels = self._signed(self._require_key(key), images.shape[0], self.pixels)
        return image_ops.translate_y(
            images, pixels, interpolation=self.interpolation,
            fill_value=self.fill_value,
        )


class CutOut(ImageAugmentation):
    stochastic = True

    def __init__(self, mask_size, constant_values=0):
        self.mask_size = mask_size
        self.constant_values = constant_values

    def __call__(self, images, key=None, training=True):
        if self.mask_size == 0:
            return images
        return image_ops.cutout(
            images, self._require_key(key), self.mask_size, self.constant_values
        )


# ---------------------------------------------------------------------------
# combinators
# ---------------------------------------------------------------------------

class RandomChance(ImageAugmentation):
    """Apply ``transform`` with probability ``probability``
    (image_augmentations.py:514-545).

    ``elementwise=False`` draws one decision for the whole batch (the
    reference's ``tf.cond``); ``elementwise=True`` draws per image and
    mask-selects — branchless on TPU.
    """

    stochastic = True

    def __init__(self, transform, probability, elementwise: bool = False):
        self.transform = transform
        self.probability = probability
        self.elementwise = elementwise

    def __call__(self, images, key=None, training=True):
        key = self._require_key(key)
        key_draw, key_op = jax.random.split(key)
        if self.elementwise:
            do = jax.random.uniform(key_draw, (images.shape[0],)) < self.probability
            transformed = self.transform(images, key=key_op, training=training)
            return jnp.where(do[:, None, None, None], transformed, images)
        do = jax.random.uniform(key_draw, ()) < self.probability
        return jax.lax.cond(
            do,
            lambda imgs: self.transform(imgs, key=key_op, training=training),
            lambda imgs: imgs,
            images,
        )


class RandomChoice(ImageAugmentation):
    """Apply ``n_transforms`` uniformly-chosen transforms from a list
    (image_augmentations.py:549-617).

    ``elementwise=False``: one choice per batch per round via ``lax.switch``
    (only the chosen branch executes — replaces the reference's nested
    ``tf.cond`` chain). ``elementwise=True``: per-image choice; all candidate
    outputs are computed batched and a per-image gather selects — this is the
    TPU replacement for the reference's serializing ``tf.map_fn``.
    """

    stochastic = True

    def __init__(self, transforms: Sequence, n_transforms: int,
                 elementwise: bool = False):
        self.transforms = list(transforms)
        self.n_transforms = n_transforms
        self.elementwise = elementwise

    def __call__(self, images, key=None, training=True):
        key = self._require_key(key)
        for key_round in jax.random.split(key, self.n_transforms):
            key_draw, key_op = jax.random.split(key_round)
            if self.elementwise:
                images = self._apply_elementwise(images, key_draw, key_op, training)
            else:
                idx = jax.random.randint(key_draw, (), 0, len(self.transforms))
                branches = [
                    (lambda imgs, k, t=t: t(imgs, key=k, training=training))
                    for t in self.transforms
                ]
                images = jax.lax.switch(idx, branches, images, key_op)
        return images

    def _apply_elementwise(self, images, key_draw, key_op, training):
        b = images.shape[0]
        idx = jax.random.randint(key_draw, (b,), 0, len(self.transforms))
        op_keys = jax.random.split(key_op, len(self.transforms))
        outs = jnp.stack(
            [
                t(images, key=k, training=training)
                for t, k in zip(self.transforms, op_keys)
            ],
            axis=0,
        )  # [n_ops, b, h, w, c]
        return outs[idx, jnp.arange(b)]


# ---------------------------------------------------------------------------
# normalization / resizing
# ---------------------------------------------------------------------------

class ImageNetNormalization:
    """caffe (BGR + mean) / tf ([-1, 1]) / torch (0-1 + mean/std) input scaling
    (image_augmentations.py:621-682). Returns float32."""

    _CAFFE_MEAN = (103.939, 116.779, 123.68)
    _TORCH_MEAN = (0.485, 0.456, 0.406)
    _TORCH_STD = (0.229, 0.224, 0.225)

    def __init__(self, mode: str = "caffe"):
        if mode not in {"caffe", "tf", "torch"}:
            raise ValueError("Unknown mode " + str(mode))
        self.mode = mode

    def __call__(self, x):
        x = jnp.asarray(x).astype(jnp.float32)
        if self.mode == "tf":
            return x / 127.5 - 1.0
        if self.mode == "torch":
            x = x / 255.0
            mean = jnp.asarray(self._TORCH_MEAN, jnp.float32)
            std = jnp.asarray(self._TORCH_STD, jnp.float32)
            return (x - mean) / std
        x = x[..., ::-1]  # RGB -> BGR
        return x - jnp.asarray(self._CAFFE_MEAN, jnp.float32)


class ResizingMinMax:
    """Aspect-preserving resize to a min-side / max-side constraint
    (image_augmentations.py:686-748). Output shape is static given the input
    shape, so this stays jittable.
    """

    def __init__(self, min_side: Optional[int] = None,
                 max_side: Optional[int] = None, interpolation="bilinear"):
        if min_side is None and max_side is None:
            raise ValueError("Must specify either 'min_side' or 'max_side'.")
        self.min_side = min_side
        self.max_side = max_side
        self.interpolation = interpolation

    def __call__(self, images):
        h, w = images.shape[1], images.shape[2]
        if self.min_side is not None and self.max_side is not None:
            scale = min(
                self.max_side / max(h, w), self.min_side / min(h, w)
            )
        elif self.min_side is not None:
            scale = self.min_side / min(h, w)
        else:
            scale = self.max_side / max(h, w)

        new_h = int(h * scale)
        new_w = int(w * scale)
        out_shape = (images.shape[0], new_h, new_w, images.shape[3])
        resized = jax.image.resize(
            images.astype(jnp.float32), out_shape, method=self.interpolation
        )
        if jnp.issubdtype(images.dtype, jnp.integer):
            resized = jnp.round(jnp.clip(resized, 0, 255))
        return resized.astype(images.dtype)

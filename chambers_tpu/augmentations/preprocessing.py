"""Keras-preprocessing-layer equivalents.

Parity: the reference re-exports Keras's experimental preprocessing layers
from its augmentations package (augmentations/__init__.py:1-13): Resizing,
Rescaling, CenterCrop, RandomCrop, RandomFlip, RandomRotation, RandomZoom,
RandomTranslation, RandomContrast, RandomHeight, RandomWidth. This module
provides the same surface as batched device ops — stochastic layers take a
``jax.random`` key and draw *per-image* parameters (Keras semantics), built
on the projective-transform core of ``chambers_tpu.ops.image_ops``.

All layers operate on ``[b, h, w, c]`` batches; uint8 inputs stay uint8
through geometric ops (nearest/bilinear with rounding), Rescaling returns
float.
"""

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from chambers_tpu.ops import image_ops


def _pair(value) -> Tuple[float, float]:
    if isinstance(value, (tuple, list)):
        return float(value[0]), float(value[1])
    v = float(value)
    return -v, v


class Resizing:
    """Resize to ``(height, width)``."""

    def __init__(self, height: int, width: int, interpolation: str = "bilinear"):
        self.height = height
        self.width = width
        self.interpolation = interpolation

    def __call__(self, images, key=None, training=True):
        out_shape = (images.shape[0], self.height, self.width, images.shape[3])
        resized = jax.image.resize(
            images.astype(jnp.float32), out_shape, method=self.interpolation
        )
        if jnp.issubdtype(images.dtype, jnp.integer):
            resized = jnp.round(jnp.clip(resized, 0, 255))
        return resized.astype(images.dtype)


class Rescaling:
    """``x * scale + offset`` (returns float32)."""

    def __init__(self, scale: float, offset: float = 0.0):
        self.scale = scale
        self.offset = offset

    def __call__(self, images, key=None, training=True):
        return images.astype(jnp.float32) * self.scale + self.offset


class CenterCrop:
    def __init__(self, height: int, width: int):
        self.height = height
        self.width = width

    def __call__(self, images, key=None, training=True):
        h, w = images.shape[1], images.shape[2]
        top = (h - self.height) // 2
        left = (w - self.width) // 2
        if top < 0 or left < 0:
            raise ValueError(
                f"Crop size ({self.height}, {self.width}) larger than input "
                f"({h}, {w})."
            )
        return images[:, top: top + self.height, left: left + self.width]


class RandomCrop:
    """Random crop per image (same crop size, per-image offsets).

    Inputs smaller than the crop are first upscaled aspect-preserving so the
    crop fits (the Keras RandomCrop fallback), instead of feeding negative
    offset ranges into the RNG.
    """

    def __init__(self, height: int, width: int):
        self.height = height
        self.width = width

    def _fit(self, images):
        h, w = images.shape[1], images.shape[2]
        if h >= self.height and w >= self.width:
            return images
        scale = max(self.height / h, self.width / w)
        new_h = max(int(np.ceil(h * scale)), self.height)
        new_w = max(int(np.ceil(w * scale)), self.width)
        return Resizing(new_h, new_w)(images)

    def __call__(self, images, key=None, training=True):
        images = self._fit(images)
        if not training or key is None:
            return CenterCrop(self.height, self.width)(images)
        b, h, w, _ = images.shape
        key_y, key_x = jax.random.split(key)
        tops = jax.random.randint(key_y, (b,), 0, h - self.height + 1)
        lefts = jax.random.randint(key_x, (b,), 0, w - self.width + 1)
        # per-image crop via translate-then-static-crop: shift each image so
        # its crop origin lands at (0, 0), then slice — stays batched
        shifted = image_ops.translate(
            images, jnp.stack([-lefts.astype(jnp.float32),
                               -tops.astype(jnp.float32)], axis=1)
        )
        return shifted[:, : self.height, : self.width]


class RandomFlip:
    """Per-image random horizontal and/or vertical flips."""

    def __init__(self, mode: str = "horizontal_and_vertical"):
        if mode not in ("horizontal", "vertical", "horizontal_and_vertical"):
            raise ValueError(f"Unknown flip mode '{mode}'")
        self.mode = mode

    def __call__(self, images, key=None, training=True):
        if not training or key is None:
            return images
        key_h, key_v = jax.random.split(key)
        out = images
        if "horizontal" in self.mode:
            do = jax.random.bernoulli(key_h, 0.5, (images.shape[0],))
            out = jnp.where(do[:, None, None, None], out[:, :, ::-1], out)
        if "vertical" in self.mode:
            do = jax.random.bernoulli(key_v, 0.5, (images.shape[0],))
            out = jnp.where(do[:, None, None, None], out[:, ::-1], out)
        return out


class RandomRotation:
    """Per-image rotation by a uniform factor of 2π
    (Keras: ``factor=0.1`` → ±10% of a full circle)."""

    def __init__(self, factor, interpolation: str = "bilinear",
                 fill_value: float = 0.0):
        self.lower, self.upper = _pair(factor)
        self.interpolation = interpolation
        self.fill_value = fill_value

    def __call__(self, images, key=None, training=True):
        if not training or key is None:
            return images
        b = images.shape[0]
        angles = jax.random.uniform(
            key, (b,), minval=self.lower * 2 * math.pi,
            maxval=self.upper * 2 * math.pi,
        )
        return image_ops.rotate(
            images, angles, interpolation=self.interpolation,
            fill_value=self.fill_value,
        )


class RandomTranslation:
    """Per-image translation by uniform height/width fractions."""

    def __init__(self, height_factor, width_factor,
                 interpolation: str = "bilinear", fill_value: float = 0.0):
        self.height_range = _pair(height_factor)
        self.width_range = _pair(width_factor)
        self.interpolation = interpolation
        self.fill_value = fill_value

    def __call__(self, images, key=None, training=True):
        if not training or key is None:
            return images
        b, h, w, _ = images.shape
        key_h, key_w = jax.random.split(key)
        dy = jax.random.uniform(key_h, (b,), minval=self.height_range[0],
                                maxval=self.height_range[1]) * h
        dx = jax.random.uniform(key_w, (b,), minval=self.width_range[0],
                                maxval=self.width_range[1]) * w
        return image_ops.translate(
            images, jnp.stack([dx, dy], axis=1),
            interpolation=self.interpolation, fill_value=self.fill_value,
        )


class RandomZoom:
    """Per-image zoom about the center by uniform height/width factors."""

    def __init__(self, height_factor, width_factor=None,
                 interpolation: str = "bilinear", fill_value: float = 0.0):
        self.height_range = _pair(height_factor)
        self.width_range = _pair(width_factor) if width_factor is not None else None
        self.interpolation = interpolation
        self.fill_value = fill_value

    def __call__(self, images, key=None, training=True):
        if not training or key is None:
            return images
        b, h, w, _ = images.shape
        key_h, key_w = jax.random.split(key)
        zy = 1.0 + jax.random.uniform(
            key_h, (b,), minval=self.height_range[0], maxval=self.height_range[1]
        )
        if self.width_range is None:
            zx = zy
        else:
            zx = 1.0 + jax.random.uniform(
                key_w, (b,), minval=self.width_range[0],
                maxval=self.width_range[1],
            )
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        zeros = jnp.zeros_like(zx)
        mats = jnp.stack([
            zx, zeros, cx * (1 - zx),
            zeros, zy, cy * (1 - zy),
            zeros, zeros,
        ], axis=1)
        return image_ops.transform(
            images, mats, interpolation=self.interpolation,
            fill_value=self.fill_value,
        )


class RandomContrast:
    """Per-image contrast jitter about the per-channel spatial mean
    (Keras semantics: ``(x - mean) * factor + mean`` with the factor drawn
    from ``[1 - lower, 1 + upper]`` — a tuple gives (lower, upper) as
    *positive* bounds, per the Keras contract)."""

    def __init__(self, factor):
        if isinstance(factor, (tuple, list)):
            lower, upper = float(factor[0]), float(factor[1])
        else:
            lower = upper = float(factor)
        self.lower, self.upper = max(1.0 - lower, 0.0), 1.0 + upper

    def __call__(self, images, key=None, training=True):
        if not training or key is None:
            return images
        b = images.shape[0]
        factors = jax.random.uniform(
            key, (b, 1, 1, 1), minval=self.lower, maxval=self.upper
        )
        x = images.astype(jnp.float32)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        out = (x - mean) * factors + mean
        if jnp.issubdtype(images.dtype, jnp.integer):
            out = jnp.round(jnp.clip(out, 0, 255))
        return out.astype(images.dtype)


class RandomHeight:
    """Batch-level random height scaling (output shape must be uniform, so
    one factor per call — the Keras layer is batch-level too)."""

    def __init__(self, factor, interpolation: str = "bilinear"):
        self.lower, self.upper = _pair(factor)
        self.interpolation = interpolation

    def __call__(self, images, key=None, training=True):
        if not training or key is None:
            return images
        # dynamic output shapes are XLA-hostile: draw the factor on host
        factor = 1.0 + float(
            jax.random.uniform(key, (), minval=self.lower, maxval=self.upper)
        )
        new_h = max(int(images.shape[1] * factor), 1)
        return Resizing(new_h, images.shape[2], self.interpolation)(images)


class RandomWidth:
    def __init__(self, factor, interpolation: str = "bilinear"):
        self.lower, self.upper = _pair(factor)
        self.interpolation = interpolation

    def __call__(self, images, key=None, training=True):
        if not training or key is None:
            return images
        factor = 1.0 + float(
            jax.random.uniform(key, (), minval=self.lower, maxval=self.upper)
        )
        new_w = max(int(images.shape[2] * factor), 1)
        return Resizing(images.shape[1], new_w, self.interpolation)(images)

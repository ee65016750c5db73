"""Measure the TF2 reference-equivalent pipeline on this machine (CPU).

The actual chjort/chambers code needs tensorflow_addons (absent here), so this
harness reproduces the reference's *structure* with core-TF ops:

- RandAugment(N=2, M=10) as the reference implements it: per-call nested
  ``tf.cond`` chains over 16 ops (augmentation_schemes.py:175-225 /
  image_augmentations.py:606-617), with tfa's geometry ops replaced by the
  raw op they wrap (``ImageProjectiveTransformV3``) and equalize/sharpness/
  cutout transcribed from the AutoAugment-paper algorithms tfa uses.
- ViT-B/16 inference as a standard Keras functional model of the same
  architecture (Conv patch embed, 12 pre-norm encoder layers with Keras
  MultiHeadAttention, 86.6M params).

Run:  python tools/measure_tf_baseline.py
Writes one JSON line with img/s for augment-only, vit-only, and the fused
pipeline at batch 32 / 224px on CPU.
"""

import json
import math
import time

import numpy as np
import tensorflow as tf

BATCH = 32
SIZE = 224
ITERS = 5
M = 10.0
FILL = 128


# ---- tfa-equivalent ops (core TF) ----------------------------------------

def transform(images, t):
    return tf.raw_ops.ImageProjectiveTransformV3(
        images=images, transforms=tf.reshape(t, [1, 8]),
        output_shape=tf.shape(images)[1:3],
        interpolation="NEAREST", fill_mode="CONSTANT",
        fill_value=float(FILL),
    )


def random_negate(v):
    return tf.cond(tf.random.uniform([]) < 0.5, lambda: -v, lambda: v)


def rotate(images):
    radians = random_negate(M / 10 * 30.0 * math.pi / 180)
    cos, sin = tf.cos(radians), tf.sin(radians)
    h = tf.cast(tf.shape(images)[1], tf.float32)
    w = tf.cast(tf.shape(images)[2], tf.float32)
    x_off = ((w - 1) - (cos * (w - 1) - sin * (h - 1))) / 2.0
    y_off = ((h - 1) - (sin * (w - 1) + cos * (h - 1))) / 2.0
    return transform(images, [cos, -sin, x_off, sin, cos, y_off, 0.0, 0.0])


def shear_x(images):
    level = random_negate(M / 10 * 0.3)
    return transform(images, [1.0, level, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0])


def shear_y(images):
    level = random_negate(M / 10 * 0.3)
    return transform(images, [1.0, 0.0, 0.0, level, 1.0, 0.0, 0.0, 0.0])


def translate_x(images):
    pixels = random_negate(M / 10 * 100)
    return transform(images, [1.0, 0.0, pixels, 0.0, 1.0, 0.0, 0.0, 0.0])


def translate_y(images):
    pixels = random_negate(M / 10 * 100)
    return transform(images, [1.0, 0.0, 0.0, 0.0, 1.0, pixels, 0.0, 0.0])


def blend(a, b, factor):
    af = tf.cast(a, tf.float32)
    bf = tf.cast(b, tf.float32)
    out = af + factor * (bf - af)
    return tf.cast(tf.clip_by_value(out, 0, 255), tf.uint8)


ENHANCE = M / 10 * 1.8 + 0.1


def autocontrast(images):
    lo = tf.cast(tf.reduce_min(images, axis=(1, 2)), tf.float32)
    hi = tf.cast(tf.reduce_max(images, axis=(1, 2)), tf.float32)
    scale = tf.math.divide_no_nan(255.0, hi - lo)
    offset = -lo * scale
    mask = tf.cast(hi > lo, tf.float32)
    scale = scale * mask + (1 - mask)
    offset = offset * mask
    x = tf.cast(images, tf.float32) * scale[:, None, None, :] + offset[:, None, None, :]
    return tf.cast(tf.clip_by_value(x, 0, 255), tf.uint8)


def equalize(images):
    def scale_channel(im):
        histo = tf.histogram_fixed_width(tf.cast(im, tf.int32), [0, 255], nbins=256)
        nonzero = tf.where(tf.not_equal(histo, 0))
        nonzero_histo = tf.reshape(tf.gather(histo, nonzero), [-1])
        step = (tf.reduce_sum(nonzero_histo) - nonzero_histo[-1]) // 255

        def build_lut(histo, step):
            lut = (tf.cumsum(histo) + (step // 2)) // step
            lut = tf.concat([[0], lut[:-1]], 0)
            return tf.clip_by_value(lut, 0, 255)

        return tf.cond(
            tf.equal(step, 0), lambda: im,
            lambda: tf.cast(tf.gather(build_lut(histo, step), tf.cast(im, tf.int32)),
                            tf.uint8),
        )

    def per_image(im):
        return tf.stack([scale_channel(im[..., c]) for c in range(3)], -1)

    return tf.map_fn(per_image, images)


def invert(images):
    return 255 - images


def brightness(images):
    return blend(tf.zeros_like(images), images, ENHANCE)


def color(images):
    gray = tf.image.grayscale_to_rgb(tf.image.rgb_to_grayscale(images))
    return blend(gray, images, ENHANCE)


def contrast(images):
    gray = tf.cast(tf.image.rgb_to_grayscale(images), tf.int32)
    hist = tf.histogram_fixed_width(gray, [0, 255], nbins=256)
    mean = tf.reduce_sum(tf.cast(hist, tf.float32)) / 256.0
    degenerate = tf.cast(
        tf.clip_by_value(tf.ones_like(gray, tf.float32) * mean, 0, 255), tf.uint8
    )
    return blend(tf.image.grayscale_to_rgb(degenerate), images, ENHANCE)


def sharpness(images):
    kernel = tf.constant([[1, 1, 1], [1, 5, 1], [1, 1, 1]], tf.float32) / 13.0
    kernel = tf.tile(kernel[:, :, None, None], [1, 1, 3, 1])
    x = tf.cast(images, tf.float32)
    sm = tf.nn.depthwise_conv2d(x, kernel, [1, 1, 1, 1], "VALID")
    sm = tf.cast(tf.clip_by_value(sm, 0, 255), tf.uint8)
    padded = tf.pad(sm, [[0, 0], [1, 1], [1, 1], [0, 0]])
    mask = tf.pad(tf.ones_like(sm), [[0, 0], [1, 1], [1, 1], [0, 0]])
    result = tf.where(tf.cast(mask, tf.bool), padded, images)
    return blend(result, images, ENHANCE)


def posterize(images):
    shift = 8 - int(M / 10 * 4)
    return tf.bitwise.left_shift(tf.bitwise.right_shift(images, shift), shift)


def solarize(images):
    thr = int(M / 10 * 256)
    return tf.where(images < thr, images, 255 - images)


def solarize_add(images):
    add = int(M / 10 * 110)
    x = tf.cast(tf.clip_by_value(tf.cast(images, tf.int64) + add, 0, 255), tf.uint8)
    return tf.where(images < 128, x, images)


def cutout(images):
    size = int(M / 10 * 80) // 2
    shape = tf.shape(images)
    b, h, w = shape[0], shape[1], shape[2]
    cy = tf.random.uniform([b], 0, h, tf.int32)
    cx = tf.random.uniform([b], 0, w, tf.int32)
    rows = tf.range(h)[None, :, None]
    cols = tf.range(w)[None, None, :]
    in_y = (rows >= cy[:, None, None] - size) & (rows < cy[:, None, None] + size)
    in_x = (cols >= cx[:, None, None] - size) & (cols < cx[:, None, None] + size)
    mask = (in_y & in_x)[..., None]
    return tf.where(mask, tf.cast(FILL, tf.uint8), images)


OPS = [autocontrast, equalize, invert, brightness, contrast, color, sharpness,
       shear_x, shear_y, translate_x, translate_y, posterize, solarize,
       solarize_add, cutout, rotate]


@tf.function
def rand_augment(images):
    """Reference RandomChoice._random_transforms: nested tf.cond chain
    (image_augmentations.py:606-617), N=2 rounds."""
    for _ in range(2):
        idx = tf.random.uniform([], maxval=len(OPS), dtype=tf.int32)
        for j, op in enumerate(OPS):
            images = tf.cond(tf.equal(j, idx),
                             lambda op=op: op(images), lambda: images)
    return images


class _AddClsPos(tf.keras.layers.Layer):
    def build(self, input_shape):
        d = input_shape[-1]
        self.cls = self.add_weight(name="cls", shape=(1, 1, d))
        self.pos = self.add_weight(name="pos", shape=(1, input_shape[1] + 1, d))

    def call(self, x):
        cls = tf.repeat(self.cls, tf.shape(x)[0], axis=0)
        return tf.concat([cls, x], axis=1) + self.pos


def build_vit_b16():
    inputs = tf.keras.Input((SIZE, SIZE, 3))
    x = tf.keras.layers.Conv2D(768, 16, strides=16, padding="valid")(inputs)
    x = tf.keras.layers.Reshape((-1, 768))(x)
    x = _AddClsPos()(x)
    for _ in range(12):
        h = tf.keras.layers.LayerNormalization(epsilon=1e-6)(x)
        h = tf.keras.layers.MultiHeadAttention(num_heads=12, key_dim=64)(h, h)
        x = x + h
        h = tf.keras.layers.LayerNormalization(epsilon=1e-6)(x)
        h = tf.keras.layers.Dense(3072, activation="gelu")(h)
        h = tf.keras.layers.Dense(768)(h)
        x = x + h
    x = tf.keras.layers.LayerNormalization(epsilon=1e-6)(x)
    x = tf.keras.layers.Dense(1000)(x[:, 0])
    return tf.keras.Model(inputs, x)


def bench(fn, *args, iters=ITERS):
    fn(*args)  # warmup / trace
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        if hasattr(out, "numpy"):
            out.numpy()
        times.append(time.perf_counter() - t0)
    return BATCH / float(np.median(times))


def main():
    rng = np.random.RandomState(0)
    images = tf.constant(rng.randint(0, 256, (BATCH, SIZE, SIZE, 3), np.uint8))

    aug_img_s = bench(rand_augment, images)

    vit = build_vit_b16()
    norm = tf.cast(images, tf.float32) / 127.5 - 1.0

    @tf.function
    def vit_fwd(x):
        return vit(x, training=False)

    vit_img_s = bench(vit_fwd, norm)

    @tf.function
    def fused(images):
        x = tf.cast(rand_augment(images), tf.float32) / 127.5 - 1.0
        return vit(x, training=False)

    fused_img_s = bench(fused, images)

    print(json.dumps({
        "hardware": "CPU (TF " + tf.__version__ + ")",
        "batch": BATCH,
        "augment_img_s": round(aug_img_s, 2),
        "vit_b16_img_s": round(vit_img_s, 2),
        "fused_img_s": round(fused_img_s, 2),
        "vit_params": vit.count_params(),
    }))


if __name__ == "__main__":
    main()

"""Stage-by-stage profile of the fused RandAugment pipeline (config 1).

After the separable-warp rewrite config-1 runs ~24 ms/batch of which
ViT-B/16 is ~10 ms; this decomposes the remaining augmentation time per
round: warp, LUT build+apply, and the three non-LUT full-batch ops
(Color, Sharpness, CutOut) that are computed for every image then masked.

Timing per CLAUDE.md: lax.scan + scalar checksum fetch.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 32
SIZE = 224
STEPS = 20
REPEATS = 5


def timed(fn, args, label):
    jfn = jax.jit(fn)
    out = float(jfn(*args))
    assert np.isfinite(out), label
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(jfn(*args))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / STEPS * 1e3
    print(f"{label:52s} {ms:8.2f} ms/step")
    return ms


def scan_sum(f):
    def run(images, key):
        def body(c, k):
            out = f(images, k)
            return c + jnp.sum(out.astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jax.random.split(key, STEPS))
        return tot
    return run


def main():
    from chambers_tpu.augmentations import RandAugment
    from chambers_tpu.ops import image_ops

    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.randint(0, 256, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(0)

    ra = RandAugment(n_transforms=2, magnitude=10, elementwise=True)

    # full pipeline
    timed(scan_sum(lambda im, k: ra(im, key=k)), (images, key),
          "full RandAugment(2,10) elementwise")

    # one round only
    ra1 = RandAugment(n_transforms=1, magnitude=10, elementwise=True)
    timed(scan_sum(lambda im, k: ra1(im, key=k)), (images, key),
          "one round")

    # separable warp alone (rotation path, worst case)
    def warp_only(im, k):
        ang = jax.random.uniform(k, (BATCH,), minval=-0.5, maxval=0.5)
        mats = image_ops.rotation_matrices(ang, SIZE, SIZE)
        return image_ops.transform_affine_separable(im, mats, fill_value=128)
    timed(scan_sum(warp_only), (images, key), "separable warp (rotate)")

    # LUT build + apply alone
    def lut_only(im, k):
        idx = jax.random.randint(k, (BATCH,), 0, 16)
        return ra1._apply_lut_ops(im, idx, im)
    timed(scan_sum(lut_only), (images, key), "LUT ops (build tables + apply)")

    # equalize LUT build alone (histogram path)
    def eq_only(im, k):
        return image_ops.equalize_luts(im)
    timed(scan_sum(eq_only), (images, key), "equalize_luts (histograms)")

    def ac_only(im, k):
        return image_ops.autocontrast_luts(im)
    timed(scan_sum(ac_only), (images, key), "autocontrast_luts")

    # non-LUT pointwise full-batch candidates
    for name in ("Color", "Sharpness", "CutOut"):
        i = ra1.OP_NAMES.index(name)
        t = ra1.transforms[i]
        timed(scan_sum(lambda im, k, t=t: t(im, key=k)), (images, key),
              f"{name} full batch")


if __name__ == "__main__":
    main()

"""Benchmark: fused on-device augmentation + ViT-B/16 inference @ 224px.

BASELINE.json config 1/2: per-image RandAugment(N=2, M=10) on uint8 batches
followed by ImageNet 'tf' normalization and ViT-B/16 (bfloat16) logits — the
whole pipeline is one jitted function resident on a single TPU chip. Steps are
driven through a ``lax.scan`` so host↔device round-trip latency (large on a
relay-attached chip) is amortized out of the steady-state number; completion
is guaranteed by fetching a scalar checksum.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

``vs_baseline`` compares against the TF2 reference pipeline measured on this
machine's CPU (the only reference-runnable substrate here — see BASELINE.md);
override with CHAMBERS_BASELINE_IMG_S.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
SCAN_STEPS = int(os.environ.get("BENCH_SCAN_STEPS", "20"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "5"))
# TF2 reference pipeline on this host's CPU (see BASELINE.md "Measured" row;
# produced by tools/measure_tf_baseline.py: fused augment+ViT-B/16 = 0.85
# img/s on CPU).
REFERENCE_IMG_S = float(os.environ.get("CHAMBERS_BASELINE_IMG_S", "0.85"))


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp

    from chambers_tpu.augmentations import ImageNetNormalization, RandAugment
    from chambers_tpu.models.backbones import ViTB16

    model = ViTB16(weights=None, input_shape=(224, 224, 3), dtype=jnp.bfloat16)
    augment = RandAugment(n_transforms=2, magnitude=10, elementwise=True)
    normalize = ImageNetNormalization(mode="tf")

    def pipeline(variables, images_uint8, key):
        images = augment(images_uint8, key=key)
        x = normalize(images)
        return model.apply_fn(variables, x, deterministic=True)

    @jax.jit
    def run_scan(variables, images, key):
        keys = jax.random.split(key, SCAN_STEPS)

        def body(carry, k):
            logits = pipeline(variables, images, k)
            return carry + jnp.sum(logits), None

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), keys)
        return total

    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.randint(0, 256, (BATCH, 224, 224, 3), dtype=np.uint8)
    )
    variables = jax.device_put(model.variables)

    # warmup/compile
    checksum = float(run_scan(variables, images, jax.random.PRNGKey(0)))
    assert np.isfinite(checksum), "non-finite logits"

    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        float(run_scan(variables, images, jax.random.PRNGKey(i + 1)))
        times.append(time.perf_counter() - t0)

    best = min(times)  # amortized: SCAN_STEPS batches per call
    per_batch = best / SCAN_STEPS
    img_s = BATCH / per_batch
    result = {
        "metric": (
            "images/sec/chip (per-image RandAugment(2,10)+ViT-B/16 bf16 "
            "infer, 224px, batch %d)" % BATCH
        ),
        "value": round(img_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_s / REFERENCE_IMG_S, 2),
        "p50_batch_latency_ms": round(per_batch * 1000, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

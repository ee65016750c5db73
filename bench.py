"""Benchmark: fused on-device augmentation + ViT-B/16 inference @ 224px.

BASELINE.json config 1/2: per-image RandAugment(N=2, M=10) on uint8 batches
followed by ImageNet 'tf' normalization and ViT-B/16 (bfloat16) logits — the
whole pipeline is one jitted function resident on a single TPU chip. Steps are
driven through a ``lax.scan`` so host↔device round-trip latency (large on a
relay-attached chip) is amortized out of the steady-state number; completion
is guaranteed by fetching a scalar checksum.

Prints the primary JSON line first:
    {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}
then (default config only) a second line for the same pipeline served
through int8 PTQ — the build's best end-to-end number, recorded in the
driver artifact alongside the parity-grade bf16 headline.

``vs_baseline`` compares against the TF2 reference pipeline measured on this
machine's CPU (the only reference-runnable substrate here — see BASELINE.md);
override with CHAMBERS_BASELINE_IMG_S.
"""

import json
import os
import sys
import time

import numpy as np

CONFIG = os.environ.get("BENCH_CONFIG", "randaugment_vitb16_224")
BATCH = int(os.environ.get("BENCH_BATCH", "0"))  # 0 = config default
SCAN_STEPS = int(os.environ.get("BENCH_SCAN_STEPS", "20"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "5"))
# TF2 reference pipeline on this host's CPU (see BASELINE.md "Measured" row;
# produced by tools/measure_tf_baseline.py: fused augment+ViT-B/16 = 0.85
# img/s on CPU).
REFERENCE_IMG_S = float(os.environ.get("CHAMBERS_BASELINE_IMG_S", "0.85"))
# BENCH_QUANT=1: serve the model through int8 dynamic PTQ
# (chambers_tpu.quantization) — measured 1.13x on config 1 (BASELINE.md).
# Off by default: the headline numbers stay at the parity-grade bf16
# numerics; int8 is an opt-in accuracy/throughput trade.
QUANT = bool(int(os.environ.get("BENCH_QUANT", "0")))


def _timed(run_scan, args, batch):
    import numpy as np

    checksum = float(run_scan(*args))
    assert np.isfinite(checksum), "non-finite result"
    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        float(run_scan(*args))
        times.append(time.perf_counter() - t0)
    per_batch = float(np.median(times)) / SCAN_STEPS
    return batch / per_batch, per_batch


def _augment_infer_bench(batch, *, model_builder, size, augment, label,
                         default_batch, quantize=False):
    """Shared harness: fused on-device augmentation -> bf16 ViT inference.

    The ImageNet 'tf'-mode normalization is constant-folded into the
    patch-embed conv (``fold_imagenet_normalization``, exactness pinned in
    tests/models/test_normalization_fold.py), so the model consumes the
    augmented uint8 batch directly — no separate full-image normalize pass
    and no extra HBM round trip between augmentation and the first matmul.
    """
    import jax
    import jax.numpy as jnp

    from chambers_tpu.models.backbones import fold_imagenet_normalization

    batch = batch or default_batch
    # score_dtype=bf16: the bench runs the bf16 mixed-precision pipeline,
    # so attention scores/softmax stay bf16 too (what the reference does
    # under Keras mixed_float16); fp32 scores remain the library default
    # and the pretrained-weight parity gate uses that default.
    model = model_builder(weights=None, input_shape=(size, size, 3),
                          dtype=jnp.bfloat16, score_dtype=jnp.bfloat16)
    variables = fold_imagenet_normalization(model.variables, mode="tf")
    if QUANT or quantize:
        from chambers_tpu.quantization import quantize_variables

        variables = jax.jit(quantize_variables)(variables)
        label += "+int8"

    @jax.jit
    def run_scan(variables, images, key):
        def body(carry, k):
            logits = model.apply_fn(
                variables, augment(images, key=k), deterministic=True,
            )
            return carry + jnp.sum(logits), None

        total, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jax.random.split(key, SCAN_STEPS)
        )
        return total

    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.randint(0, 256, (batch, size, size, 3), dtype=np.uint8)
    )
    img_s, per_batch = _timed(
        run_scan,
        (jax.device_put(variables), images, jax.random.PRNGKey(0)),
        batch,
    )
    return f"{label}, batch {batch})", img_s, per_batch


def _bench_randaugment_vitb16(batch, quantize=False):
    """BASELINE configs 1+2: per-image RandAugment(2,10) -> ViT-B/16 @224."""
    from chambers_tpu.augmentations import RandAugment
    from chambers_tpu.models.backbones import ViTB16

    return _augment_infer_bench(
        batch, model_builder=ViTB16, size=224,
        augment=RandAugment(n_transforms=2, magnitude=10, elementwise=True),
        label="images/sec/chip (per-image RandAugment(2,10)+ViT-B/16 bf16 "
              "infer, 224px", default_batch=32, quantize=quantize,
    )


def _bench_randaugment_vitb16_int8(batch):
    """Config 1 served through int8 dynamic PTQ (chambers_tpu.quantization):
    every Dense/MHA projection runs weights+activations int8 on the MXU's
    2x int8 rate; augmentation, normalize, softmax/LN/GELU stay bf16.
    Accuracy envelope: <=3% relative error per quantized block
    (tests/test_quantization.py) — the serving knob a user opts into."""
    return _bench_randaugment_vitb16(batch, quantize=True)


def _bench_autoaugment_vitl16_384(batch, quantize=False):
    """BASELINE config 3: fused AutoAugment -> ViT-L/16 @384, batch 128."""
    from chambers_tpu.augmentations import AutoAugment
    from chambers_tpu.models.backbones import ViTL16

    return _augment_infer_bench(
        batch, model_builder=ViTL16, size=384,
        augment=AutoAugment(elementwise=True),
        label="images/sec/chip (per-image AutoAugment+ViT-L/16 bf16 infer, "
              "384px", default_batch=128, quantize=quantize,
    )


def _bench_autoaugment_vitl16_384_int8(batch):
    """Config 3 served through int8 dynamic PTQ, same trade as the config-1
    int8 row (tools/bench_quantized_vit.py measured the bare ViT-L@384
    forward at 1.07x; the unquantized score/softmax/GELU share is larger at
    t=577 than at t=197, so the end-to-end win is smaller than config 1's)."""
    return _bench_autoaugment_vitl16_384(batch, quantize=True)


def _bench_metric_learning(batch):
    """BASELINE config 4: ViT embedder + MS miner + pair loss, batch 256
    (full training step: forward + loss + backward + AdamW)."""
    import jax
    import jax.numpy as jnp
    import optax

    from chambers_tpu.layers import l2_normalize
    from chambers_tpu.losses import MultiSimilarityLoss
    from chambers_tpu.models.backbones.vision_transformer import VisionTransformer
    from chambers_tpu.optimizers import AdamW

    batch = batch or 256
    vit = VisionTransformer(
        patch_size=16, patch_dim=384, n_encoder_layers=12, n_heads=6,
        ff_dim=1536, dropout_rate=0.0, include_top=False, pooling="cls",
        feature_dim=128, dtype=jnp.bfloat16, score_dtype=jnp.bfloat16,
    )  # ViT-S/16 embedder, full bf16 mixed precision (scores included)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 224, 224, 3), jnp.float32)
    labels = jnp.asarray(np.arange(batch) % (batch // 4))
    params = vit.init(jax.random.PRNGKey(0), x[:1])["params"]
    loss_fn = MultiSimilarityLoss()
    optimizer = AdamW(weight_decay=1e-4, learning_rate=1e-3,
                      decay_exclude=["bias", "norm"])
    opt_state = optimizer.init(params)

    @jax.jit
    def run_scan(params, opt_state, x, labels):
        def body(carry, _):
            params, opt_state = carry

            def loss_of(p):
                z = vit.apply({"params": p}, x, deterministic=True)
                return loss_fn(labels, l2_normalize(z, axis=-1))

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state2 = optimizer.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return (params2, opt_state2), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=SCAN_STEPS
        )
        return jnp.sum(losses)

    img_s, per_batch = _timed(
        run_scan,
        (jax.device_put(params), jax.device_put(opt_state), x, labels),
        batch,
    )
    return (
        "images/sec/chip (metric-learning train step: ViT-S/16 embed + MS "
        f"miner/loss + AdamW, 224px, batch {batch})", img_s, per_batch,
    )


def _bench_detr(batch):
    """BASELINE config 5: DETR train step (fwd + Hungarian-matching loss +
    bwd + AdamW) on a COCO-format synthetic batch.

    BENCH_DETR_MATCHER selects the assignment path:
      - "precomputed": assignment computed once outside the loop (isolates
        the model+loss compute; the host matcher cost is excluded)
      - "auction": device-side ε-auction inside the step (fully jittable —
        the deployable TPU path)
      - "callback": the exact host matcher via pure_callback inside the step
        (per-step host round-trip; the relay makes this the worst case)
    """
    import jax
    import jax.numpy as jnp
    import optax

    from chambers_tpu.losses.detection import DETRLoss
    from chambers_tpu.models.detection import build_detr
    from chambers_tpu.optimizers import AdamW

    matcher_mode = os.environ.get("BENCH_DETR_MATCHER", "auction")
    if matcher_mode not in ("precomputed", "auction", "callback"):
        raise ValueError(
            f"BENCH_DETR_MATCHER={matcher_mode!r}: use 'precomputed', "
            "'auction', or 'callback' (a typo would silently bench the "
            "worst-case callback path under a wrong label)"
        )
    batch = batch or 8
    num_classes, num_targets = 91, 20
    model = build_detr(num_classes=num_classes, input_shape=(224, 224, 3),
                       aux_loss=True, dtype=jnp.bfloat16)
    loss_fn = DETRLoss(
        num_classes=num_classes,
        matcher="auction" if matcher_mode == "auction" else "hungarian",
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 224, 224, 3), jnp.float32)
    targets = {
        "labels": jnp.asarray(rng.randint(0, num_classes,
                                          (batch, num_targets))),
        "boxes": jnp.asarray(rng.rand(batch, num_targets, 4), jnp.float32),
        "mask": jnp.asarray(
            rng.rand(batch, num_targets) < 0.6),  # ~12 real boxes/image
    }
    params = model.variables["params"]
    optimizer = AdamW(weight_decay=1e-4, learning_rate=1e-4,
                      decay_exclude=["bias", "norm"])
    opt_state = optimizer.init(params)

    precomputed = None
    if matcher_mode == "precomputed":
        outputs = model.apply_fn({"params": params}, x, deterministic=True)
        precomputed = loss_fn.match(outputs, targets)

    @jax.jit
    def run_scan(params, opt_state, x, targets, assignment):
        def body(carry, eps):
            params, opt_state = carry

            def loss_of(p):
                out = model.apply_fn({"params": p}, x + eps,
                                     deterministic=True)
                return loss_fn(out, targets, assignment=assignment)

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state2 = optimizer.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return (params2, opt_state2), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            1e-4 * jnp.arange(SCAN_STEPS, dtype=jnp.float32)[:, None, None,
                                                             None, None],
        )
        return jnp.sum(losses)

    img_s, per_batch = _timed(
        run_scan,
        (jax.device_put(params), jax.device_put(opt_state), x, targets,
         precomputed),
        batch,
    )
    return (
        "images/sec/chip (DETR train step: 6enc+6dec aux-loss set "
        f"prediction, matcher={matcher_mode}, 224px, batch {batch})",
        img_s, per_batch,
    )


CONFIGS = {
    "randaugment_vitb16_224": _bench_randaugment_vitb16,
    "randaugment_vitb16_224_int8": _bench_randaugment_vitb16_int8,
    "autoaugment_vitl16_384": _bench_autoaugment_vitl16_384,
    "autoaugment_vitl16_384_int8": _bench_autoaugment_vitl16_384_int8,
    "metric_learning": _bench_metric_learning,
    "detr": _bench_detr,
}


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    configs = [CONFIG]
    # The driver runs plain `python bench.py`: after the default bf16 line,
    # also measure + emit the int8-served config so the artifact records the
    # build's best end-to-end number (BASELINE.md int8 row) every round.
    if CONFIG == "randaugment_vitb16_224" and not QUANT:
        configs.append("randaugment_vitb16_224_int8")
    for cfg in configs:
        metric, img_s, per_batch = CONFIGS[cfg](BATCH)
        result = {
            "metric": metric,
            "value": round(img_s, 1),
            "unit": "img/s",
            # only the primary pipeline has a measured reference baseline
            # (the TF-CPU fused run, BASELINE.md); the int8 config is that
            # same pipeline served through PTQ, so the same baseline
            # applies. Other configs report null rather than a fabricated
            # cross-config ratio.
            "vs_baseline": (
                round(img_s / REFERENCE_IMG_S, 2)
                if cfg in ("randaugment_vitb16_224",
                           "randaugment_vitb16_224_int8") else None
            ),
            "p50_batch_latency_ms": round(per_batch * 1000, 2),
        }
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

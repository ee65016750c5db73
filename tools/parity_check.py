"""ViT pretrained-weight parity gate.

BASELINE.json north star: "max |logit Δ| < 1e-3 vs reference" on the released
chjort/chambers ViT weights (the tolerance of the reference's own
manual_test_vit_weights.py:341). This environment has no network egress, so
the gate runs whenever the weight files are present in the cache dir
(``CHAMBERS_TPU_WEIGHTS_DIR`` or ``~/.chambers_tpu/models``).

Usage:
    # 1. generate golden logits once wherever the reference can run:
    python tools/parity_check.py --model vitb16 --weights imagenet21k+_224 \
        --save-golden golden_vitb16.npz
    # 2. gate this build against them:
    python tools/parity_check.py --model vitb16 --weights imagenet21k+_224 \
        --golden golden_vitb16.npz
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

# model -> (preset fn name, input size, default released-weights spec)
PRESETS = {
    "vits16": ("ViTS16", 224, "imagenet_224_deit"),
    "vitb16": ("ViTB16", 224, "imagenet21k+_224"),
    "vitb32": ("ViTB32", 384, "imagenet21k+_384"),
    "vitl16": ("ViTL16", 224, "imagenet21k+_224"),
    "vitl32": ("ViTL32", 384, "imagenet21k+_384"),
    "deits16": ("DeiTS16", 224, "imagenet_224"),
    "deitb16": ("DeiTB16", 224, "imagenet_224"),
}


def deterministic_image(size: int) -> np.ndarray:
    """A fixed, content-rich test image (no downloads)."""
    y, x = np.mgrid[0:size, 0:size]
    r = ((x * 255) // size).astype(np.uint8)
    g = ((y * 255) // size).astype(np.uint8)
    b = (((x + y) * 255) // (2 * size)).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)[None]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="vitb16", choices=sorted(PRESETS))
    parser.add_argument("--weights", default=None,
                        help="released weight spec; defaults to the model's "
                             "canonical release")
    parser.add_argument("--golden", default=None,
                        help=".npz with 'logits' to compare against")
    parser.add_argument("--save-golden", default=None)
    parser.add_argument("--atol", type=float, default=1e-3)
    args = parser.parse_args()

    from chambers_tpu.augmentations import ImageNetNormalization
    from chambers_tpu.models.backbones import vision_transformer as vt

    preset_name, size, default_weights = PRESETS[args.model]
    weights = args.weights or default_weights
    builder = getattr(vt, preset_name)
    model = builder(weights=weights, input_shape=(size, size, 3))

    image = deterministic_image(size)
    x = np.asarray(ImageNetNormalization(mode="tf")(image))
    logits = model(x)
    if isinstance(logits, (list, tuple)):  # DeiT [cls, dist] heads
        logits = np.concatenate([np.asarray(l) for l in logits], axis=-1)
    else:
        logits = np.asarray(logits)

    top5 = np.argsort(-logits[0])[:5]
    report = {
        "model": args.model,
        "weights": weights,
        "logit_checksum": float(logits.sum()),
        "top5": top5.tolist(),
        "top5_logits": logits[0][top5].round(4).tolist(),
    }

    if args.save_golden:
        np.savez(args.save_golden, logits=logits)
        report["saved_golden"] = args.save_golden

    if args.golden:
        golden = np.load(args.golden)["logits"]
        max_delta = float(np.abs(logits - golden).max())
        report["max_abs_delta"] = max_delta
        report["parity"] = "PASS" if max_delta < args.atol else "FAIL"
        print(json.dumps(report, indent=2))
        sys.exit(0 if max_delta < args.atol else 1)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

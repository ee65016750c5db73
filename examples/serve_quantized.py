"""Serving example: int8-quantize a trained model and export one artifact.

The deployment path beyond the reference's SavedModel-at-train-end
(/root/reference/chambers/callbacks.py:103): quantize the variables with
dynamic PTQ (no calibration data), verify the accuracy envelope against the
float model on a held-out batch, then bake everything into a single AOT
StableHLO artifact that loads with no model code.

    python examples/serve_quantized.py            # full ViT-B/16
    python examples/serve_quantized.py --image-size 32 --patch-size 8 \
        --dim 64 --layers 2 --heads 4 --ff 128      # tiny smoke run

On a v5e chip the int8 path serves ViT-B/16 @224 at 1.13x the bf16 rate
(BASELINE.md "Int8 serving quantization").
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from chambers_tpu.models.backbones.vision_transformer import VisionTransformer
from chambers_tpu.models.model import Model
from chambers_tpu.quantization import quantize_variables
from chambers_tpu.serving import export_serving_artifact, load_serving_artifact


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--patch-size", type=int, default=16)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--ff", type=int, default=3072)
    p.add_argument("--out", default="/tmp/vit_int8.stablehlo")
    args = p.parse_args()

    # in production: a trained/pretrained model (e.g. ViTB16(weights=...))
    module = VisionTransformer(
        patch_size=args.patch_size, patch_dim=args.dim,
        n_encoder_layers=args.layers, n_heads=args.heads, ff_dim=args.ff,
        dropout_rate=0.0, dtype=jnp.bfloat16, score_dtype=jnp.bfloat16,
    )
    shape = (args.image_size, args.image_size, 3)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1,) + shape),
                            deterministic=True)
    model = Model(module, variables)

    # 1. quantize: Dense kernels + MHA projections -> int8 (checkpoint-shaped
    #    tree + a "quant" collection of per-channel scales)
    qvars = jax.jit(quantize_variables)(model.variables)

    # 2. verify the accuracy envelope before shipping
    x = jnp.asarray(np.random.RandomState(0).rand(4, *shape), jnp.float32)
    ref = module.apply(model.variables, x, deterministic=True)
    got = module.apply(qvars, x, deterministic=True)
    rel = float(jnp.linalg.norm((got - ref).astype(jnp.float32))
                / jnp.linalg.norm(ref.astype(jnp.float32)))
    print(f"relative logit error vs float: {rel:.4f}")

    # 3. export ONE self-contained artifact (symbolic batch dim)
    model.variables = qvars
    n = export_serving_artifact(model, args.out, input_shape=shape)
    print(f"wrote {args.out} ({n / 1e6:.1f} MB)")

    # 4. serve from the artifact alone
    serve = load_serving_artifact(args.out)
    print("served logits shape:", np.asarray(serve(np.asarray(x))).shape)


if __name__ == "__main__":
    main()

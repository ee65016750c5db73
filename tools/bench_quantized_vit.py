"""Quantized (int8 dynamic PTQ) vs bf16 ViT serving throughput on the chip.

Measures the end-to-end forward pass of ViT-B/16@224 (batch 32) and
ViT-L/16@384 (batch 128) in three modes: f32, bf16, and int8-quantized
variables (chambers_tpu.quantization) over the bf16 module. Timing follows
CLAUDE.md: per-step-varying input inside a lax.scan + scalar checksum.

Run:  nohup python tools/bench_quantized_vit.py > /tmp/quant_vit.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from chambers_tpu.quantization import quantize_variables

STEPS = 20


def bench(model_builder, size, batch, label, steps=STEPS):
    print(f"== {label} (batch {batch}, {size}px) ==", flush=True)
    rows = {}
    for mode in ("bf16", "int8"):
        # same flags as bench.py's configs 1/3 (bf16 pipeline incl. scores)
        model = model_builder(weights=None, input_shape=(size, size, 3),
                              dtype=jnp.bfloat16, score_dtype=jnp.bfloat16)
        variables = model.variables
        if mode == "int8":
            variables = jax.jit(quantize_variables)(variables)
        x = jax.random.normal(jax.random.PRNGKey(0),
                              (batch, size, size, 3), jnp.bfloat16)
        eps = jnp.arange(steps, dtype=jnp.bfloat16) * 1e-3

        def run(v, x):
            def step(carry, e):
                y = model.module.apply(v, x + e, deterministic=True)
                return carry + jnp.sum(y.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), eps)
            return acc

        run_c = jax.jit(run)
        float(run_c(variables, x))  # compile + warm
        t0 = time.perf_counter()
        float(run_c(variables, x))
        dt = (time.perf_counter() - t0) / steps
        rows[mode] = dt
        print(f"  {mode}: {dt * 1e3:.2f} ms/batch  {batch / dt:.1f} img/s",
              flush=True)
    speedup = rows["bf16"] / rows["int8"]
    print(f"  int8 speedup vs bf16: {speedup:.2f}x", flush=True)


if __name__ == "__main__":
    from chambers_tpu.models.backbones import ViTB16, ViTL16

    print("devices:", jax.devices(), flush=True)
    bench(ViTB16, 224, 32, "ViT-B/16")
    bench(ViTL16, 384, 128, "ViT-L/16")

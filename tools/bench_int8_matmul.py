"""Microbenchmark: int8 MXU matmul vs bf16 at ViT shapes (v5e).

Decides whether a dynamic-quantization (int8 weights + per-token int8
activations) serving path is worth building: v5e's MXU lists ~2x int8
throughput over bf16, but the quantize/dequantize epilogues ride the VPU
and could eat the win at ViT-sized matmuls.

Timing per CLAUDE.md: lax.scan whose input varies per step + scalar
checksum fetch (the relay's block_until_ready is unreliable).

Run:  nohup python tools/bench_int8_matmul.py > /tmp/int8_bench.log 2>&1 &
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 30


def _time(fn, *args):
    fn_c = jax.jit(fn)
    out = fn_c(*args)  # compile
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = fn_c(*args)
    cs = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / STEPS
    return dt, cs


def scan_loop(body):
    def run(x, *rest):
        eps = jnp.arange(STEPS, dtype=jnp.int32)

        def step(carry, e):
            # vary the input EVERY step regardless of dtype, or XLA hoists
            # the whole matmul out of the loop (CLAUDE.md benchmark pitfall;
            # int8 wraps on overflow, which is fine for timing)
            xv = x + e.astype(x.dtype)
            y = body(xv, *rest)
            return carry + jnp.sum(y, dtype=jnp.float32).astype(jnp.float32), None

        acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), eps)
        return acc

    return run


def bench_shape(M, K, N):
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x_bf = jax.random.normal(kx, (M, K), jnp.bfloat16)
    w_bf = jax.random.normal(kw, (K, N), jnp.bfloat16)
    x_i8 = jax.random.randint(kx, (M, K), -127, 128, jnp.int8)
    w_i8 = jax.random.randint(kw, (K, N), -127, 128, jnp.int8)
    w_scale = jnp.ones((N,), jnp.float32)

    def mm_bf16(x, w):
        # bf16 epilogue, like the in-model kOutput fusions
        return jax.lax.dot(x, w, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

    def mm_i8(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.bfloat16)

    def mm_dynq(x, w_q, s_w):
        # full dynamic-quant pipeline: per-row absmax -> int8 dot -> rescale
        s_x = jnp.max(jnp.abs(x).astype(jnp.float32), axis=-1, keepdims=True)
        s_x = jnp.maximum(s_x / 127.0, 1e-8)
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127
                       ).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_q, w_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * s_x * s_w).astype(jnp.bfloat16)

    flops = 2 * M * K * N * STEPS
    rows = []
    for name, fn, args in (
        ("bf16", mm_bf16, (x_bf, w_bf)),
        ("int8-raw", mm_i8, (x_i8, w_i8)),
        ("dynq-bf16in", mm_dynq, (x_bf, w_i8, w_scale)),
    ):
        dt, _ = _time(scan_loop(fn), *args)
        rows.append((name, dt * 1e3 * STEPS, flops / dt / STEPS / 1e12))
    print(f"[{M}x{K}x{N}]")
    for name, ms, tf in rows:
        print(f"  {name:12s} {ms/STEPS:7.3f} ms  {tf:7.1f} TFLOP/s(eff)")
    return rows


if __name__ == "__main__":
    print("devices:", jax.devices())
    # ViT-B/16 @224 b32 MLP shapes; @384 b128 ViT-L shapes; square
    for shape in ((6304, 768, 3072), (6304, 3072, 768),
                  (6304, 768, 768),
                  (73856, 1024, 4096),
                  (8192, 8192, 8192)):
        bench_shape(*shape)

"""Flash attention vs XLA dense attention across sequence lengths.

VERDICT r1 weak #4: at ViT lengths (t<=578) XLA's dense attention is as fast
as the Pallas kernel, so the kernel needs a demonstrated win regime or a
demotion note. This sweeps t in {512..8192} for forward and forward+backward
(the regime where dense attention must keep the [t, t] probability matrix
alive for the VJP — the HBM-pressure case flash attention exists for) and
records ms/step. Results land in BASELINE.md.

Timing per CLAUDE.md: lax.scan + scalar checksum fetch on the real chip.
"""

import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chambers_tpu.ops.flash_attention import flash_attention

STEPS = 10
REPEATS = 3
HEAD_DIM = 64


def dense_attention(q, k, v, scale):
    s = jnp.einsum("bnqh,bnkh->bnqk", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bnqk,bnkh->bnqh", p, v)


def timed(fn, args, label):
    jfn = jax.jit(fn)
    try:
        out = float(jfn(*args))
    except Exception as e:  # OOM at long lengths is a *result* here
        print(f"{label:48s} FAILED: {type(e).__name__}: {str(e)[:90]}")
        return None
    assert np.isfinite(out)
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(jfn(*args))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / STEPS * 1e3
    print(f"{label:48s} {ms:9.2f} ms/step")
    return ms


def bench_length(t):
    """batch*heads chosen so total tokens stay ~64k across lengths — the
    attention FLOPs then scale linearly with t and fixed costs don't drown
    the short-t rows."""
    bn = max(4, 65536 // t)
    scale = 1.0 / math.sqrt(HEAD_DIM)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    shape = (bn // 4 if bn >= 4 else 1, 4, t, HEAD_DIM)  # [b, n, t, h]
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)

    results = {}
    # per-step q perturbation: with loop-invariant inputs XLA hoists the
    # whole attention computation out of the scan and the timing is bogus
    eps = jnp.linspace(0.0, 1e-2, STEPS, dtype=jnp.float32)

    def scan_of(f):
        def run(q, k, v):
            def body(c, e):
                qe = q + e.astype(q.dtype)
                return c + jnp.sum(f(qe, k, v).astype(jnp.float32)), None
            tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), eps)
            return tot
        return run

    def grad_scan_of(f):
        def run(q, k, v):
            def body(c, e):
                qe = q + e.astype(q.dtype)
                g = jax.grad(
                    lambda q: jnp.sum(f(q, k, v).astype(jnp.float32))
                )(qe)
                return c + jnp.sum(g.astype(jnp.float32)), None
            tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), eps)
            return tot
        return run

    dense = lambda q, k, v: dense_attention(q, k, v, scale)

    def flash_of(bq, bk):
        return lambda q, k, v: flash_attention(q, v, k, causal=False,
                                               block_q=bq, block_k=bk)

    results["dense_fwd"] = timed(scan_of(dense), (q, k, v),
                                 f"t={t:5d} dense fwd")
    results["dense_fwdbwd"] = timed(grad_scan_of(dense), (q, k, v),
                                    f"t={t:5d} dense fwd+bwd")
    for bq, bk in ((128, 128), (256, 512), (512, 512)):
        if bq > t:
            continue
        results[f"flash_fwd_{bq}x{bk}"] = timed(
            scan_of(flash_of(bq, bk)), (q, k, v),
            f"t={t:5d} flash fwd  (bq={bq}, bk={bk})")
        results[f"flash_fwdbwd_{bq}x{bk}"] = timed(
            grad_scan_of(flash_of(bq, bk)), (q, k, v),
            f"t={t:5d} flash fwd+bwd (bq={bq}, bk={bk})")
    return results


def main():
    print(f"devices: {jax.devices()}")
    for t in (512, 1024, 2048, 4096, 8192):
        bench_length(t)
        print()


if __name__ == "__main__":
    main()

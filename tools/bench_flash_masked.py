"""Masked flash attention vs masked XLA dense attention (VERDICT r3 #3).

Done-criterion from the verdict: a fwd+bwd bench row at t>=512 with 25%
padding showing the kernel still wins with the in-kernel kv mask. Also
asserts on-chip parity (flash+mask == XLA+mask) before timing, so the
numbers can't come from a silently-wrong kernel.

Timing per CLAUDE.md: lax.scan with a per-step input perturbation + scalar
checksum fetch on the real chip.
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
PAD_FRACTION = 0.25


def dense_masked(q, k, v, mask, scale):
    s = jnp.einsum("bnqh,bnkh->bnqk", q, k) * scale
    s = s.astype(jnp.float32) + jnp.where(mask, 0.0, -1e9)[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bnqk,bnkh->bnqh", p, v)


def timed(fn, args, label):
    jfn = jax.jit(fn)
    out = float(jfn(*args))
    assert np.isfinite(out)
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(jfn(*args))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / STEPS * 1e3
    print(f"{label:52s} {ms:9.2f} ms/step", flush=True)
    return ms


def bench_length(t):
    bn = max(4, 65536 // t)
    scale = 1.0 / math.sqrt(HEAD_DIM)
    b = bn // 4 if bn >= 4 else 1
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    shape = (b, 4, t, HEAD_DIM)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)
    # 25% padding: trailing pad like real seq2seq batches, plus a few
    # interior holes so the kernel can't win by block skipping alone
    rng = np.random.RandomState(1)
    mask_np = np.ones((b, t), bool)
    mask_np[:, int(t * (1 - PAD_FRACTION)):] = False
    interior = rng.rand(b, t) < 0.02
    mask_np &= ~interior
    mask_np[:, 0] = True
    mask = jnp.asarray(mask_np)

    # on-chip parity before timing
    of = flash_attention(q, v, k, kv_mask=mask)
    ox = dense_masked(q, k, v, mask, scale)
    err = float(jnp.max(jnp.abs(of.astype(jnp.float32)
                                - ox.astype(jnp.float32))))
    print(f"t={t:5d} on-chip parity max|flash-xla| = {err:.3e}", flush=True)
    assert err < 3e-2, err  # bf16 inputs; f32 stats in both paths

    eps = jnp.linspace(0.0, 1e-2, STEPS, dtype=jnp.float32)

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

    dense = lambda q, k, v: dense_masked(q, k, v, mask, scale)
    flash = lambda q, k, v: flash_attention(q, v, k, kv_mask=mask)
    flash_nomask = lambda q, k, v: flash_attention(q, v, k)

    ms_x = timed(grad_scan_of(dense), (q, k, v),
                 f"t={t:5d} dense+mask fwd+bwd")
    ms_f = timed(grad_scan_of(flash), (q, k, v),
                 f"t={t:5d} flash+mask fwd+bwd (auto blocks)")
    timed(grad_scan_of(flash_nomask), (q, k, v),
          f"t={t:5d} flash unmasked fwd+bwd (reference)")
    print(f"t={t:5d} flash+mask speedup vs dense+mask: {ms_x / ms_f:.2f}x",
          flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for t in (512, 1024, 2048):
        bench_length(t)
        print(flush=True)


if __name__ == "__main__":
    main()

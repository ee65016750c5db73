"""Repro for the TPU-backend fori_loop buffer-aliasing miscompile.

On the axon-relay TPU backend (v5e), a ``lax.fori_loop`` whose body
dynamic-update-slices a carried buffer and then READS that buffer through a
matmul in the same iteration returns garbage for the freshly written (and
sometimes older) slots — the numbers match neither read-after-write nor
read-before-write semantics. The identical body under ``lax.scan`` is exact,
as is CPU under either construct. This is why every decode loop in
``chambers_tpu/models/generation.py`` uses ``lax.scan``
(``_scan_steps``) rather than ``fori_loop``.

Observed (2026-08-18, jax on the relay chip), max |delta| vs a NumPy
reference of the accumulated per-step scores:

    B=1 N=1 fori: 8.07     B=1 N=1 scan: 0.0
    B=1 N=4 fori: 29.55    B=1 N=4 scan: 1e-05
    B=4 N=1 fori: 24.28    B=4 N=1 scan: 0.0
    B=4 N=4 fori: 37.30    B=4 N=4 scan: 1e-05

Run:  python tools/diagnose_fori_loop_aliasing.py        (real TPU)
      PLATFORM=cpu python tools/diagnose_fori_loop_aliasing.py
"""
import os

import jax

if os.environ.get("PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PLATFORM"])
import jax.numpy as jnp
import numpy as np

T, H = 8, 16


def make(B, N, loop):
    @jax.jit
    def run(k_all):
        kbuf = jnp.zeros_like(k_all)
        acc = jnp.zeros((B, N, 1, T), jnp.float32)

        def step(kbuf, acc, i):
            ki = jax.lax.dynamic_slice_in_dim(k_all, i, 1, 2)
            kbuf = jax.lax.dynamic_update_slice_in_dim(kbuf, ki, i, axis=2)
            # the read-after-write the miscompile corrupts:
            s = jnp.einsum("bnqh,bnkh->bnqk", ki, kbuf,
                           preferred_element_type=jnp.float32)
            return kbuf, acc + s

        if loop == "fori":
            _, acc = jax.lax.fori_loop(
                0, T, lambda i, c: step(c[0], c[1], i), (kbuf, acc))
        else:
            (_, acc), _ = jax.lax.scan(
                lambda c, i: (step(c[0], c[1], i), None),
                (kbuf, acc), jnp.arange(T))
        return acc

    return run


def ref(k):
    k = np.asarray(k)
    B, N = k.shape[0], k.shape[1]
    acc = np.zeros((B, N, 1, T), np.float32)
    kb = np.zeros_like(k)
    for i in range(T):
        kb[:, :, i] = k[:, :, i]
        acc += np.einsum("bnqh,bnkh->bnqk", k[:, :, i:i + 1], kb)
    return acc


if __name__ == "__main__":
    print("platform", jax.default_backend())
    rng = np.random.default_rng(1)
    for B, N in [(1, 1), (1, 4), (4, 1), (4, 4)]:
        k_all = jnp.asarray(rng.normal(size=(B, N, T, H)), jnp.float32)
        r = ref(k_all)
        for loop in ["fori", "scan"]:
            out = np.asarray(make(B, N, loop)(k_all))
            print(f"B={B} N={N} {loop}: max|delta| "
                  f"{np.abs(out - r).max():.5f}")

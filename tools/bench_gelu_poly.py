"""A/B: exact-erf GELU vs a branch-free Chebyshev erf (NEGATIVE RESULT).

Hypothesis: BASELINE.md pins exact-erf GELU at ~15% of the ViT forward
(the ``gelu_approximate=True`` trade), and XLA's f32 erf is branchy
(rational polynomial, an exp-based erfc tail, divisions) — so a single
odd Chebyshev series over [0, 3.92] (degree-16 in t², Clenshaw recurrence;
f32 erf saturates to ±1 beyond |t| = 3.9192, so one sign select covers the
rest) should be cheaper while staying in the same error class as XLA's erf
(2.2e-7 vs 2.5e-7 max abs error measured on this chip; exhaustive
bf16-grid deviation from the erf path 7.7e-6 absolute).

Measured on v5e (2026-08-20, ViT-B/16 bf16 fwd @224 b32, fold-normalized,
scan-timed with a scalar fetch):

    erf (default):       9.76 ms/batch = 3277 img/s
    chebyshev erf:      11.43 ms/batch = 2800 img/s   (0.85x — SLOWER)
    tanh approx:         9.01 ms/batch = 3553 img/s   (1.08x)

Why it loses: the TPU VPU has hardware-accelerated transcendentals — exp
and tanh are near-single-op, so XLA's erfc tail is essentially free and
``approximate=True`` only buys 8%, not the 15% a software-cost model
predicts. A 33-FMA serial Clenshaw chain cannot beat a hardware erf
pipeline. Numerics notes that remain valid: the monomial Horner form of
the same series loses 5.5e-3 to cancellation at t² up to 15.4 (Clenshaw
is the stable evaluation), and XLA TPU's excess-precision folding elides
f32→bf16→f32 convert pairs, so bf16 saturation tricks that hold on CPU
do not hold on TPU.

Kept as the recorded experiment so later rounds don't re-derive it.
Run on the chip:  python tools/bench_gelu_poly.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 20
REPEATS = 5

# Chebyshev coefficients of erf(t)/t in u = 2 t^2 / B^2 - 1 over [0, B=3.92].
CHEB = np.array([
    4.9249186208e-01, -3.4622318198e-01, 1.6004671888e-01,
    -7.4404293219e-02, 3.3077631545e-02, -1.3821422004e-02,
    5.3925940226e-03, -1.9607876110e-03, 6.6468034527e-04,
    -2.1038890316e-04, 6.2318265059e-05, -1.7315475497e-05,
    4.5258993920e-06, -1.1144772532e-06, 2.6047928600e-07,
    -5.6458078318e-08, 1.3177430731e-08], np.float32)
_B = 3.92


def erf_chebyshev(t):
    """erf via one odd Chebyshev series (f32 Clenshaw), sign-saturated
    beyond |t| = B where f32 erf is exactly ±1."""
    tf = t.astype(jnp.float32)
    tc = jnp.clip(tf, -_B, _B)
    u = (2.0 / (_B * _B)) * (tc * tc) - 1.0
    two_u = 2.0 * u
    b1 = jnp.zeros_like(u)
    b2 = jnp.zeros_like(u)
    for ck in CHEB[:0:-1]:
        b1, b2 = two_u * b1 - b2 + ck, b1
    e = tc * (u * b1 - b2 + CHEB[0])
    e = jnp.where(jnp.abs(tf) >= _B, jnp.sign(tf), e)
    return e.astype(t.dtype)


def timed(fn, *args):
    # fetch the scalar: the relay's block_until_ready is unreliable
    # (CLAUDE.md) — only a value fetch guarantees completion
    assert np.isfinite(float(fn(*args)))
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / STEPS


def bench_vit(label, **vit_kwargs):
    from chambers_tpu.models.backbones import ViTB16, fold_imagenet_normalization

    model = ViTB16(weights=None, input_shape=(224, 224, 3),
                   dtype=jnp.bfloat16, score_dtype=jnp.bfloat16, **vit_kwargs)
    variables = fold_imagenet_normalization(model.variables, mode="tf")

    @jax.jit
    def run(variables, images, eps):
        def body(carry, e):
            logits = model.apply_fn(
                variables, jnp.bitwise_xor(images, e), deterministic=True)
            return carry + jnp.sum(logits), None

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), eps)
        return total

    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.randint(0, 256, (32, 224, 224, 3), dtype=np.uint8))
    eps = jax.device_put(
        rng.randint(0, 2, (STEPS, 1, 1, 1, 3), dtype=np.uint8))
    dt = timed(run, jax.device_put(variables), images, eps)
    print(f"{label}: {dt*1e3:.2f} ms/batch = {32/dt:.1f} img/s", flush=True)
    return dt


if __name__ == "__main__":
    import chambers_tpu.activations as A
    import chambers_tpu.layers.transformer as T

    print("devices:", jax.devices(), flush=True)
    base = bench_vit("erf (default)")

    orig = A.gelu

    def gelu_cheb(x, approximate=False):
        if approximate:
            return orig(x, approximate=True)
        return 0.5 * x * (1.0 + erf_chebyshev(x / jnp.asarray(A._SQRT_2,
                                                              x.dtype)))

    T.gelu = gelu_cheb
    A.gelu = gelu_cheb
    try:
        cheb = bench_vit("chebyshev erf (clenshaw deg16)")
    finally:
        T.gelu = orig
        A.gelu = orig
    approx = bench_vit("tanh approx", gelu_approximate=True)
    print(f"cheb vs erf: {base/cheb:.3f}x   tanh vs erf: {base/approx:.3f}x",
          flush=True)

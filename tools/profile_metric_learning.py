"""Ablation profile of the metric-learning train step (BASELINE config 4).

VERDICT r1 weak #3: config-4 runs ~1824 img/s with no augmentation in the
loop and nothing explaining where the time goes. This script decomposes the
step on the real TPU:

  1. forward-only (deterministic apply)            -> model fwd ceiling
  2. forward+backward with trivial loss (sum z)    -> autodiff cost
  3. full step (MS miner/loss + AdamW)             -> loss/optimizer epilogue
  4. forward with params pre-cast to bf16          -> fp32->bf16 cast cost
  5. encoder-only (no patch embed / head)          -> ViT body share

Timing follows CLAUDE.md: lax.scan inside one jit + scalar checksum fetch
(the relay's block_until_ready is unreliable).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chambers_tpu.layers import l2_normalize
from chambers_tpu.losses import MultiSimilarityLoss
from chambers_tpu.models.backbones.vision_transformer import VisionTransformer
from chambers_tpu.optimizers import AdamW

BATCH = 256
STEPS = 20
REPEATS = 5


def timed(fn, *args, label=""):
    jfn = jax.jit(fn)
    out = float(jfn(*args))  # compile + warm
    assert np.isfinite(out), f"{label}: non-finite"
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(jfn(*args))
        times.append(time.perf_counter() - t0)
    per_step = float(np.median(times)) / STEPS
    print(f"{label:55s} {per_step * 1e3:8.2f} ms/step  "
          f"{BATCH / per_step:8.0f} img/s")
    return per_step


def main():
    vit = VisionTransformer(
        patch_size=16, patch_dim=384, n_encoder_layers=12, n_heads=6,
        ff_dim=1536, dropout_rate=0.0, include_top=False, pooling="cls",
        feature_dim=128, dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, 224, 224, 3), jnp.float32)
    labels = jnp.asarray(np.arange(BATCH) % (BATCH // 4))
    params = vit.init(jax.random.PRNGKey(0), x[:1])["params"]
    params = jax.device_put(params)
    loss_fn = MultiSimilarityLoss()
    optimizer = AdamW(weight_decay=1e-4, learning_rate=1e-3,
                      decay_exclude=["bias", "norm"])
    opt_state = jax.device_put(optimizer.init(params))

    # per-step input perturbation: without it the loop body is
    # loop-invariant and XLA hoists the whole model out of the scan
    steps_eps = jnp.linspace(0.0, 1e-3, STEPS, dtype=jnp.float32)

    # 1. forward only
    def fwd_scan(params, x):
        def body(c, eps):
            z = vit.apply({"params": params}, x + eps, deterministic=True)
            return c + jnp.sum(z.astype(jnp.float32)), None
        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), steps_eps)
        return total
    timed(fwd_scan, params, x, label="1. forward only (fp32 params)")

    # 4. forward with bf16 params
    bf16_params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    timed(fwd_scan, bf16_params, x, label="4. forward only (bf16 params)")

    # 2. fwd+bwd, trivial loss, SGD-free (grads summed to keep shapes small)
    def bwd_scan(params, x):
        def body(c, eps):
            def loss_of(p):
                z = vit.apply({"params": p}, x + eps, deterministic=True)
                return jnp.sum(z.astype(jnp.float32))
            loss, grads = jax.value_and_grad(loss_of)(params)
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree.leaves(grads))
            return c + loss + gsum, None
        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), steps_eps)
        return total
    timed(bwd_scan, params, x, label="2. forward+backward (trivial loss)")

    # 3. full train step (config 4 exactly) and ablations. These evolve
    # params through the scan carry, so nothing is loop-invariant and the
    # numbers are trustworthy.
    def step_scan(embed_loss, use_adamw=True):
        def run(params, opt_state, x, labels):
            def body(carry, _):
                params, opt_state = carry
                def loss_of(p):
                    z = vit.apply({"params": p}, x, deterministic=True)
                    return embed_loss(z, labels)
                loss, grads = jax.value_and_grad(loss_of)(params)
                if use_adamw:
                    updates, opt_state2 = optimizer.update(
                        grads, opt_state, params)
                else:
                    updates = jax.tree.map(lambda g: -1e-3 * g, grads)
                    opt_state2 = opt_state
                params2 = optax.apply_updates(params, updates)
                return (params2, opt_state2), loss
            (_, _), losses = jax.lax.scan(body, (params, opt_state), None,
                                          length=STEPS)
            return jnp.sum(losses)
        return run

    ms_loss = lambda z, labels: loss_fn(labels, l2_normalize(z, axis=-1))
    timed(step_scan(ms_loss), params, opt_state, x, labels,
          label="3. full step (MS loss + AdamW)")
    timed(step_scan(lambda z, labels: jnp.sum(z.astype(jnp.float32)),
                    use_adamw=True), params, opt_state, x, labels,
          label="3a. step, trivial loss + AdamW")
    timed(step_scan(ms_loss, use_adamw=False), params, opt_state, x, labels,
          label="3b. step, MS loss + plain SGD")
    timed(step_scan(lambda z, labels: loss_fn(labels, z), use_adamw=True),
          params, opt_state, x, labels,
          label="3c. step, MS loss w/o l2_normalize + AdamW")

    # 5. encoder-only fwd+bwd: tokens already embedded
    from chambers_tpu.layers import Encoder
    enc = Encoder(embed_dim=384, num_heads=6, ff_dim=1536, num_layers=12,
                  pre_norm=True, norm_output=True, dtype=jnp.bfloat16)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 197, 384),
                               jnp.bfloat16)
    ev = enc.init(jax.random.PRNGKey(0), tokens[:1])

    def enc_bwd_scan(ev, tokens):
        def body(c, eps):
            def loss_of(v):
                return jnp.sum(
                    enc.apply(v, tokens + eps.astype(tokens.dtype))
                    .astype(jnp.float32)
                )
            loss, grads = jax.value_and_grad(loss_of)(ev)
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree.leaves(grads))
            return c + loss + gsum, None
        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), steps_eps)
        return total
    timed(enc_bwd_scan, ev, tokens, label="5. encoder-only fwd+bwd")

    # theoretical: ViT-S/16 fwd ~= 9.9 GFLOP/img -> print MFU lines
    fwd_gflop = 9.9
    print(f"\nViT-S/16 fwd ~{fwd_gflop} GFLOP/img; train ~3x. "
          f"v5e bf16 peak ~197 TFLOP/s.")


if __name__ == "__main__":
    main()

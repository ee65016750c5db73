"""MoE ViT cost model: dense MLP vs top-1 vs top-2 routing, fwd and train.

The MoE stack (chambers_tpu.layers.moe) is a beyond-reference capability
(SURVEY.md §2.8 EP row — the reference is a single-device Keras library
with no MoE), so there is no reference number to beat; this tool records
the *cost of routing* instead: a ViT-S/16 @224 with every other MLP routed
should pay a bounded dispatch overhead over the dense model while carrying
~2-4x the MLP parameters. Run on the real TPU chip:

    python tools/bench_moe.py            # forward, batch 32
    MODE=train python tools/bench_moe.py # full train step (grad + SGD)

Timing per CLAUDE.md: lax.scan with a per-step input perturbation + scalar
checksum fetch (the relay's block_until_ready is unreliable; loop-invariant
bodies get hoisted).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the sitecustomize-registered TPU plugin ignores a JAX_PLATFORMS env set
# at launch; only the config update reroutes (see CLAUDE.md gotchas)
if os.environ.get("PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PLATFORM"])

import jax.numpy as jnp

from chambers_tpu.layers.moe import moe_aux_loss
from chambers_tpu.models.backbones.vision_transformer import VisionTransformer

STEPS = int(os.environ.get("STEPS", "10"))
REPEATS = int(os.environ.get("REPEATS", "3"))
BATCH = int(os.environ.get("BATCH", "32"))
MODE = os.environ.get("MODE", "forward")  # forward | train
# CPU smoke knobs (the real measurement uses the defaults on the TPU)
LAYERS = int(os.environ.get("LAYERS", "12"))
SIZE = int(os.environ.get("SIZE", "224"))


def build(**moe):
    return VisionTransformer(
        patch_size=16, patch_dim=384, n_encoder_layers=LAYERS, n_heads=6,
        ff_dim=1536, dropout_rate=0.0, include_top=False, pooling="cls",
        dtype=jnp.bfloat16, **moe,
    )


def n_params(variables):
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(variables))


def timed_scan(step_fn, init, eps, *args):
    """``args`` (e.g. params) ride as jit ARGUMENTS, not closure constants —
    closed-over arrays get baked into the serialized program and a 70M-param
    model blows the relay's remote-compile request-size limit (HTTP 413)."""
    f = jax.jit(
        lambda init, eps, *a: jax.lax.scan(
            lambda c, e: step_fn(c, e, *a), init, eps
        )[0]
    )
    def fetch(out):
        # scalar checksum fetch (completion barrier that works on the relay)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))

    fetch(f(init, eps, *args))  # compile + fetch
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        fetch(f(init, eps, *args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / STEPS


def main():
    x = jax.random.normal(jax.random.PRNGKey(7), (BATCH, SIZE, SIZE, 3),
                          jnp.bfloat16)
    eps = 0.01 * jax.random.normal(
        jax.random.PRNGKey(1), (STEPS,) + x.shape, jnp.bfloat16
    )
    variants = [
        ("dense", {}),
        ("moe_top1_e8", dict(moe_every_n=2, moe_n_experts=8)),
        ("moe_top2_e8", dict(moe_every_n=2, moe_n_experts=8,
                             moe_n_selected_experts=2)),
    ]
    print(f"platform={jax.default_backend()} mode={MODE} batch={BATCH}",
          flush=True)
    base_ms = None
    for name, moe in variants:
        m = build(**moe)
        v = m.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16))

        if MODE == "forward":
            def step(c, e, vv, m=m):
                y = m.apply(vv, x + e)
                return c + jnp.sum(y.astype(jnp.float32)), None

            ms = timed_scan(step, jnp.float32(0), eps, v) * 1e3
        else:
            params = v["params"]

            def step(params, e, m=m):
                def loss_of(p):
                    out, st = m.apply({"params": p}, x + e,
                                      mutable=["intermediates"])
                    # the dense variant sows nothing -> key absent
                    return (jnp.mean(out.astype(jnp.float32) ** 2)
                            + moe_aux_loss(st.get("intermediates", {})))

                g = jax.grad(loss_of)(params)
                return jax.tree.map(lambda p, gi: p - 1e-3 * gi, params, g), None

            ms = timed_scan(step, params, eps) * 1e3

        base_ms = base_ms or ms
        print(f"{name}: params={n_params(v)/1e6:6.1f}M  {ms:7.2f} ms/step "
              f"({BATCH / ms * 1e3:6.0f} img/s, {ms / base_ms:4.2f}x dense)",
              flush=True)


if __name__ == "__main__":
    main()

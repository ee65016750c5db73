"""Padded seq2seq train step: attention_impl='flash' vs 'xla' on-chip.

End-to-end payoff of the masked flash kernel (VERDICT r3 next #3): a full
Seq2SeqTransformer training step (CE loss + AdamW backward) on batches with
25% token padding, at encoder/decoder lengths where the kernel's fwd+bwd
win lives (t >= 512). attention dropout must be 0 for the kernel path (the
layer falls back to XLA with dropout, by design).

Timing per CLAUDE.md: lax.scan + per-step input variation + scalar fetch.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chambers_tpu.models import Seq2SeqTransformer

STEPS = 5
REPEATS = 3
VOCAB = 1024
T = int(os.environ.get("T", "512"))
BATCH = int(os.environ.get("BATCH", "16"))
DIM = 512
HEADS = 8
LAYERS = 4


def build(impl):
    return Seq2SeqTransformer(
        input_vocab_size=VOCAB, output_vocab_size=VOCAB, embed_dim=DIM,
        num_heads=HEADS, dim_feedforward=DIM * 4,
        num_encoder_layers=LAYERS, num_decoder_layers=LAYERS,
        dropout_rate=0.0, dtype=jnp.bfloat16, attention_impl=impl,
    )


def main():
    print(f"devices: {jax.devices()}  t={T} b={BATCH} d={DIM} "
          f"L={LAYERS}enc+{LAYERS}dec", flush=True)
    rng = np.random.RandomState(0)
    src = rng.randint(1, VOCAB, (BATCH, T)).astype(np.int32)
    tgt = rng.randint(1, VOCAB, (BATCH, T)).astype(np.int32)
    # 25% trailing padding with ragged per-row lengths
    for row in range(BATCH):
        keep = int(T * (0.70 + 0.10 * rng.rand()))
        src[row, keep:] = 0
        tgt[row, keep:] = 0
    src, tgt = jnp.asarray(src), jnp.asarray(tgt)

    m_xla = build("xla")
    variables = m_xla.init(jax.random.PRNGKey(0), (src, tgt))
    params = variables["params"]
    opt = optax.adamw(1e-4, weight_decay=1e-4)

    results = {}
    for impl in ("xla", "flash"):
        model = build(impl)

        def step(params, opt_state, src, tgt):
            def loss_of(p):
                logits = model.apply({"params": p}, (src, tgt),
                                     deterministic=True)
                labels = jnp.roll(tgt, -1, axis=1)
                mask = (labels != 0).astype(jnp.float32)
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), labels)
                return jnp.sum(ce * mask) / jnp.sum(mask)

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def run_scan(params, opt_state, src, tgt):
            def body(carry, i):
                p, s = carry
                # vary the input per step or XLA hoists the whole step
                p, s, loss = step(
                    p, s,
                    jnp.where(src > 0, (src + i) % (VOCAB - 1) + 1, 0), tgt)
                return (p, s), loss

            (_, _), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(STEPS))
            return losses

        args = (jax.device_put(params), jax.device_put(opt.init(params)),
                src, tgt)
        losses = np.asarray(run_scan(*args))
        assert np.isfinite(losses).all(), losses
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            np.asarray(run_scan(*args))
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times)) / STEPS * 1e3
        results[impl] = ms
        print(f"{impl:6s} train step {ms:8.2f} ms  "
              f"loss[0]={losses[0]:.4f}", flush=True)

    print(f"flash speedup vs xla: {results['xla'] / results['flash']:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()

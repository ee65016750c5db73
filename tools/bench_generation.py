"""Compiled decode vs the conventional host loop, on the real chip.

The reference decodes Keras seq2seq models with a Python loop (one
`model.predict` per token). On a relay-attached TPU every dispatch costs
tens of ms, so the loop's wall time is ~all latency. This measures the
three compiled decoders in ``chambers_tpu.models.generation`` against a
faithful host loop on the same model.

    python tools/bench_generation.py              # TPU
    PLATFORM=cpu LAYERS=2 MAXLEN=8 python tools/bench_generation.py

Host-loop timing is per-call wall time (that IS the cost being measured);
compiled decodes fetch the result array (completion barrier).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PLATFORM"])

import jax.numpy as jnp

from chambers_tpu.models import (
    Seq2SeqTransformer,
    beam_search_decode,
    greedy_decode,
    sample_decode,
)

BATCH = int(os.environ.get("BATCH", "32"))
MAXLEN = int(os.environ.get("MAXLEN", "32"))
LAYERS = int(os.environ.get("LAYERS", "6"))
VOCAB = int(os.environ.get("VOCAB", "1024"))
# DTYPE=float32 is the numerics diagnostic: the cached and full-recompute
# loops must agree exactly in f32 (bf16 rounds the two matmul shapes
# differently, so flat untrained logits flip argmax near-ties)
DTYPE = os.environ.get("DTYPE", "bfloat16")
REPEATS = int(os.environ.get("REPEATS", "3"))
BOS = 1


def timed(fn, *args):
    out = np.asarray(fn(*args))  # compile + fetch
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


def main():
    module = Seq2SeqTransformer(
        input_vocab_size=VOCAB, output_vocab_size=VOCAB, embed_dim=256,
        num_heads=8, dim_feedforward=1024, num_encoder_layers=LAYERS,
        num_decoder_layers=LAYERS, dropout_rate=0.0,
        dtype=jnp.dtype(DTYPE).type,
    )
    src = jnp.asarray(
        np.random.default_rng(0).integers(1, VOCAB, (BATCH, MAXLEN)),
        jnp.int32,
    )
    variables = module.init(
        jax.random.PRNGKey(0),
        (jnp.zeros((1, MAXLEN), jnp.int32), jnp.zeros((1, MAXLEN), jnp.int32)),
    )
    quant = bool(int(os.environ.get("QUANT", "0")))  # QUANT=0 means float
    if quant:
        # int8 dynamic PTQ (chambers_tpu.quantization): decode at small
        # batch is weight-bound, so int8 weights halve the per-step HBM read
        from chambers_tpu.quantization import quantize_variables

        variables = jax.jit(quantize_variables)(variables)
    print(f"platform={jax.default_backend()} batch={BATCH} max_len={MAXLEN} "
          f"layers={LAYERS} quant={quant}", flush=True)

    # the conventional per-token loop: jitted step (compiled ONCE, outside
    # the timed region), but one dispatch + one argmax fetch per token
    host_apply = jax.jit(
        lambda v, s, t: module.apply(v, [s, t], deterministic=True)
    )

    def host_loop(variables, src):
        tgt = np.zeros((BATCH, MAXLEN), np.int32)
        tgt[:, 0] = BOS
        out = np.zeros((BATCH, MAXLEN), np.int32)
        for i in range(MAXLEN):
            logits = host_apply(variables, src, jnp.asarray(tgt))
            nxt = np.asarray(jnp.argmax(logits[:, i], -1))
            out[:, i] = nxt
            if i + 1 < MAXLEN:
                tgt[:, i + 1] = nxt
        return out

    t_host, out_host = timed(host_loop, variables, src)
    print(f"host loop        : {t_host * 1e3:9.1f} ms", flush=True)

    def mismatch(a, b):
        """Fraction of differing tokens — under bf16 the untrained model's
        near-uniform logits make argmax ties round differently between the
        full-buffer and one-token matmul shapes; a handful of flips is
        numerics, not a bug (the f32 test suite pins exact equality)."""
        return float((np.asarray(a) != np.asarray(b)).mean())

    fn = jax.jit(lambda v, s: greedy_decode(
        module, v, s, max_len=MAXLEN, bos_id=BOS, use_cache=False))
    t_greedy, out_greedy = timed(fn, variables, src)
    print(f"greedy (compiled): {t_greedy * 1e3:9.1f} ms "
          f"({t_host / t_greedy:5.1f}x, vs_host mismatch "
          f"{mismatch(out_host, out_greedy):.3f})", flush=True)

    fn = jax.jit(lambda v, s: greedy_decode(
        module, v, s, max_len=MAXLEN, bos_id=BOS, use_cache=True))
    t_cached, out_cached = timed(fn, variables, src)
    print(f"greedy (KV cache): {t_cached * 1e3:9.1f} ms "
          f"({t_host / t_cached:5.1f}x, vs_full mismatch "
          f"{mismatch(out_greedy, out_cached):.3f})", flush=True)

    fn = jax.jit(lambda v, s, k: sample_decode(
        module, v, s, k, max_len=MAXLEN, bos_id=BOS, temperature=1.0))
    t_sample, _ = timed(fn, variables, src, jax.random.PRNGKey(0))
    print(f"sample (KV cache): {t_sample * 1e3:9.1f} ms", flush=True)

    fn = jax.jit(lambda v, s: beam_search_decode(
        module, v, s, max_len=MAXLEN, bos_id=BOS, beam_size=4,
        use_cache=False))
    t_beam, _ = timed(fn, variables, src)
    print(f"beam-4 (compiled): {t_beam * 1e3:9.1f} ms", flush=True)

    fn = jax.jit(lambda v, s: beam_search_decode(
        module, v, s, max_len=MAXLEN, bos_id=BOS, beam_size=4,
        use_cache=True))
    t_beam_c, _ = timed(fn, variables, src)
    print(f"beam-4 (KV cache): {t_beam_c * 1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()

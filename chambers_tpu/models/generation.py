"""Compiled autoregressive decoding for encoder-decoder models.

The reference has no generation utility (its Seq2Seq transformer,
models/transformer.py:9-56, is train-only; users decode with host loops).
A Python host loop is the worst possible shape for this hardware: every
step pays a host->device dispatch (tens of ms on a relay-attached chip)
and re-traces nothing it can reuse. This module runs the WHOLE decode as
one jitted program — a ``lax.fori_loop`` over a static-length target
buffer, so XLA compiles one step body and the loop stays on device.

No KV cache: each step re-runs the decoder over the full (static) target
buffer. For the sequence lengths this model family targets (tens to a few
hundred tokens) the recompute is cheap relative to what the loop saves in
dispatch latency; the padding mask (token 0) keeps not-yet-generated
positions inert and causal self-attention keeps position ``i``'s logits
independent of them, so intermediate logits equal the incremental ones
exactly.

MoE-routed decoders (``moe_every_n > 0``): expert capacity is contested
across ALL buffer positions, padded ones included, so a step's logits can
differ from a hand-rolled incremental decode when experts overflow. Keep
``moe_capacity_factor`` ample at inference (or route per-group) if exact
step-equivalence matters.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp


def greedy_decode(module, variables, tokens, *, max_len: int, bos_id: int,
                  eos_id: Optional[int] = None, pad_id: int = 0) -> Any:
    """Greedy-decode ``max_len`` tokens for every sequence in ``tokens``.

    :param module: a ``Seq2SeqTransformer``-shaped Flax module:
        ``module.apply(variables, [tokens, targets])`` -> ``[b, t, vocab]``
        logits with causal target self-attention and token ``pad_id``
        treated as padding.
    :param tokens: ``[b, t_src]`` int source tokens.
    :param max_len: static number of steps to decode.
    :param bos_id: begin-of-sequence token fed at target position 0.
    :param eos_id: optional end token — once a sequence emits it, its later
        positions emit ``pad_id`` (the emitted ``eos_id`` itself is kept).
    :param pad_id: the padding id (0 for the reference's ``mask_zero``).
    :returns: ``[b, max_len]`` int32 — the token predicted at each target
        position (BOS not included), matching the conventional host loop.

    Wrap in ``jax.jit`` (or call inside a jitted function) to compile the
    entire decode into one device program::

        decode = jax.jit(partial(greedy_decode, module, max_len=32,
                                 bos_id=1), static_argnames=())
        out = decode(variables, tokens)
    """
    b = tokens.shape[0]
    tgt0 = jnp.full((b, max_len), pad_id, jnp.int32).at[:, 0].set(bos_id)
    out0 = jnp.full((b, max_len), pad_id, jnp.int32)
    finished0 = jnp.zeros((b,), bool)

    def body(i, carry):
        tgt, out, finished = carry
        logits = module.apply(variables, [tokens, tgt], deterministic=True)
        nxt = jnp.argmax(
            logits[:, i].astype(jnp.float32), axis=-1
        ).astype(jnp.int32)
        nxt = jnp.where(finished, pad_id, nxt)
        out = out.at[:, i].set(nxt)
        if eos_id is not None:
            finished = finished | (nxt == eos_id)
        # feed the prediction to the next input position; the final step
        # has no next position (dynamic indices clamp, so guard with where)
        col = jnp.minimum(i + 1, max_len - 1)
        tgt = jnp.where(i + 1 < max_len, tgt.at[:, col].set(nxt), tgt)
        return tgt, out, finished

    _, out, _ = jax.lax.fori_loop(0, max_len, body, (tgt0, out0, finished0))
    return out


def sample_decode(module, variables, tokens, key, *, max_len: int,
                  bos_id: int, temperature: float = 1.0,
                  eos_id: Optional[int] = None, pad_id: int = 0) -> Any:
    """Temperature sampling over the same compiled loop as
    :func:`greedy_decode`.

    Each step draws from ``softmax(logits / temperature)`` with a key
    folded from ``key`` and the step index — same arguments otherwise.
    ``temperature -> 0`` recovers greedy decoding (exactly in float32;
    under bf16 activations two logits one ULP apart can round differently
    in the two compiled loops, so near-tied steps may diverge).
    """
    if temperature <= 0:
        raise ValueError(f"temperature={temperature} must be > 0 "
                         "(use greedy_decode for argmax decoding)")
    b = tokens.shape[0]
    tgt0 = jnp.full((b, max_len), pad_id, jnp.int32).at[:, 0].set(bos_id)
    out0 = jnp.full((b, max_len), pad_id, jnp.int32)
    finished0 = jnp.zeros((b,), bool)
    inv_t = jnp.float32(1.0 / temperature)

    def body(i, carry):
        tgt, out, finished = carry
        logits = module.apply(variables, [tokens, tgt], deterministic=True)
        step_logits = logits[:, i].astype(jnp.float32) * inv_t
        nxt = jax.random.categorical(
            jax.random.fold_in(key, i), step_logits, axis=-1
        ).astype(jnp.int32)
        nxt = jnp.where(finished, pad_id, nxt)
        out = out.at[:, i].set(nxt)
        if eos_id is not None:
            finished = finished | (nxt == eos_id)
        col = jnp.minimum(i + 1, max_len - 1)
        tgt = jnp.where(i + 1 < max_len, tgt.at[:, col].set(nxt), tgt)
        return tgt, out, finished

    _, out, _ = jax.lax.fori_loop(0, max_len, body, (tgt0, out0, finished0))
    return out

"""Compiled autoregressive decoding for encoder-decoder models.

The reference has no generation utility (its Seq2Seq transformer,
models/transformer.py:9-56, is train-only; users decode with host loops).
A Python host loop is the worst possible shape for this hardware: every
step pays a host->device dispatch (tens of ms on a relay-attached chip)
and re-traces nothing it can reuse. This module runs the WHOLE decode as
one jitted program — a ``lax.fori_loop`` over a static-length target
buffer, so XLA compiles one step body and the loop stays on device.

The encoder runs ONCE per call (hoisted out of the loop via the module's
``encode``/``decode`` split when available); no KV cache beyond that —
each step re-runs the decoder over the full (static) target
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


def _make_stepper(module, variables, tokens, repeat: int = 1):
    """``step(tgt) -> [b·repeat, t, vocab]`` logits for the decode loops.

    When the module exposes ``encode``/``decode`` methods (e.g.
    ``Seq2SeqTransformer``), the encoder runs ONCE here — outside the
    decode loop, over the UN-repeated sources — and every step re-uses its
    memory (``repeat`` copies each row for beam search, so the duplicated
    hypotheses share one encoder pass). Otherwise each step falls back to
    the full ``module.apply([tokens, tgt])`` forward over repeated sources.
    """
    if hasattr(module, "encode") and hasattr(module, "decode"):
        x_enc, input_mask = module.apply(variables, tokens, method="encode")
        if repeat > 1:
            x_enc = jnp.repeat(x_enc, repeat, axis=0)
            input_mask = jnp.repeat(input_mask, repeat, axis=0)

        def step(tgt):
            return module.apply(variables, tgt, x_enc, input_mask,
                                method="decode")

        return step

    src = jnp.repeat(tokens, repeat, axis=0) if repeat > 1 else tokens
    return lambda tgt: module.apply(variables, [src, tgt],
                                    deterministic=True)


def _decode_loop(step_logits, select, b, max_len, bos_id, eos_id, pad_id):
    """Shared greedy/sampling loop: static target buffer, per-step token
    choice via ``select(i, step_logits_f32)``, eos freezing, next-position
    feed (the final step has no next position — dynamic indices clamp, so
    the write is guarded with a ``where``)."""
    tgt0 = jnp.full((b, max_len), pad_id, jnp.int32).at[:, 0].set(bos_id)
    out0 = jnp.full((b, max_len), pad_id, jnp.int32)
    finished0 = jnp.zeros((b,), bool)

    def body(i, carry):
        tgt, out, finished = carry
        logits = step_logits(tgt)
        nxt = select(i, logits[:, i].astype(jnp.float32)).astype(jnp.int32)
        nxt = jnp.where(finished, pad_id, nxt)
        out = out.at[:, i].set(nxt)
        if eos_id is not None:
            finished = finished | (nxt == eos_id)
        col = jnp.minimum(i + 1, max_len - 1)
        tgt = jnp.where(i + 1 < max_len, tgt.at[:, col].set(nxt), tgt)
        return tgt, out, finished

    _, out, _ = jax.lax.fori_loop(0, max_len, body, (tgt0, out0, finished0))
    return out


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
    entire decode into one device program.
    """
    step_logits = _make_stepper(module, variables, tokens)
    return _decode_loop(
        step_logits, lambda i, l: jnp.argmax(l, axis=-1),
        tokens.shape[0], max_len, bos_id, eos_id, pad_id,
    )


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
    inv_t = jnp.float32(1.0 / temperature)
    step_logits = _make_stepper(module, variables, tokens)

    def select(i, logits_f32):
        return jax.random.categorical(
            jax.random.fold_in(key, i), logits_f32 * inv_t, axis=-1
        )

    return _decode_loop(step_logits, select, tokens.shape[0], max_len,
                        bos_id, eos_id, pad_id)


def beam_search_decode(module, variables, tokens, *, max_len: int,
                       bos_id: int, beam_size: int,
                       eos_id: Optional[int] = None, pad_id: int = 0,
                       return_scores: bool = False) -> Any:
    """Beam search as one compiled program — static ``[b·beam]`` decode
    batch (the encoder still runs once over the ``[b]`` sources), one joint
    ``lax.top_k`` over the (beam × vocab) candidates per step, and the
    hypothesis reshuffle as a ``take_along_axis`` gather over the tiny beam
    axis. No dynamic shapes anywhere.

    Hypothesis scores are sums of ``log_softmax`` token log-probs (no
    length penalty). With ``eos_id`` set, a finished hypothesis emits
    ``pad_id`` at zero cost from then on — its score freezes and it keeps
    competing for a beam slot. ``beam_size=1`` reduces exactly to
    :func:`greedy_decode`.

    :returns: ``[b, max_len]`` int32 best sequences, or a
        ``(sequences, scores)`` tuple with ``[b]`` float32 log-prob scores
        when ``return_scores`` is set.
    """
    if beam_size < 1:
        raise ValueError(f"beam_size={beam_size} must be >= 1")
    b = tokens.shape[0]
    k = beam_size
    step_logits = _make_stepper(module, variables, tokens, repeat=k)
    tgt0 = jnp.full((b * k, max_len), pad_id, jnp.int32).at[:, 0].set(bos_id)
    out0 = jnp.full((b, k, max_len), pad_id, jnp.int32)
    # all k hypotheses start identical: give only beam 0 a live score so
    # step 0's joint top-k picks k DISTINCT first tokens
    scores0 = jnp.full((b, k), -jnp.inf).at[:, 0].set(0.0)
    finished0 = jnp.zeros((b, k), bool)

    def body(i, carry):
        tgt, out, scores, finished = carry
        logits = step_logits(tgt)
        logp = jax.nn.log_softmax(
            logits[:, i].astype(jnp.float32), axis=-1
        ).reshape(b, k, -1)
        vocab = logp.shape[-1]
        if eos_id is not None:
            # finished hypotheses: pad at zero cost, everything else -inf
            pad_only = jnp.full((vocab,), -jnp.inf).at[pad_id].set(0.0)
            logp = jnp.where(finished[:, :, None], pad_only, logp)
        total = (scores[:, :, None] + logp).reshape(b, k * vocab)
        scores, flat_idx = jax.lax.top_k(total, k)     # [b, k], sorted desc
        parent = flat_idx // vocab
        token = (flat_idx % vocab).astype(jnp.int32)

        # reshuffle every per-hypothesis state to its winning parent
        tgt = jnp.take_along_axis(
            tgt.reshape(b, k, max_len), parent[:, :, None], axis=1
        )
        out = jnp.take_along_axis(out, parent[:, :, None], axis=1)
        out = out.at[:, :, i].set(token)
        if eos_id is not None:
            finished = jnp.take_along_axis(finished, parent, axis=1)
            finished = finished | (token == eos_id)
        col = jnp.minimum(i + 1, max_len - 1)
        tgt = jnp.where(
            i + 1 < max_len, tgt.at[:, :, col].set(token), tgt
        ).reshape(b * k, max_len)
        return tgt, out, scores, finished

    _, out, scores, _ = jax.lax.fori_loop(
        0, max_len, body, (tgt0, out0, scores0, finished0)
    )
    best, best_scores = out[:, 0], scores[:, 0]  # top_k sorts descending
    return (best, best_scores) if return_scores else best

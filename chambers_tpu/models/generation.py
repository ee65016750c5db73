"""Compiled autoregressive decoding for encoder-decoder models.

The reference has no generation utility (its Seq2Seq transformer,
models/transformer.py:9-56, is train-only; users decode with host loops).
A Python host loop is the worst possible shape for this hardware: every
step pays a host->device dispatch (tens of ms on a relay-attached chip)
and re-traces nothing it can reuse. This module runs the WHOLE decode as
one jitted program — a ``lax.scan`` over a static-length target
buffer, so XLA compiles one step body and the loop stays on device.

The encoder runs ONCE per call (hoisted out of the loop via the module's
``encode``/``decode`` split when available). With ``use_cache`` (the
default where supported) each step feeds ONE token through an incremental
KV cache — self-attention K/V written per position into a preallocated
``[b, n, max_len, h]`` buffer, cross-attention memory K/V projected once
at prime time — so a step is O(t) instead of the O(t²) full-buffer
recompute, and the whole loop still compiles into one device program.
``use_cache=False`` falls back to re-running the decoder over the full
(static) target buffer each step; the padding mask (token 0) keeps
not-yet-generated positions inert and causal self-attention keeps
position ``i``'s logits independent of them, so the two paths emit the
same tokens (pinned exactly in tests at f32).

MoE-routed decoders (``moe_every_n > 0``): expert capacity is contested
across ALL buffer positions, padded ones included, so a step's logits can
differ from a hand-rolled incremental decode when experts overflow. Keep
``moe_capacity_factor`` ample at inference (or route per-group) if exact
step-equivalence matters. For the same reason the KV-cache path cannot
reproduce full-buffer routing one token at a time — ``use_cache=None``
(auto) selects the full-recompute loop for routed decoders.
"""

import warnings
from typing import Any, Optional

import jax
import jax.numpy as jnp


class QuantizedDecodeWarning(UserWarning):
    """Decode called with int8-PTQ variables — usually slower, not faster."""


def _warn_if_quantized(variables):
    """Warn (once per process) when decode receives int8-quantized params.

    Int8 PTQ pays on big batched forwards; measured at seq2seq-bench scale
    the per-step ``[b, 1, d]`` decode matmuls are too small for the MXU
    int8 rate and the per-token activation quantize rides the latency-bound
    critical path (greedy KV-cache 28.1 ms quantized vs 25.6 ms float —
    BASELINE.md "Int8 serving quantization"). Decoding still works and is
    exact vs the quantized full-recompute path; it is just not the fast
    configuration, so don't let anyone take it silently.
    """
    leaves = jax.tree_util.tree_leaves(variables.get("params", variables))
    if any(getattr(l, "dtype", None) == jnp.int8 for l in leaves):
        warnings.warn(
            "decoding with int8-quantized variables: per-step decode "
            "matmuls are too small to benefit from the MXU int8 rate and "
            "measured SLOWER than float (BASELINE.md). Keep a float copy "
            "of the variables for generation.",
            QuantizedDecodeWarning, stacklevel=3,
        )


def _scan_steps(body, carry, max_len: int):
    """Run ``carry = body(i, carry)`` for ``i in range(max_len)`` via
    ``lax.scan``.

    Deliberately NOT ``lax.fori_loop``: on the TPU backend this targets, a
    ``fori_loop`` whose body dynamic-update-slices a carried buffer and then
    reads that buffer through a matmul in the same iteration miscompiles
    (the KV-cache decode read garbage from masked slots; reproduced in pure
    lax, wrong at every batch size, while the identical body under
    ``lax.scan`` is bit-exact — see tools/diagnose_fori_loop_aliasing.py).
    """

    def scan_body(c, i):
        return body(i, c), None

    carry, _ = jax.lax.scan(scan_body, carry, jnp.arange(max_len))
    return carry


def _cache_supported(module) -> bool:
    """True when the module exposes the incremental-decode surface and its
    decoder is dense (MoE routing is position-coupled — see module doc)."""
    return (
        hasattr(module, "encode")
        and hasattr(module, "decode_step")
        and getattr(module, "moe_every_n", 0) == 0
    )


def _resolve_use_cache(module, use_cache) -> bool:
    if use_cache is None:
        return _cache_supported(module)
    if use_cache and not _cache_supported(module):
        raise NotImplementedError(
            "use_cache=True needs the module to expose encode/decode_step "
            "and a dense (non-MoE) decoder; got "
            f"{type(module).__name__} with moe_every_n="
            f"{getattr(module, 'moe_every_n', 0)}. Pass use_cache=False."
        )
    return bool(use_cache)


def _prime_cache(module, variables, tokens, max_len, repeat: int = 1):
    """Run the encoder once and the full-length decoder once (over a pad
    buffer, outputs discarded) to create the KV-cache variables sized
    ``max_len``; returns ``(step, cache0)`` where ``step(token, i, cache)
    -> (logits [b·repeat, 1, vocab], cache)``."""
    x_enc, input_mask = module.apply(variables, tokens, method="encode")
    if repeat > 1:
        x_enc = jnp.repeat(x_enc, repeat, axis=0)
        input_mask = jnp.repeat(input_mask, repeat, axis=0)
    b = tokens.shape[0] * repeat
    buffer = jnp.zeros((b, max_len), jnp.int32)
    _, cache0 = module.apply(
        variables, buffer, x_enc, input_mask,
        method="decode", decode=True, mutable=["cache"],
    )

    def step(token, i, cache):
        logits, cache = module.apply(
            {**variables, **cache}, token, i, x_enc, input_mask, max_len,
            method="decode_step", mutable=["cache"],
        )
        return logits, cache

    return step, cache0


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

    _, out, _ = _scan_steps(body, (tgt0, out0, finished0), max_len)
    return out


def _cached_decode_loop(module, variables, tokens, select, max_len, bos_id,
                        eos_id, pad_id):
    """KV-cached greedy/sampling loop: one token through the primed cache
    per step, the cache pytree threaded through the ``fori_loop`` carry."""
    step, cache0 = _prime_cache(module, variables, tokens, max_len)
    b = tokens.shape[0]
    token0 = jnp.full((b, 1), bos_id, jnp.int32)
    out0 = jnp.full((b, max_len), pad_id, jnp.int32)
    finished0 = jnp.zeros((b,), bool)

    def body(i, carry):
        token, out, finished, cache = carry
        logits, cache = step(token, i, cache)
        nxt = select(i, logits[:, 0].astype(jnp.float32)).astype(jnp.int32)
        nxt = jnp.where(finished, pad_id, nxt)
        out = out.at[:, i].set(nxt)
        if eos_id is not None:
            finished = finished | (nxt == eos_id)
        return nxt[:, None], out, finished, cache

    _, out, _, _ = _scan_steps(
        body, (token0, out0, finished0, cache0), max_len
    )
    return out


def greedy_decode(module, variables, tokens, *, max_len: int, bos_id: int,
                  eos_id: Optional[int] = None, pad_id: int = 0,
                  use_cache: Optional[bool] = None) -> Any:
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
    :param use_cache: decode through the incremental KV cache (O(t)/step).
        ``None`` (default) = auto: cached when the module supports it,
        full-recompute otherwise (e.g. MoE-routed decoders).
    :returns: ``[b, max_len]`` int32 — the token predicted at each target
        position (BOS not included), matching the conventional host loop.

    Wrap in ``jax.jit`` (or call inside a jitted function) to compile the
    entire decode into one device program.
    """
    _warn_if_quantized(variables)
    select = lambda i, l: jnp.argmax(l, axis=-1)
    if _resolve_use_cache(module, use_cache):
        return _cached_decode_loop(module, variables, tokens, select,
                                   max_len, bos_id, eos_id, pad_id)
    step_logits = _make_stepper(module, variables, tokens)
    return _decode_loop(
        step_logits, select,
        tokens.shape[0], max_len, bos_id, eos_id, pad_id,
    )


def sample_decode(module, variables, tokens, key, *, max_len: int,
                  bos_id: int, temperature: float = 1.0,
                  top_k: Optional[int] = None, top_p: Optional[float] = None,
                  eos_id: Optional[int] = None, pad_id: int = 0,
                  use_cache: Optional[bool] = None) -> Any:
    """Temperature sampling over the same compiled loop as
    :func:`greedy_decode`.

    Each step draws from ``softmax(logits / temperature)`` with a key
    folded from ``key`` and the step index — same arguments otherwise.
    ``temperature -> 0`` recovers greedy decoding (exactly in float32;
    under bf16 activations two logits one ULP apart can round differently
    in the two compiled loops, so near-tied steps may diverge).

    ``top_k`` / ``top_p`` restrict each step's candidate set before the
    draw (:func:`apply_top_k_top_p` — temperature first, then top-k, then
    nucleus top-p). ``top_k=1`` recovers greedy decoding exactly.
    """
    if temperature <= 0:
        raise ValueError(f"temperature={temperature} must be > 0 "
                         "(use greedy_decode for argmax decoding)")
    _warn_if_quantized(variables)
    inv_t = jnp.float32(1.0 / temperature)

    def select(i, logits_f32):
        scaled = apply_top_k_top_p(logits_f32 * inv_t, top_k, top_p)
        return jax.random.categorical(
            jax.random.fold_in(key, i), scaled, axis=-1
        )

    if _resolve_use_cache(module, use_cache):
        return _cached_decode_loop(module, variables, tokens, select,
                                   max_len, bos_id, eos_id, pad_id)
    step_logits = _make_stepper(module, variables, tokens)
    return _decode_loop(step_logits, select, tokens.shape[0], max_len,
                        bos_id, eos_id, pad_id)


def apply_top_k_top_p(logits, top_k: Optional[int] = None,
                      top_p: Optional[float] = None):
    """Restrict ``[..., vocab]`` float32 logits to the top-k and/or nucleus
    (top-p) candidate sets by masking everything else to ``-inf``.

    Standard serving semantics (applied after temperature scaling, top-k
    before top-p): top-k keeps every logit >= the k-th largest (ties at the
    threshold all survive — threshold-compare is the compiled-friendly
    formulation, no scatter); top-p keeps the smallest prefix of the
    descending-sorted distribution whose cumulative probability reaches
    ``top_p`` (the first token always survives, so the result is never
    empty). Both are O(vocab log vocab) sorts per step — vocab-sized work
    the sampling step already does in its softmax.
    """
    if top_k is not None:
        if top_k < 1:
            raise ValueError(f"top_k={top_k} must be >= 1")
        # clamp to the vocab (standard sampler behavior): top_k >= vocab is
        # a no-op filter, not a lax.top_k shape error
        k = min(int(top_k), logits.shape[-1])
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits >= kth, logits, -jnp.inf)
    if top_p is not None:
        if not 0.0 < top_p <= 1.0:
            raise ValueError(f"top_p={top_p} must be in (0, 1]")
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        # cumulative prob of STRICTLY higher-ranked tokens; token i is kept
        # while that mass is < top_p, so the top-1 token always survives
        cum = jnp.cumsum(probs, axis=-1) - probs
        keep_sorted = cum < top_p
        # smallest kept logit = the acceptance threshold
        threshold = jnp.min(
            jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1,
            keepdims=True)
        logits = jnp.where(logits >= threshold, logits, -jnp.inf)
    return logits


def _finalize_beams(out, scores, pad_id: int, length_penalty: float):
    """Pick the best of ``k`` hypotheses per batch row.

    ``length_penalty=0`` keeps the raw joint log-prob ranking (``out`` is
    already sorted, beam 0 wins). Otherwise hypotheses are re-ranked by the
    GNMT brevity penalty ``score / ((5 + L) / 6)**alpha`` with ``L`` the
    number of non-pad tokens — applied to the FINAL candidates (in-loop
    pruning stays raw-score, the usual single-pass-beam compromise; a
    finished short hypothesis still competes against longer ones here).
    Returns ``(best [b, max_len], best_score [b])`` with the score
    normalized when a penalty is set.
    """
    if not length_penalty:
        return out[:, 0], scores[:, 0]
    lengths = jnp.sum(out != pad_id, axis=-1).astype(jnp.float32)  # [b, k]
    penalty = ((5.0 + lengths) / 6.0) ** length_penalty
    normalized = scores / jnp.maximum(penalty, 1e-9)
    best_idx = jnp.argmax(normalized, axis=-1)                     # [b]
    best = jnp.take_along_axis(out, best_idx[:, None, None], axis=1)[:, 0]
    best_score = jnp.take_along_axis(normalized, best_idx[:, None],
                                     axis=1)[:, 0]
    return best, best_score


def _gather_beam_cache(cache, parent, b, k):
    """Reshuffle every per-hypothesis cache array (leading dim ``b·k``) to
    its winning parent beam; scalars (cache indices) pass through."""
    def gather(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == b * k:
            y = x.reshape((b, k) + x.shape[1:])
            idx = parent.reshape((b, k) + (1,) * (x.ndim - 1))
            return jnp.take_along_axis(y, idx, axis=1).reshape(x.shape)
        return x
    return jax.tree.map(gather, cache)


def beam_search_decode(module, variables, tokens, *, max_len: int,
                       bos_id: int, beam_size: int,
                       eos_id: Optional[int] = None, pad_id: int = 0,
                       length_penalty: float = 0.0,
                       return_scores: bool = False,
                       use_cache: Optional[bool] = None) -> Any:
    """Beam search as one compiled program — static ``[b·beam]`` decode
    batch (the encoder still runs once over the ``[b]`` sources), one joint
    ``lax.top_k`` over the (beam × vocab) candidates per step, and the
    hypothesis reshuffle as a ``take_along_axis`` gather over the tiny beam
    axis. No dynamic shapes anywhere.

    Hypothesis scores are sums of ``log_softmax`` token log-probs. With
    ``eos_id`` set, a finished hypothesis emits ``pad_id`` at zero cost from
    then on — its score freezes and it keeps competing for a beam slot.
    ``beam_size=1`` reduces exactly to :func:`greedy_decode`.

    ``length_penalty`` (alpha > 0) re-ranks the final ``k`` hypotheses by
    the GNMT brevity penalty ``score / ((5 + L) / 6)**alpha`` so longer
    finished sequences are not unfairly dominated by shorter ones
    (:func:`_finalize_beams`; in-loop pruning stays raw-score). The
    returned score is the normalized one when a penalty is set.

    :returns: ``[b, max_len]`` int32 best sequences, or a
        ``(sequences, scores)`` tuple with ``[b]`` float32 log-prob scores
        when ``return_scores`` is set.
    """
    if beam_size < 1:
        raise ValueError(f"beam_size={beam_size} must be >= 1")
    _warn_if_quantized(variables)
    b = tokens.shape[0]
    k = beam_size
    out0 = jnp.full((b, k, max_len), pad_id, jnp.int32)
    # all k hypotheses start identical: give only beam 0 a live score so
    # step 0's joint top-k picks k DISTINCT first tokens
    scores0 = jnp.full((b, k), -jnp.inf).at[:, 0].set(0.0)
    finished0 = jnp.zeros((b, k), bool)

    def advance(logp_flat, i, out, scores, finished):
        """Joint (beam × vocab) top-k from ``[b·k, vocab]`` step log-probs;
        returns the winning parents and the reshuffled per-beam state."""
        logp = logp_flat.reshape(b, k, -1)
        vocab = logp.shape[-1]
        if eos_id is not None:
            # finished hypotheses: pad at zero cost, everything else -inf
            pad_only = jnp.full((vocab,), -jnp.inf).at[pad_id].set(0.0)
            logp = jnp.where(finished[:, :, None], pad_only, logp)
        total = (scores[:, :, None] + logp).reshape(b, k * vocab)
        scores, flat_idx = jax.lax.top_k(total, k)     # [b, k], sorted desc
        parent = flat_idx // vocab
        token = (flat_idx % vocab).astype(jnp.int32)
        out = jnp.take_along_axis(out, parent[:, :, None], axis=1)
        out = out.at[:, :, i].set(token)
        if eos_id is not None:
            finished = jnp.take_along_axis(finished, parent, axis=1)
            finished = finished | (token == eos_id)
        return parent, token, out, scores, finished

    if _resolve_use_cache(module, use_cache):
        step, cache0 = _prime_cache(module, variables, tokens, max_len,
                                    repeat=k)
        token0 = jnp.full((b * k, 1), bos_id, jnp.int32)

        def body(i, carry):
            token_in, out, scores, finished, cache = carry
            logits, cache = step(token_in, i, cache)
            logp_flat = jax.nn.log_softmax(
                logits[:, 0].astype(jnp.float32), axis=-1)
            parent, token, out, scores, finished = advance(
                logp_flat, i, out, scores, finished)
            # each surviving hypothesis continues from its parent's KV state
            cache = _gather_beam_cache(cache, parent, b, k)
            return token.reshape(b * k, 1), out, scores, finished, cache

        _, out, scores, _, _ = _scan_steps(
            body, (token0, out0, scores0, finished0, cache0), max_len
        )
    else:
        step_logits = _make_stepper(module, variables, tokens, repeat=k)
        tgt0 = (
            jnp.full((b * k, max_len), pad_id, jnp.int32).at[:, 0].set(bos_id)
        )

        def body(i, carry):
            tgt, out, scores, finished = carry
            logits = step_logits(tgt)
            logp_flat = jax.nn.log_softmax(
                logits[:, i].astype(jnp.float32), axis=-1)
            parent, token, out, scores, finished = advance(
                logp_flat, i, out, scores, finished)
            # reshuffle the target buffer to the winning parents
            tgt = jnp.take_along_axis(
                tgt.reshape(b, k, max_len), parent[:, :, None], axis=1
            )
            col = jnp.minimum(i + 1, max_len - 1)
            tgt = jnp.where(
                i + 1 < max_len, tgt.at[:, :, col].set(token), tgt
            ).reshape(b * k, max_len)
            return tgt, out, scores, finished

        _, out, scores, _ = _scan_steps(
            body, (tgt0, out0, scores0, finished0), max_len
        )
    # top_k sorts descending: beam 0 wins under raw ranking; a length
    # penalty re-ranks the final k hypotheses
    best, best_scores = _finalize_beams(out, scores, pad_id, length_penalty)
    return (best, best_scores) if return_scores else best

"""Multi-head attention with the Chambers per-head parameter layout.

Parity: reference ``chambers/layers/attention.py``.

The reference keeps per-head projection weights as rank-3 tensors —
``w_query/w_key/w_value: (d, num_heads, head_dim)`` with biases
``(num_heads, 1, head_dim)`` and an output projection
``w_projection: (num_heads, d, head_dim)`` with bias ``(1, d)``
(attention.py:51-97). That layout is a checkpoint-compatibility contract (the
released ViT ``.h5`` weights are stored this way), so the Flax params here use
the exact same names and shapes. On TPU the layout is also convenient: the
``num_heads`` axis shards naturally over a ``model`` mesh axis for tensor
parallelism.

Compute is a single fused einsum per projection
(``btd,dnh->bnth`` — attention.py:113-115) followed by scaled dot-product
attention (attention.py:120-122, the ScaledAttention semantics of
attention.py:7-23: scores divided by ``sqrt(head_dim)``) and the merge einsum
``bnth,ndh->btd`` (attention.py:125).

Mask semantics follow Keras ``Attention``: ``mask=[q_mask, v_mask]`` where
``v_mask`` ([batch, tv] bool) suppresses keys with a large negative score
bias, ``causal=True`` adds a lower-triangular mask, and ``q_mask``
([batch, tq] bool) zeroes masked query outputs after the weighted sum.

Documented divergence: when ``tq != tv`` the causal diagonal here is aligned
at the sequence *end* (``tril(k=tv-tq)``, the standard decoder convention and
what the flash kernel implements), whereas Keras aligns it at the start
(row i attends keys ≤ i). The reference only ever uses causal self-attention
(tq == tv, transformer.py:193-198), where the two are identical.
"""

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

_MASK_BIAS = -1e9


def scaled_dot_product_attention(
    query,
    value,
    key=None,
    scale: Optional[float] = None,
    causal: bool = False,
    q_mask=None,
    v_mask=None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng=None,
    precision=None,
    impl: str = "xla",
    score_dtype=None,
):
    """Scaled dot-product attention over ``[batch, heads, time, head_dim]``.

    Functional core shared by :class:`MultiHeadAttention` and the models.
    By default scores are computed in float32 (``preferred_element_type``)
    for numerical stability on the MXU regardless of the input dtype, then
    cast back. ``score_dtype=jnp.bfloat16`` keeps the ``[t, t]`` scores and
    the softmax in bfloat16 (the MXU still accumulates the matmul in f32) —
    halves the scores' HBM traffic, worth ~7% on a ViT-S train step;
    equivalent to what the reference does under Keras ``mixed_float16``
    (utils/generic.py:32-41 sets the global policy, and Keras attention
    then runs softmax in the compute dtype).

    :param query: ``[b, n, tq, h]``
    :param value: ``[b, n, tv, h]``
    :param key: ``[b, n, tv, h]``; defaults to ``value``.
    :param scale: score divisor; defaults to ``sqrt(head_dim)``.
    :param causal: apply a lower-triangular (autoregressive) mask.
    :param q_mask: ``[b, tq]`` bool; zeroes outputs of masked queries.
    :param v_mask: ``[b, tv]`` bool; excludes masked keys from the softmax.
    :param dropout_rate: dropout on attention probabilities.
    """
    if key is None:
        key = value
    head_dim = query.shape[-1]

    use_dropout = dropout_rate > 0.0 and not deterministic
    if impl == "flash":
        if use_dropout:
            raise NotImplementedError(
                "attention_impl='flash' supports causal and padding masks "
                "but not attention dropout; use impl='xla'."
            )
        from chambers_tpu.ops.flash_attention import flash_attention

        out = flash_attention(query, value, key, scale=scale, causal=causal,
                              kv_mask=v_mask)
        if q_mask is not None:
            out = out * q_mask[:, None, :, None].astype(out.dtype)
        return out

    if scale is None:
        scale = jnp.sqrt(jnp.asarray(head_dim, jnp.float32))

    score_dtype = score_dtype or jnp.float32
    scores = jnp.einsum(
        "bnqh,bnkh->bnqk", query, key, preferred_element_type=score_dtype,
        precision=precision,
    )
    scores = scores / jnp.asarray(scale, score_dtype)

    if v_mask is not None:
        bias = jnp.where(
            v_mask[:, None, None, :],
            jnp.asarray(0.0, score_dtype), jnp.asarray(_MASK_BIAS, score_dtype),
        )
        scores = scores + bias
    if causal:
        tq, tv = scores.shape[-2], scores.shape[-1]
        causal_mask = jnp.tril(jnp.ones((tq, tv), dtype=bool), k=tv - tq)
        scores = jnp.where(causal_mask[None, None, :, :], scores,
                           jnp.asarray(_MASK_BIAS, score_dtype))

    probs = jax.nn.softmax(scores, axis=-1)

    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    probs = probs.astype(value.dtype)
    out = jnp.einsum("bnqk,bnkh->bnqh", probs, value, precision=precision)

    if q_mask is not None:
        out = out * q_mask[:, None, :, None].astype(out.dtype)
    return out


def scaled_attention(query, value, key=None, key_dim=None, causal=False,
                     q_mask=None, v_mask=None):
    """Functional equivalent of the reference's ``ScaledAttention`` layer
    (attention.py:7-23): dot-product attention with scores divided by
    ``sqrt(key_dim)`` (static if given, else from the key's last dim)."""
    if key is None:
        key = value
    scale = jnp.sqrt(jnp.asarray(
        key_dim if key_dim is not None else key.shape[-1], jnp.float32
    ))
    return scaled_dot_product_attention(
        query, value, key, scale=scale, causal=causal,
        q_mask=q_mask, v_mask=v_mask,
    )


# Class-style alias mirroring the reference export surface
class ScaledAttention:
    def __init__(self, key_dim=None, causal=False, dropout=0.0):
        self.key_dim = key_dim
        self.causal = causal
        self.dropout = dropout

    def __call__(self, inputs, mask=None, key=None, training: bool = False):
        q, v = inputs[0], inputs[1]
        k = inputs[2] if len(inputs) > 2 else v
        q_mask, v_mask = mask if mask is not None else (None, None)
        if training and self.dropout > 0.0:
            if key is None:
                raise ValueError(
                    "ScaledAttention(dropout>0) requires a PRNG `key` when "
                    "training=True."
                )
            scale = jnp.sqrt(jnp.asarray(
                self.key_dim if self.key_dim is not None else k.shape[-1],
                jnp.float32,
            ))
            return scaled_dot_product_attention(
                q, v, k, scale=scale, causal=self.causal,
                q_mask=q_mask, v_mask=v_mask,
                dropout_rate=self.dropout, deterministic=False,
                dropout_rng=key,
            )
        return scaled_attention(
            q, v, k, key_dim=self.key_dim, causal=self.causal,
            q_mask=q_mask, v_mask=v_mask,
        )


class MultiHeadAttention(nn.Module):
    """Multi-head attention with ``(d, num_heads, head_dim)`` weight layout.

    Call signature mirrors the reference: ``mha([q, v])`` or ``mha([q, v, k])``
    with optional ``mask=[q_mask, v_mask]``.
    """

    head_dim: int = 64
    num_heads: int = 8
    dropout_rate: float = 0.1
    causal: bool = False
    kernel_init: Any = nn.initializers.glorot_uniform()
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    precision: Any = None
    attention_impl: str = "xla"  # 'xla' | 'flash' (Pallas blockwise kernel)
    score_dtype: Optional[Any] = None  # None = float32 (parity default)

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], mask=None, deterministic: bool = True,
                 decode: bool = False, decode_index=None):
        q = inputs[0]
        v = inputs[1]
        k = inputs[2] if len(inputs) > 2 else v
        # self-attention (all three operands are literally the same array):
        # project q/k/v with ONE stacked einsum instead of three — same math
        # and K-dim accumulation order, one MXU pass over x instead of three
        self_attention = v is q and k is v

        d = q.shape[-1]
        n, h = self.num_heads, self.head_dim
        shape_qkv = (d, n, h)
        shape_bias = (n, 1, h)

        w_query = self.param("w_query", self.kernel_init, shape_qkv, self.param_dtype)
        b_query = self.param("b_query", nn.initializers.zeros, shape_bias, self.param_dtype)
        w_value = self.param("w_value", self.kernel_init, shape_qkv, self.param_dtype)
        b_value = self.param("b_value", nn.initializers.zeros, shape_bias, self.param_dtype)
        w_key = self.param("w_key", self.kernel_init, shape_qkv, self.param_dtype)
        b_key = self.param("b_key", nn.initializers.zeros, shape_bias, self.param_dtype)
        w_projection = self.param("w_projection", self.kernel_init, (n, d, h), self.param_dtype)
        b_projection = self.param("b_projection", nn.initializers.zeros, (1, d), self.param_dtype)

        dtype = self.dtype or q.dtype
        q, v, k = (x.astype(dtype) for x in (q, v, k))

        # int8 serving path (chambers_tpu.quantization): projections are
        # stored int8 with per-(n,h)/per-d scales in the "quant" collection;
        # activations quantize per token on the fly, the MXU accumulates in
        # int32, and everything downstream (scores, softmax, norms) stays in
        # the compute dtype
        quantized = self.has_variable("quant", "w_query_scale")

        def project(x, w, b, s_w=None):
            if s_w is None:
                return jnp.einsum(
                    "btd,dnh->bnth", x, w.astype(dtype),
                    precision=self.precision
                ) + b.astype(dtype)
            from chambers_tpu.quantization import int8_einsum

            acc, s_x = int8_einsum("btd,dnh->bnth", x, w)  # s_x [b, t, 1]
            out = (acc
                   * s_x[:, None, :, :]                  # [b, 1, t, 1]
                   * s_w[:, :, None, :])                 # [1, n, 1, h]
            return out.astype(dtype) + b.astype(dtype)

        def _scale(name):
            return self.get_variable("quant", name) if quantized else None

        # cross-attention with a primed decode cache: the memory K/V are
        # already projected and stored — skip their einsums entirely
        cached_cross = (
            decode
            and not self_attention
            and self.has_variable("cache", "cached_key")
        )
        if cached_cross:
            query = project(q, w_query, b_query, _scale("w_query_scale"))
            key = value = None
        elif self_attention:
            b_qkv = jnp.stack([b_query, b_value, b_key]).astype(dtype)
            if quantized:
                from chambers_tpu.quantization import int8_einsum

                w_qkv = jnp.stack([w_query, w_value, w_key])  # int8
                s_w = jnp.stack([
                    self.get_variable("quant", "w_query_scale"),
                    self.get_variable("quant", "w_value_scale"),
                    self.get_variable("quant", "w_key_scale"),
                ])                                        # [3, 1, n, h]
                acc, s_x = int8_einsum("btd,sdnh->sbnth", q, w_qkv)
                qkv = (acc
                       * s_x[None, :, None, :, :]          # [1, b, 1, t, 1]
                       * s_w[:, :, :, None, :]             # [3, 1, n, 1, h]
                       ).astype(dtype) + b_qkv[:, None]
            else:
                w_qkv = jnp.stack([w_query, w_value, w_key]).astype(dtype)
                qkv = jnp.einsum(
                    "btd,sdnh->sbnth", q, w_qkv, precision=self.precision
                ) + b_qkv[:, None]
            query, value, key = qkv[0], qkv[1], qkv[2]
        else:
            query = project(q, w_query, b_query, _scale("w_query_scale"))
            value = project(v, w_value, b_value, _scale("w_value_scale"))
            key = project(k, w_key, b_key, _scale("w_key_scale"))

        q_mask, v_mask = (mask if mask is not None else (None, None))
        causal = self.causal

        if decode:
            # Incremental-decode KV cache (models/generation.py use_cache
            # path). Two behaviors keyed on the call shape:
            #  - self-attention: an indexed ring of per-step K/V plus a
            #    validity row per position (pad tokens stay masked exactly
            #    as the full-buffer loop's `targets != 0` mask does);
            #    causality is implied — unwritten slots are invalid.
            #  - cross-attention: the projected memory K/V stored once at
            #    prime time (the full-buffer priming call) and reused.
            # The priming call runs the normal full-length path below while
            # creating the variables, so cache shapes come from the buffer.
            if self_attention:
                is_init = self.has_variable("cache", "cached_key")
                cached_key = self.variable(
                    "cache", "cached_key", jnp.zeros, key.shape, key.dtype)
                cached_value = self.variable(
                    "cache", "cached_value", jnp.zeros, value.shape, value.dtype)
                cached_mask = self.variable(
                    "cache", "valid_mask", jnp.zeros,
                    (key.shape[0], key.shape[2]), jnp.bool_)
                cache_index = self.variable(
                    "cache", "cache_index",
                    lambda: jnp.zeros((), jnp.int32))
                if is_init:
                    if query.shape[2] != 1:
                        raise ValueError(
                            "cached decode expects one query position per "
                            f"step, got {query.shape[2]} (prime the cache "
                            "with a full-length call first)."
                        )
                    # Prefer the caller-supplied position (the decode loop's
                    # scan xs) over the carried counter: on this TPU backend
                    # a dynamic_update_slice indexed by a loop-CARRIED scalar
                    # corrupts same-iteration reads of the buffer (wrong
                    # numerics under both fori_loop and scan; xs-derived
                    # indices are exact — tools/diagnose_fori_loop_aliasing).
                    i = cache_index.value if decode_index is None else (
                        jnp.asarray(decode_index, jnp.int32))
                    cached_key.value = jax.lax.dynamic_update_slice_in_dim(
                        cached_key.value, key, i, axis=2)
                    cached_value.value = jax.lax.dynamic_update_slice_in_dim(
                        cached_value.value, value, i, axis=2)
                    step_valid = (
                        v_mask if v_mask is not None
                        else jnp.ones((key.shape[0], 1), jnp.bool_)
                    )
                    cached_mask.value = jax.lax.dynamic_update_slice_in_dim(
                        cached_mask.value, step_valid, i, axis=1)
                    cache_index.value = i + 1
                    key, value = cached_key.value, cached_value.value
                    v_mask = cached_mask.value
                    causal = False  # the validity row masks future slots
            else:
                cached_key = self.variable(
                    "cache", "cached_key", jnp.zeros,
                    (0,) if key is None else key.shape,
                    dtype if key is None else key.dtype)
                cached_value = self.variable(
                    "cache", "cached_value", jnp.zeros,
                    (0,) if value is None else value.shape,
                    dtype if value is None else value.dtype)
                if cached_cross:
                    key = cached_key.value
                    value = cached_value.value
                else:
                    cached_key.value = key
                    cached_value.value = value

        dropout_rng = None
        if self.dropout_rate > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")

        # flash computes f32 softmax statistics and cannot honor score_dtype;
        # allowing both would flip numerics between batches whenever a mask/
        # dropout call takes the silent XLA fallback below
        if self.attention_impl == "flash" and self.score_dtype is not None:
            raise ValueError(
                "attention_impl='flash' always uses float32 softmax "
                "statistics; score_dtype is an XLA-path option — set one or "
                "the other."
            )
        # flash handles causal + q/v padding masks in-kernel; it cannot do
        # attention dropout, and incremental decode's [b, 1, h] query blocks
        # are too small to tile — silently use the XLA path there so training
        # with dropout and cached decode "just work"
        impl = self.attention_impl
        if impl == "flash" and (decode or dropout_rng is not None):
            impl = "xla"

        attention = scaled_dot_product_attention(
            query,
            value,
            key,
            causal=causal,
            q_mask=q_mask,
            v_mask=v_mask,
            dropout_rate=self.dropout_rate,
            deterministic=deterministic,
            dropout_rng=dropout_rng,
            precision=self.precision,
            impl=impl,
            score_dtype=self.score_dtype,
        )

        if quantized:
            from chambers_tpu.quantization import int8_einsum

            s_wp = self.get_variable("quant", "w_projection_scale")  # [1,d,1]
            acc, s_a = int8_einsum("bnth,ndh->btd", attention,
                                   w_projection, x_reduce_axes=(1, 3))
            x = (acc
                 * s_a[:, 0, :, :]                        # [b, t, 1]
                 * s_wp.reshape(1, 1, -1)                 # [1, 1, d]
                 ).astype(dtype) + b_projection.astype(dtype)
        else:
            x = jnp.einsum(
                "bnth,ndh->btd", attention, w_projection.astype(dtype),
                precision=self.precision,
            ) + b_projection.astype(dtype)
        return x

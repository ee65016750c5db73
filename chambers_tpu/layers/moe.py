"""Mixture-of-Experts MLP with expert parallelism.

SURVEY.md §2.8 records expert parallelism as absent from the reference (a
single-device Keras library) and out of scope for its model families. This
module supplies the TPU-native capability anyway, so the transformer stack
can scale parameters past one chip's HBM without scaling per-token FLOPs:
a learned router replaces the encoder MLP with ``n_experts`` expert MLPs,
of which each token visits its top ``n_selected_experts`` (1 = Switch
Transformer routing, 2 = the GShard convention).

The implementation is the dense-dispatch formulation (Switch Transformer /
Mesh-TensorFlow lineage): routing is expressed as two one-hot contractions
(``[tokens, experts, capacity]`` dispatch/combine tensors) so the entire
layer is einsums — MXU-friendly, static shapes, no gather/scatter. Expert
weights are stacked on a leading ``[n_experts, ...]`` axis; sharding that
axis over a mesh axis (``chambers_tpu.parallel.expert_parallel``) gives
expert parallelism, with XLA's SPMD partitioner emitting the all-to-all
style collectives from the einsums' sharding constraints — no hand-written
communication.

Capacity semantics: each expert processes at most
``ceil(s * n_selected_experts / n_experts * capacity_factor)`` tokens per
routing group of ``s`` tokens (``s`` = the whole batch when ``group_size``
is unset); selections over capacity contribute **zero** from this layer (their value rides the
residual connection in :class:`MoEEncoderLayer`, the standard Switch
behavior). The router computes in float32 regardless of the activation
dtype, and the Switch load-balancing auxiliary loss (plus the optional
ST-MoE router z-loss when ``router_z_loss_weight > 0``) is sown into the
``"intermediates"`` collection — fetch it with
``model.apply(vars, x, mutable=["intermediates"])`` and
:func:`moe_aux_loss`.
"""

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from chambers_tpu.activations import gelu


class MoEMLP(nn.Module):
    """Top-k mixture-of-experts two-layer GELU MLP (Switch / GShard style).

    Drop-in replacement for the encoder MLP (``dense1``/``dense2`` of
    ``EncoderLayer``): input ``[..., d]`` -> output ``[..., d]`` where every
    token is processed by its ``n_selected_experts`` highest-probability
    expert MLPs of hidden width ``ff_dim``, each scaled by its router gate.

    ``n_selected_experts=1`` (default) is the Switch formulation — the gate
    is the raw softmax probability of the argmax expert. For k>1 the k
    selected gates are renormalized to sum to 1 (the GShard/top-2
    convention) and expert queues fill rank-major: every token's first
    choice enqueues before any token's second choice, so over-capacity
    drops hit lower-rank selections first. Capacity scales with k
    (``ceil(group·k/E · capacity_factor)``), keeping the k=1 numbers
    bit-identical to the original Switch path.
    """

    ff_dim: int
    n_experts: int
    capacity_factor: float = 1.25
    aux_loss_weight: float = 1e-2
    router_z_loss_weight: float = 0.0
    n_selected_experts: int = 1
    group_size: Optional[int] = None
    kernel_init: Any = nn.initializers.glorot_uniform()
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    gelu_approximate: bool = False

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        d = inputs.shape[-1]
        E, F = self.n_experts, self.ff_dim
        dtype = self.dtype or inputs.dtype

        w_router = self.param("w_router", self.kernel_init, (d, E),
                              self.param_dtype)
        # expert-stacked weights: leading axis is the expert-parallel axis
        w1 = self.param("w1", self.kernel_init, (E, d, F), self.param_dtype)
        b1 = self.param("b1", nn.initializers.zeros, (E, F), self.param_dtype)
        w2 = self.param("w2", self.kernel_init, (E, F, d), self.param_dtype)
        b2 = self.param("b2", nn.initializers.zeros, (E, d), self.param_dtype)

        x = inputs.reshape(-1, d)
        n = x.shape[0]
        # The dispatch/combine tensors are [g, s, E, capacity] with capacity
        # = ceil(s/E·cf) — i.e. ~cf·s² elements per group. One global group
        # (group_size=None) is therefore O(n²): fine at test/moderate
        # batches, but ~3 GB for 25k tokens. Setting group_size keeps it
        # O(n·group_size), the Switch/Mesh-TF formulation; capacity (and so
        # which over-capacity tokens drop) is then enforced per group.
        if self.group_size is None:
            s = n
        else:
            s = min(int(self.group_size), n)
            if n % s:
                raise ValueError(
                    f"{n} tokens not divisible by group_size={s}"
                )
        g = n // s
        xg = x.reshape(g, s, d)
        k = int(self.n_selected_experts)
        if not 1 <= k <= E:
            raise ValueError(
                f"n_selected_experts={k} must be in [1, n_experts={E}]"
            )
        capacity = max(1, math.ceil(s * k / E * self.capacity_factor))

        # router always in float32: gate probabilities and the aux loss are
        # sensitive to softmax precision
        logits = jnp.einsum("gsd,de->gse", xg.astype(jnp.float32),
                            w_router.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)
        topk_gate, topk_idx = jax.lax.top_k(probs, k)  # [g, s, k]
        if k > 1:
            # GShard convention: the selected gates renormalize to sum 1.
            # (k=1 keeps the raw Switch probability — renormalizing would
            # collapse every gate to 1.0.)
            topk_gate = topk_gate / jnp.sum(topk_gate, -1, keepdims=True)

        # Expert queues fill rank-major, batch order within a rank: rank-r
        # positions offset by the expert's FULL rank-<r selection count
        # (kept or not — queue positions are assigned before the capacity
        # cut), so first choices always outrank second choices for slots.
        one_hot_e = None       # rank-0 one-hot, reused by the aux loss
        dispatch = combine = None
        used = None            # [g, E] selections enqueued by earlier ranks
        for r in range(k):
            oh = jax.nn.one_hot(topk_idx[..., r], E, dtype=jnp.float32)
            pos = jnp.einsum(
                "gse,gse->gs", jnp.cumsum(oh, axis=1), oh
            ) - 1.0
            if r:
                pos = pos + jnp.einsum("gse,ge->gs", oh, used)
            # pos holds exact small non-negative integers; the capacity cut
            # IS the one-hot: pos >= capacity maps to an all-zero row, so
            # over-capacity selections dispatch nowhere
            one_hot_c = jax.nn.one_hot(
                pos.astype(jnp.int32), capacity, dtype=jnp.float32
            )
            disp_r = (oh[:, :, :, None]
                      * one_hot_c[:, :, None, :]).astype(dtype)
            # dispatch entries are exactly 0/1, so scaling the compute-dtype
            # dispatch by the compute-dtype gate is bit-identical to casting
            # (dispatch·gate) from f32 — and skips a full-size f32 tensor
            comb_r = disp_r * topk_gate[..., r].astype(dtype)[:, :, None, None]
            if r == 0:
                one_hot_e, dispatch, combine = oh, disp_r, comb_r
                used = jnp.sum(oh, axis=1)
            else:
                dispatch = dispatch + disp_r
                combine = combine + comb_r
                if r + 1 < k:
                    used = used + jnp.sum(oh, axis=1)

        expert_in = jnp.einsum("gsec,gsd->gecd", dispatch, xg.astype(dtype))
        # int8 serving path (chambers_tpu.quantization): the expert banks
        # w1/w2 are stored int8 with per-expert-per-channel scales; each
        # dispatched row quantizes on the fly and the MXU accumulates in
        # int32. The router and the 0/1 dispatch/combine routing stay float.
        if self.has_variable("quant", "w1_scale"):
            from chambers_tpu.quantization import int8_einsum

            s_w1 = self.get_variable("quant", "w1_scale")  # [E, 1, F]
            s_w2 = self.get_variable("quant", "w2_scale")  # [E, 1, d]
            acc, s_x = int8_einsum("gecd,edf->gecf", expert_in, w1)
            pre = (acc * s_x                               # s_x [g, E, c, 1]
                   * s_w1[:, 0][None, :, None, :]).astype(dtype) \
                + b1.astype(dtype)[None, :, None, :]
            h = gelu(pre, approximate=self.gelu_approximate)
            acc2, s_h = int8_einsum("gecf,efd->gecd", h, w2)
            expert_out = (acc2 * s_h
                          * s_w2[:, 0][None, :, None, :]).astype(dtype) \
                + b2.astype(dtype)[None, :, None, :]
        else:
            h = gelu(
                jnp.einsum("gecd,edf->gecf", expert_in, w1.astype(dtype))
                + b1.astype(dtype)[None, :, None, :],
                approximate=self.gelu_approximate,
            )
            expert_out = jnp.einsum("gecf,efd->gecd", h, w2.astype(dtype)) \
                + b2.astype(dtype)[None, :, None, :]

        y = jnp.einsum("gsec,gecd->gsd", combine, expert_out)

        # Switch/GShard load-balancing loss: E * sum_e (fraction of tokens
        # whose FIRST choice is e * mean router prob_e), averaged over
        # groups; equals 1.0 at perfectly uniform routing
        frac = jnp.mean(one_hot_e, axis=1)       # [g, E]
        mean_prob = jnp.mean(probs, axis=1)      # [g, E]
        aux = self.aux_loss_weight * E * jnp.mean(
            jnp.sum(frac * mean_prob, axis=-1)
        )
        if self.router_z_loss_weight:
            # ST-MoE router z-loss (Zoph et al. 2022): mean squared
            # logsumexp of the router logits. Penalizes large logits, which
            # drift the f32 softmax toward saturation and make routing
            # twitchy under bf16 activations; 1e-3 is the paper's setting.
            z = jax.nn.logsumexp(logits, axis=-1)  # [g, s], f32
            aux = aux + self.router_z_loss_weight * jnp.mean(
                jnp.square(z)
            )
        self.sow("intermediates", "moe_aux_loss", aux)

        return y.reshape(inputs.shape).astype(dtype)


def moe_aux_loss(intermediates) -> jax.Array:
    """Sum every ``moe_aux_loss`` sown anywhere in an ``intermediates``
    collection (one per :class:`MoEMLP` call) — add the result to the task
    loss when training a routed model."""
    total = 0.0
    flat = jax.tree.leaves_with_path(intermediates)
    found = False
    for path, leaf in flat:
        if any(getattr(p, "key", None) == "moe_aux_loss" for p in path):
            total = total + jnp.sum(leaf)
            found = True
    if not found:
        return jnp.zeros(())
    return total


class MoEEncoderLayer(nn.Module):
    """``EncoderLayer`` with the dense MLP swapped for :class:`MoEMLP`.

    Same attention, norms, residuals, and ``pre_norm`` orderings as
    ``chambers_tpu.layers.transformer.EncoderLayer`` (reference
    transformer.py:8-109); dropped-over-capacity tokens pass through on the
    residual path unchanged.
    """

    embed_dim: int = 512
    num_heads: int = 8
    ff_dim: int = 2048
    n_experts: int = 8
    capacity_factor: float = 1.25
    router_z_loss_weight: float = 0.0
    n_selected_experts: int = 1
    group_size: Optional[int] = None
    attention_dropout_rate: float = 0.1
    dense_dropout_rate: float = 0.1
    norm_epsilon: float = 1e-6
    pre_norm: bool = False
    kernel_init: Any = nn.initializers.glorot_uniform()
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    attention_impl: str = "xla"
    score_dtype: Optional[Any] = None
    norm_stats_dtype: Optional[Any] = None
    gelu_approximate: bool = False

    def setup(self):
        from chambers_tpu.layers.attention import MultiHeadAttention
        from chambers_tpu.layers.transformer import _make_norm

        self.multi_head_attention = MultiHeadAttention(
            head_dim=self.embed_dim // self.num_heads,
            num_heads=self.num_heads,
            dropout_rate=self.attention_dropout_rate,
            causal=False,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attention_impl=self.attention_impl,
            score_dtype=self.score_dtype,
        )
        self.norm1 = _make_norm(self.norm_epsilon, self.dtype,
                                self.param_dtype, self.norm_stats_dtype)
        self.norm2 = _make_norm(self.norm_epsilon, self.dtype,
                                self.param_dtype, self.norm_stats_dtype)
        self.moe = MoEMLP(
            ff_dim=self.ff_dim, n_experts=self.n_experts,
            capacity_factor=self.capacity_factor,
            router_z_loss_weight=self.router_z_loss_weight,
            n_selected_experts=self.n_selected_experts,
            group_size=self.group_size,
            kernel_init=self.kernel_init, dtype=self.dtype,
            param_dtype=self.param_dtype,
            gelu_approximate=self.gelu_approximate,
        )
        # EncoderLayer parity: the attention-output dropout runs at
        # dense_dropout_rate (transformer.py EncoderLayer.setup), NOT the
        # in-attention rate
        self.dropout1 = nn.Dropout(self.dense_dropout_rate)
        self.dropout2 = nn.Dropout(self.dense_dropout_rate)

    def __call__(self, inputs, mask=None, deterministic: bool = True):
        x = inputs
        if self.pre_norm:
            x = x + self._self_attn(self.norm1(x), mask, deterministic)
            x = x + self._moe(self.norm2(x), deterministic)
        else:
            x = self.norm1(x + self._self_attn(x, mask, deterministic))
            x = self.norm2(x + self._moe(x, deterministic))
        return x

    def _self_attn(self, q, mask, deterministic):
        attention = self.multi_head_attention(
            [q, q, q], mask=[mask, mask], deterministic=deterministic
        )
        return self.dropout1(attention, deterministic=deterministic)

    def _moe(self, x, deterministic):
        y = self.moe(x, deterministic=deterministic)
        return self.dropout2(y, deterministic=deterministic)


class MoEDecoderLayer(nn.Module):
    """``DecoderLayer`` with the dense MLP swapped for :class:`MoEMLP` —
    the original GShard setting (MoE on the seq2seq stacks).

    Same causal self-attention, cross-attention, norms, residuals, and
    orderings as ``chambers_tpu.layers.transformer.DecoderLayer``
    (reference transformer.py:113-252), including the pre-norm path's
    shared-``norm2`` memory normalization quirk kept there for parity.
    Any wiring or parity fix to ``DecoderLayer`` must be mirrored here;
    ``test_moe_decoder_layer_matches_dense_decoder_outside_mlp`` pins the
    equivalence.
    """

    embed_dim: int = 512
    num_heads: int = 8
    ff_dim: int = 2048
    n_experts: int = 8
    capacity_factor: float = 1.25
    router_z_loss_weight: float = 0.0
    n_selected_experts: int = 1
    group_size: Optional[int] = None
    attention_dropout_rate: float = 0.1
    dense_dropout_rate: float = 0.1
    norm_epsilon: float = 1e-6
    pre_norm: bool = False
    causal: bool = True
    kernel_init: Any = nn.initializers.glorot_uniform()
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    attention_impl: str = "xla"
    score_dtype: Optional[Any] = None
    norm_stats_dtype: Optional[Any] = None
    gelu_approximate: bool = False

    def setup(self):
        from chambers_tpu.layers.attention import MultiHeadAttention
        from chambers_tpu.layers.transformer import _make_norm

        mha_common = dict(
            head_dim=self.embed_dim // self.num_heads,
            num_heads=self.num_heads,
            dropout_rate=self.attention_dropout_rate,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attention_impl=self.attention_impl,
            score_dtype=self.score_dtype,
        )
        self.multi_head_attention1 = MultiHeadAttention(
            causal=self.causal, **mha_common
        )
        self.multi_head_attention2 = MultiHeadAttention(
            causal=False, **mha_common
        )
        self.norm1 = _make_norm(self.norm_epsilon, self.dtype,
                                self.param_dtype, self.norm_stats_dtype)
        self.norm2 = _make_norm(self.norm_epsilon, self.dtype,
                                self.param_dtype, self.norm_stats_dtype)
        self.norm3 = _make_norm(self.norm_epsilon, self.dtype,
                                self.param_dtype, self.norm_stats_dtype)
        self.moe = MoEMLP(
            ff_dim=self.ff_dim, n_experts=self.n_experts,
            capacity_factor=self.capacity_factor,
            router_z_loss_weight=self.router_z_loss_weight,
            n_selected_experts=self.n_selected_experts,
            group_size=self.group_size,
            kernel_init=self.kernel_init, dtype=self.dtype,
            param_dtype=self.param_dtype,
            gelu_approximate=self.gelu_approximate,
        )
        self.dropout1 = nn.Dropout(self.dense_dropout_rate)
        self.dropout2 = nn.Dropout(self.dense_dropout_rate)
        self.dropout3 = nn.Dropout(self.dense_dropout_rate)

    def __call__(self, inputs, mask=None, deterministic: bool = True):
        x, x_enc = inputs
        q_mask = mask[0] if mask is not None else None
        v_mask = mask[1] if mask is not None else None

        if self.pre_norm:
            x = x + self._self_attn(self.norm1(x), q_mask, deterministic)
            # DecoderLayer parity: memory normalized with the query's norm2
            x = x + self._cross_attn(
                self.norm2(x), self.norm2(x_enc), q_mask, v_mask,
                deterministic,
            )
            x = x + self._moe(self.norm3(x), deterministic)
        else:
            x = self.norm1(x + self._self_attn(x, q_mask, deterministic))
            x = self.norm2(
                x + self._cross_attn(x, x_enc, q_mask, v_mask, deterministic)
            )
            x = self.norm3(x + self._moe(x, deterministic))
        return x

    def _self_attn(self, q, mask, deterministic):
        attention = self.multi_head_attention1(
            [q, q, q], mask=[mask, mask], deterministic=deterministic
        )
        return self.dropout1(attention, deterministic=deterministic)

    def _cross_attn(self, q, v, q_mask, v_mask, deterministic):
        attention = self.multi_head_attention2(
            [q, v, v], mask=[q_mask, v_mask], deterministic=deterministic
        )
        return self.dropout2(attention, deterministic=deterministic)

    def _moe(self, x, deterministic):
        y = self.moe(x, deterministic=deterministic)
        return self.dropout3(y, deterministic=deterministic)

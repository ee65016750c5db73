"""Transformer encoder/decoder blocks.

Parity: reference ``chambers/layers/transformer.py``.

- ``EncoderLayer`` (transformer.py:8-109): MHA self-attention + 2-layer GELU
  MLP with residuals; both pre-norm and post-norm orderings behind the
  ``pre_norm`` flag (call at transformer.py:53-63). LayerNorm epsilon defaults
  to 1e-6 (transformer.py:17) — part of the ViT parity contract.
- ``DecoderLayer`` (transformer.py:113-252): causal self-attention,
  cross-attention over encoder memory, MLP. Note the reference's pre-norm path
  normalizes the encoder memory with the *same* ``norm2`` used for the query
  (transformer.py:179-185); replicated here for checkpoint parity.
- ``Encoder``/``Decoder`` (transformer.py:256-470): layer stacks with optional
  final LayerNorm. ``Decoder(return_sequence=True)`` stacks every layer's
  output to ``[batch, n_layers, t, d]`` (transformer.py:410-426) for DETR-style
  per-layer auxiliary losses.

TPU notes: the per-layer loop is unrolled at trace time (static layer count →
XLA fuses each block). Set ``remat=True`` to rematerialize each layer in the
backward pass (jax.checkpoint) — trades FLOPs for HBM when training deep
stacks.
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from chambers_tpu.activations import gelu
from chambers_tpu.layers.attention import MultiHeadAttention
from chambers_tpu.layers.normalization import FastLayerNorm
from chambers_tpu.quantization import QuantDense


def _make_norm(epsilon, dtype, param_dtype, stats_dtype):
    """nn.LayerNorm (f32 statistics — the exact parity default) or
    FastLayerNorm with statistics in ``stats_dtype`` (mixed-precision mode,
    ~10% faster per ViT train step). Same param names either way."""
    if stats_dtype is None:
        return nn.LayerNorm(epsilon=epsilon, dtype=dtype,
                            param_dtype=param_dtype)
    return FastLayerNorm(epsilon=epsilon, dtype=dtype,
                         param_dtype=param_dtype, stats_dtype=stats_dtype)


class EncoderLayer(nn.Module):
    embed_dim: int = 512
    num_heads: int = 8
    ff_dim: int = 2048
    attention_dropout_rate: float = 0.1
    dense_dropout_rate: float = 0.1
    norm_epsilon: float = 1e-6
    pre_norm: bool = False
    kernel_init: Any = nn.initializers.glorot_uniform()
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    attention_impl: str = "xla"
    score_dtype: Optional[Any] = None
    # tanh-approximate GELU is ~15% faster on the VPU than the exact-erf
    # form; default False matches the reference encoder (transformer.py:43)
    gelu_approximate: bool = False
    norm_stats_dtype: Optional[Any] = None

    def setup(self):
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
        self.dense1 = QuantDense(self.ff_dim, kernel_init=self.kernel_init,
                               dtype=self.dtype, param_dtype=self.param_dtype)
        self.dense2 = QuantDense(self.embed_dim, kernel_init=self.kernel_init,
                               dtype=self.dtype, param_dtype=self.param_dtype)
        self.dropout1 = nn.Dropout(self.dense_dropout_rate)
        self.dropout2 = nn.Dropout(self.dense_dropout_rate)

    def __call__(self, inputs, mask=None, deterministic: bool = True):
        x = inputs
        if self.pre_norm:
            x = x + self._self_attn(self.norm1(x), mask, deterministic)
            x = x + self._mlp(self.norm2(x), deterministic)
        else:
            x = self.norm1(x + self._self_attn(x, mask, deterministic))
            x = self.norm2(x + self._mlp(x, deterministic))
        return x

    def _self_attn(self, q, mask, deterministic):
        attention = self.multi_head_attention(
            [q, q, q], mask=[mask, mask], deterministic=deterministic
        )
        return self.dropout1(attention, deterministic=deterministic)

    def _mlp(self, x, deterministic):
        x = gelu(self.dense1(x), approximate=self.gelu_approximate)
        x = self.dense2(x)
        return self.dropout2(x, deterministic=deterministic)


class DecoderLayer(nn.Module):
    # NOTE: chambers_tpu.layers.moe.MoEDecoderLayer mirrors this block's
    # attention/norm/residual wiring (incl. the pre-norm shared-norm2
    # quirk) with a routed MLP — apply any parity or wiring fix THERE too;
    # tests/layers/test_moe.py pins the equivalence.
    embed_dim: int = 512
    num_heads: int = 8
    ff_dim: int = 2048
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
    # tanh-approximate GELU is ~15% faster on the VPU than the exact-erf
    # form; default False matches the reference encoder (transformer.py:43)
    gelu_approximate: bool = False
    norm_stats_dtype: Optional[Any] = None

    def setup(self):
        common = dict(kernel_init=self.kernel_init, dtype=self.dtype,
                      param_dtype=self.param_dtype)
        mha_common = dict(common, attention_impl=self.attention_impl,
                          score_dtype=self.score_dtype)
        self.multi_head_attention1 = MultiHeadAttention(
            head_dim=self.embed_dim // self.num_heads,
            num_heads=self.num_heads,
            dropout_rate=self.attention_dropout_rate,
            causal=self.causal,
            **mha_common,
        )
        self.multi_head_attention2 = MultiHeadAttention(
            head_dim=self.embed_dim // self.num_heads,
            num_heads=self.num_heads,
            dropout_rate=self.attention_dropout_rate,
            causal=False,
            **mha_common,
        )
        self.norm1 = _make_norm(self.norm_epsilon, self.dtype,
                                 self.param_dtype, self.norm_stats_dtype)
        self.norm2 = _make_norm(self.norm_epsilon, self.dtype,
                                 self.param_dtype, self.norm_stats_dtype)
        self.norm3 = _make_norm(self.norm_epsilon, self.dtype,
                                 self.param_dtype, self.norm_stats_dtype)
        self.dense1 = QuantDense(self.ff_dim, **common)
        self.dense2 = QuantDense(self.embed_dim, **common)
        self.dropout1 = nn.Dropout(self.dense_dropout_rate)
        self.dropout2 = nn.Dropout(self.dense_dropout_rate)
        self.dropout3 = nn.Dropout(self.dense_dropout_rate)

    def __call__(self, inputs, mask=None, deterministic: bool = True,
                 decode: bool = False, decode_index=None):
        x, x_enc = inputs
        q_mask = mask[0] if mask is not None else None
        v_mask = mask[1] if mask is not None else None

        if self.pre_norm:
            x = x + self._self_attn(self.norm1(x), q_mask, deterministic,
                                    decode, decode_index)
            # Reference quirk kept for parity: memory is normalized with the
            # same norm2 as the query (transformer.py:179-185).
            x = x + self._cross_attn(
                self.norm2(x), self.norm2(x_enc), q_mask, v_mask,
                deterministic, decode
            )
            x = x + self._mlp(self.norm3(x), deterministic)
        else:
            x = self.norm1(x + self._self_attn(x, q_mask, deterministic,
                                               decode, decode_index))
            x = self.norm2(x + self._cross_attn(x, x_enc, q_mask, v_mask,
                                                deterministic, decode))
            x = self.norm3(x + self._mlp(x, deterministic))
        return x

    def _self_attn(self, q, mask, deterministic, decode=False,
                   decode_index=None):
        attention = self.multi_head_attention1(
            [q, q, q], mask=[mask, mask], deterministic=deterministic,
            decode=decode, decode_index=decode_index,
        )
        return self.dropout1(attention, deterministic=deterministic)

    def _cross_attn(self, q, v, q_mask, v_mask, deterministic, decode=False):
        attention = self.multi_head_attention2(
            [q, v, v], mask=[q_mask, v_mask], deterministic=deterministic,
            decode=decode,
        )
        return self.dropout2(attention, deterministic=deterministic)

    def _mlp(self, x, deterministic):
        x = gelu(self.dense1(x), approximate=self.gelu_approximate)
        x = self.dense2(x)
        return self.dropout3(x, deterministic=deterministic)


class Encoder(nn.Module):
    embed_dim: int
    num_heads: int
    ff_dim: int
    num_layers: int
    attention_dropout_rate: float = 0.1
    dense_dropout_rate: float = 0.1
    norm_epsilon: float = 1e-6
    pre_norm: bool = False
    norm_output: bool = False
    kernel_init: Any = nn.initializers.glorot_uniform()
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    remat: bool = False
    attention_impl: str = "xla"
    score_dtype: Optional[Any] = None
    # tanh-approximate GELU is ~15% faster on the VPU than the exact-erf
    # form; default False matches the reference encoder (transformer.py:43)
    gelu_approximate: bool = False
    norm_stats_dtype: Optional[Any] = None
    # moe_every_n > 0 swaps every n-th layer's MLP for a Switch-style
    # mixture-of-experts (V-MoE placement); 0 = dense everywhere (the
    # reference architecture — param tree unchanged, checkpoints load)
    moe_every_n: int = 0
    moe_n_experts: int = 8
    moe_capacity_factor: float = 1.25
    moe_router_z_loss_weight: float = 0.0
    moe_n_selected_experts: int = 1
    moe_group_size: Optional[int] = None

    def _moe_at(self, i: int) -> bool:
        return self.moe_every_n > 0 and (i + 1) % self.moe_every_n == 0

    def setup(self):
        from chambers_tpu.layers.moe import MoEEncoderLayer

        layer_cls = nn.remat(EncoderLayer) if self.remat else EncoderLayer
        moe_cls = nn.remat(MoEEncoderLayer) if self.remat else MoEEncoderLayer
        common = dict(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            ff_dim=self.ff_dim,
            attention_dropout_rate=self.attention_dropout_rate,
            dense_dropout_rate=self.dense_dropout_rate,
            norm_epsilon=self.norm_epsilon,
            pre_norm=self.pre_norm,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attention_impl=self.attention_impl,
            score_dtype=self.score_dtype,
            norm_stats_dtype=self.norm_stats_dtype,
            gelu_approximate=self.gelu_approximate,
        )
        self.layers = [
            moe_cls(
                n_experts=self.moe_n_experts,
                capacity_factor=self.moe_capacity_factor,
                router_z_loss_weight=self.moe_router_z_loss_weight,
                n_selected_experts=self.moe_n_selected_experts,
                group_size=self.moe_group_size,
                **common,
            )
            if self._moe_at(i)
            else layer_cls(**common)
            for i in range(self.num_layers)
        ]
        self.norm_layer = (
            _make_norm(self.norm_epsilon, self.dtype,
                       self.param_dtype, self.norm_stats_dtype)
            if self.norm_output
            else None
        )

    def __call__(self, inputs, mask=None, deterministic: bool = True):
        x = inputs
        for layer in self.layers:
            x = layer(x, mask=mask, deterministic=deterministic)
        if self.norm_layer is not None:
            x = self.norm_layer(x)
        return x


class Decoder(nn.Module):
    embed_dim: int
    num_heads: int
    ff_dim: int
    num_layers: int
    attention_dropout_rate: float = 0.1
    dense_dropout_rate: float = 0.1
    norm_epsilon: float = 1e-6
    pre_norm: bool = False
    norm_output: bool = False
    causal: bool = True
    return_sequence: bool = False
    kernel_init: Any = nn.initializers.glorot_uniform()
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    remat: bool = False
    attention_impl: str = "xla"
    score_dtype: Optional[Any] = None
    # tanh-approximate GELU is ~15% faster on the VPU than the exact-erf
    # form; default False matches the reference encoder (transformer.py:43)
    gelu_approximate: bool = False
    norm_stats_dtype: Optional[Any] = None
    # moe_every_n > 0 swaps every n-th layer's MLP for a routed MoE (the
    # GShard seq2seq placement); 0 = dense everywhere (reference
    # architecture — param tree unchanged, checkpoints load)
    moe_every_n: int = 0
    moe_n_experts: int = 8
    moe_capacity_factor: float = 1.25
    moe_router_z_loss_weight: float = 0.0
    moe_n_selected_experts: int = 1
    moe_group_size: Optional[int] = None

    def _moe_at(self, i: int) -> bool:
        return self.moe_every_n > 0 and (i + 1) % self.moe_every_n == 0

    def setup(self):
        from chambers_tpu.layers.moe import MoEDecoderLayer

        layer_cls = nn.remat(DecoderLayer) if self.remat else DecoderLayer
        moe_cls = nn.remat(MoEDecoderLayer) if self.remat else MoEDecoderLayer
        common = dict(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            ff_dim=self.ff_dim,
            attention_dropout_rate=self.attention_dropout_rate,
            dense_dropout_rate=self.dense_dropout_rate,
            norm_epsilon=self.norm_epsilon,
            pre_norm=self.pre_norm,
            causal=self.causal,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attention_impl=self.attention_impl,
            score_dtype=self.score_dtype,
            gelu_approximate=self.gelu_approximate,
            norm_stats_dtype=self.norm_stats_dtype,
        )
        self.layers = [
            moe_cls(
                n_experts=self.moe_n_experts,
                capacity_factor=self.moe_capacity_factor,
                router_z_loss_weight=self.moe_router_z_loss_weight,
                n_selected_experts=self.moe_n_selected_experts,
                group_size=self.moe_group_size,
                **common,
            )
            if self._moe_at(i)
            else layer_cls(**common)
            for i in range(self.num_layers)
        ]
        self.norm_layer = (
            _make_norm(self.norm_epsilon, self.dtype,
                       self.param_dtype, self.norm_stats_dtype)
            if self.norm_output
            else None
        )

    def __call__(self, inputs, mask=None, deterministic: bool = True,
                 decode: bool = False, decode_index=None):
        x, x_encoder = inputs

        if decode and self.moe_every_n > 0:
            # MoE layers contest expert capacity across buffer positions and
            # cannot reproduce full-buffer numerics one token at a time —
            # generation auto-falls back to full recompute for them
            # (models/generation.py _resolve_use_cache); error loudly rather
            # than decode a routed stack with a silently wrong cache.
            raise NotImplementedError(
                "KV-cached decode is not supported for MoE-routed decoders "
                f"(moe_every_n={self.moe_every_n}); use the full-recompute "
                "path (use_cache=False)."
            )

        decode_sequence = []
        for layer in self.layers:
            if decode:
                x = layer([x, x_encoder], mask=mask,
                          deterministic=deterministic, decode=True,
                          decode_index=decode_index)
            else:
                x = layer([x, x_encoder], mask=mask,
                          deterministic=deterministic)
            decode_sequence.append(x)

        if self.return_sequence:
            if self.norm_layer is not None:
                decode_sequence = [self.norm_layer(h) for h in decode_sequence]
            # [batch, n_layers, t, d] (transformer.py:419-420)
            return jnp.stack(decode_sequence, axis=1)

        x = decode_sequence[-1]
        if self.norm_layer is not None:
            x = self.norm_layer(x)
        return x

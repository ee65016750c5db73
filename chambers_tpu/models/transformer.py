"""Token-level sequence-to-sequence transformer.

Parity: reference ``chambers/models/transformer.py:9-56``: embedding with
``mask_zero`` padding masks + sinusoidal positional encoding on both sides,
post-norm Encoder, causal Decoder with cross-attention, Dense vocab head.

Divergence (deliberate): the reference passes ``embed_dim`` positionally into
``PositionalEncoding1D``'s ``temperature`` argument (models/transformer.py:26,
40) — a bug that sets the sincos temperature to e.g. 512 instead of 10000.
This build uses the standard temperature (SURVEY.md §2.4 flags the quirk as
not-to-replicate).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from chambers_tpu.layers.embedding import (
    PositionalEncoding1D,
    positional_encoding_1d,
)
from chambers_tpu.layers.transformer import Decoder, Encoder
from chambers_tpu.quantization import QuantDense


class Seq2SeqTransformer(nn.Module):
    input_vocab_size: int
    output_vocab_size: int
    embed_dim: int
    num_heads: int
    dim_feedforward: int
    num_encoder_layers: int
    num_decoder_layers: int
    dropout_rate: float = 0.1
    dtype: Optional[Any] = None
    # 'flash' runs the Pallas blockwise kernel with the token padding masks
    # applied in-kernel (ops/flash_attention.py) — the fwd+bwd win regime is
    # t >= 512 (BASELINE.md); attention dropout and cached decode steps fall
    # back to XLA automatically.
    attention_impl: str = "xla"
    score_dtype: Optional[Any] = None
    # GShard-style MoE on BOTH stacks: every n-th encoder and decoder MLP
    # becomes a routed expert MLP (chambers_tpu.layers.moe). 0 = dense
    # everywhere (the reference architecture).
    moe_every_n: int = 0
    moe_n_experts: int = 8
    moe_capacity_factor: float = 1.25
    moe_router_z_loss_weight: float = 0.0
    moe_n_selected_experts: int = 1
    moe_group_size: Optional[int] = None

    def setup(self):
        self.inputs_embed = nn.Embed(
            self.input_vocab_size, self.embed_dim, dtype=self.dtype,
            name="inputs_embed",
        )
        self.targets_embed = nn.Embed(
            self.output_vocab_size, self.embed_dim, dtype=self.dtype,
            name="targets_embed",
        )
        self.pos_encoding = PositionalEncoding1D()
        self.encoder = Encoder(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            ff_dim=self.dim_feedforward,
            num_layers=self.num_encoder_layers,
            attention_dropout_rate=self.dropout_rate,
            dense_dropout_rate=self.dropout_rate,
            pre_norm=False,
            moe_every_n=self.moe_every_n,
            moe_n_experts=self.moe_n_experts,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_router_z_loss_weight=self.moe_router_z_loss_weight,
            moe_n_selected_experts=self.moe_n_selected_experts,
            moe_group_size=self.moe_group_size,
            dtype=self.dtype,
            attention_impl=self.attention_impl,
            score_dtype=self.score_dtype,
            name="encoder",
        )
        self.decoder = Decoder(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            ff_dim=self.dim_feedforward,
            num_layers=self.num_decoder_layers,
            attention_dropout_rate=self.dropout_rate,
            dense_dropout_rate=self.dropout_rate,
            pre_norm=False,
            norm_output=False,
            causal=True,
            moe_every_n=self.moe_every_n,
            moe_n_experts=self.moe_n_experts,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_router_z_loss_weight=self.moe_router_z_loss_weight,
            moe_n_selected_experts=self.moe_n_selected_experts,
            moe_group_size=self.moe_group_size,
            dtype=self.dtype,
            attention_impl=self.attention_impl,
            score_dtype=self.score_dtype,
            name="decoder",
        )
        self.vocab_head = QuantDense(self.output_vocab_size, dtype=self.dtype)

    def encode(self, tokens, deterministic: bool = True):
        """Source side only: ``[b, t_src]`` tokens -> ``(memory, mask)``.

        Exposed so autoregressive decoding (``models/generation.py``) can
        run the encoder ONCE and re-use the memory every step; call with
        ``module.apply(variables, tokens, method="encode")``.
        """
        input_mask = tokens != 0
        x_enc = self.inputs_embed(tokens)
        x_enc = self.pos_encoding(x_enc)
        x_enc = self.encoder(x_enc, mask=input_mask,
                             deterministic=deterministic)
        return x_enc, input_mask

    def decode(self, targets, x_enc, input_mask, deterministic: bool = True,
               decode: bool = False):
        """Target side given precomputed encoder memory -> vocab logits.

        ``decode=True`` runs the same full-length forward while creating the
        incremental KV-cache variables (collection ``"cache"``) — call once
        with ``mutable=["cache"]`` over a ``[b, max_len]`` buffer to prime
        the cache, then step with :meth:`decode_step`.
        """
        target_mask = targets != 0
        x_dec = self.targets_embed(targets)
        x_dec = self.pos_encoding(x_dec)
        x_dec = self.decoder(
            [x_dec, x_enc], mask=[target_mask, input_mask],
            deterministic=deterministic, decode=decode,
        )
        return self.vocab_head(x_dec)

    def decode_step(self, token, index, x_enc, input_mask, max_len: int):
        """One incremental decode step over a primed KV cache.

        :param token: ``[b, 1]`` int — the token fed at target position
            ``index`` (BOS for step 0, then the previously emitted token).
        :param index: scalar int32 — the target position being decoded
            (must equal the number of steps already taken).
        :param max_len: static decode-buffer length; the positional row is
            sliced from the same ``positional_encoding_1d(max_len, d)``
            table the full-length path uses, so logits match it exactly.
        :returns: ``[b, 1, vocab]`` logits for position ``index``.

        Call with ``mutable=["cache"]`` and thread the returned cache into
        the next step (``models/generation.py`` does this inside one
        compiled ``fori_loop``).
        """
        target_mask = token != 0
        x = self.targets_embed(token)
        enc = jnp.asarray(
            positional_encoding_1d(max_len, self.embed_dim), x.dtype
        )
        x = x + jax.lax.dynamic_slice_in_dim(enc, index, 1, axis=1)
        # decode_index rides down to the cache writes: the decode loops feed
        # the scan xs value here, which the TPU backend handles correctly
        # where the carried cache_index counter miscompiles (see
        # MultiHeadAttention and tools/diagnose_fori_loop_aliasing.py)
        x = self.decoder(
            [x, x_enc], mask=[target_mask, input_mask],
            deterministic=True, decode=True, decode_index=index,
        )
        return self.vocab_head(x)

    def __call__(self, inputs, deterministic: bool = True):
        """``inputs = [input_tokens, target_tokens]`` int arrays ``[b, t]``.

        Token id 0 is padding (the reference's ``mask_zero=True``,
        models/transformer.py:24,38).
        """
        tokens, targets = inputs
        x_enc, input_mask = self.encode(tokens, deterministic=deterministic)
        return self.decode(targets, x_enc, input_mask,
                           deterministic=deterministic)

"""Positional encodings and learned embeddings.

Parity: reference ``chambers/layers/embedding.py``.

- Sinusoidal encodings use the *interleaved* sin/cos layout of
  embedding.py:14-31: ``out[..., 2i] = sin(pos * rate_{2i})`` and
  ``out[..., 2i+1] = cos(pos * rate_{2i+1})`` where
  ``rate_j = temperature^(-2*(j//2)/dim)``.
- ``PositionalEncoding2D`` (embedding.py:74-152) is the DETR-style 2D code:
  first half of channels encodes the row index, second half the column index.
  The reference has a known bug when ``normalize=True`` — ``width_max`` is
  computed from the *height* range (embedding.py:120-121). This build fixes it
  (normalization uses each axis's own max); with ``normalize=False`` (the
  default) outputs are identical.
- ``LearnedEmbedding1D/0D`` (embedding.py:156-214) and ``ConcatEmbedding``
  (embedding.py:218-286, the CLS/distillation-token mechanism) keep the
  parameter name ``embeddings`` and shapes ``(seq, d)`` / ``(1, d)`` /
  ``(n_embeddings, embedding_dim)`` for checkpoint import.
"""

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def angle_rates(embedding_range, embedding_dim, temperature: float = 10000.0):
    """Per-channel sinusoid rates ``temperature^(-2*(j//2)/dim)``.

    Public parity helper (reference chambers/layers/embedding.py:5-11,
    same signature): ``embedding_range`` is the channel-index vector,
    returned with a leading broadcast axis ``[1, len(range)]``. Traceable
    (jnp), unlike the module's static-precompute internals."""
    r = jnp.asarray(embedding_range, jnp.float32)[None, :]
    exponent = (2.0 * jnp.floor(r / 2.0)) / jnp.float32(embedding_dim)
    return 1.0 / jnp.power(jnp.float32(temperature), exponent)


def sequence_sin_cos_angles(seq, embedding_dim, temperature: float = 10000.0):
    """Interleaved sin/cos encoding of a position column ``seq``.

    Public parity helper (reference embedding.py:14-31, same signature
    and output shape ``[1, seq_len, dim]``): ``seq`` is ``[seq_len, 1]``
    positions; sin rides even channels, cos odd ones."""
    rng = jnp.arange(embedding_dim, dtype=jnp.float32)
    rads = jnp.asarray(seq, jnp.float32) * angle_rates(
        rng, embedding_dim, temperature)
    sine_cos = jnp.stack(
        [jnp.sin(rads[..., 0::2]), jnp.cos(rads[..., 1::2])], axis=-1)
    return sine_cos.reshape(1, rads.shape[0], -1)


def _angle_rates(dim: int, temperature: float) -> np.ndarray:
    j = np.arange(dim, dtype=np.float64)
    exponent = (2.0 * (j // 2)) / float(dim)
    return 1.0 / np.power(float(temperature), exponent)


def _interleaved_sin_cos(angles: np.ndarray) -> np.ndarray:
    """Apply sin to even channels and cos to odd channels (interleaved)."""
    out = np.empty_like(angles)
    out[..., 0::2] = np.sin(angles[..., 0::2])
    out[..., 1::2] = np.cos(angles[..., 1::2])
    return out


def positional_encoding_1d(seq_len: int, dim: int, temperature: float = 10000.0) -> np.ndarray:
    """Sinusoidal positional encoding, shape ``[1, seq_len, dim]`` float32."""
    pos = np.arange(seq_len, dtype=np.float64)[:, None]
    angles = pos * _angle_rates(dim, temperature)[None, :]
    return _interleaved_sin_cos(angles)[None].astype(np.float32)


def positional_encoding_2d(
    height: int,
    width: int,
    dim: int,
    temperature: float = 10000.0,
    normalize: bool = False,
    scale: Optional[float] = None,
    eps: float = 1e-6,
) -> np.ndarray:
    """DETR-style 2D sincos encoding, shape ``[1, height, width, dim]``.

    Channels ``[0:dim//2]`` encode the row (y) index, ``[dim//2:dim]`` the
    column (x) index (embedding.py:135-138 concatenates ``[sine_cos_y,
    sine_cos_x]``).
    """
    if scale is not None and not normalize:
        raise ValueError("normalize should be True if scale is passed")
    if scale is None:
        scale = 2 * np.pi

    ys = np.arange(height, dtype=np.float64)
    xs = np.arange(width, dtype=np.float64)
    if normalize:
        ys = ys / (ys[-1] + eps) * scale
        xs = xs / (xs[-1] + eps) * scale

    dim_1d = dim // 2
    rates = _angle_rates(dim_1d, temperature)
    enc_y = _interleaved_sin_cos(ys[:, None] * rates[None, :])  # [H, dim/2]
    enc_x = _interleaved_sin_cos(xs[:, None] * rates[None, :])  # [W, dim/2]

    enc_y = np.broadcast_to(enc_y[:, None, :], (height, width, dim_1d))
    enc_x = np.broadcast_to(enc_x[None, :, :], (height, width, dim_1d))
    out = np.concatenate([enc_y, enc_x], axis=-1)
    return out[None].astype(np.float32)


class PositionalEncoding1D(nn.Module):
    """Adds (or returns) a precomputed sinusoidal encoding for a static length."""

    temperature: float = 10000.0
    add_to_input: bool = True

    @nn.compact
    def __call__(self, inputs):
        seq_len, dim = inputs.shape[1], inputs.shape[2]
        enc = jnp.asarray(
            positional_encoding_1d(seq_len, dim, self.temperature), inputs.dtype
        )
        if self.add_to_input:
            return inputs + enc
        return enc


class PositionalEncoding2D(nn.Module):
    temperature: float = 10000.0
    normalize: bool = False
    scale: Optional[float] = None
    eps: float = 1e-6
    add_to_input: bool = True

    @nn.compact
    def __call__(self, inputs):
        h, w, dim = inputs.shape[1], inputs.shape[2], inputs.shape[3]
        enc = jnp.asarray(
            positional_encoding_2d(
                h, w, dim,
                temperature=self.temperature,
                normalize=self.normalize,
                scale=self.scale,
                eps=self.eps,
            ),
            inputs.dtype,
        )
        if self.add_to_input:
            return inputs + enc
        return enc


class LearnedEmbedding1D(nn.Module):
    """Learned per-position embedding ``(seq, d)`` added to the input."""

    add_to_input: bool = True
    initializer: Any = nn.initializers.truncated_normal(stddev=0.02)
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        embedding = self.param(
            "embeddings", self.initializer,
            (inputs.shape[1], inputs.shape[-1]), self.param_dtype,
        )
        if self.add_to_input:
            return inputs + embedding.astype(inputs.dtype)
        return embedding


class LearnedEmbedding0D(nn.Module):
    """Learned single embedding ``(1, d)`` broadcast-added to the input."""

    add_to_input: bool = True
    initializer: Any = nn.initializers.truncated_normal(stddev=0.02)
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        embedding = self.param(
            "embeddings", self.initializer, (1, inputs.shape[-1]), self.param_dtype
        )
        if self.add_to_input:
            return inputs + embedding.astype(inputs.dtype)
        return embedding


class ConcatEmbedding(nn.Module):
    """Broadcasts learned token(s) over the batch and concatenates them.

    With ``axis=1, side='left'`` this prepends CLS/distillation tokens
    (embedding.py:250-261; used by ViT at vision_transformer.py:249-256).
    """

    n_embeddings: int
    embedding_dim: int
    axis: int = -1
    side: str = "left"
    initializer: Any = nn.initializers.truncated_normal(stddev=0.02)
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        if self.side not in ("left", "right"):
            raise ValueError("Argument `side` must be either 'left' or 'right'.")
        embedding = self.param(
            "embeddings", self.initializer,
            (self.n_embeddings, self.embedding_dim), self.param_dtype,
        )
        batch = inputs.shape[0]
        embedding = jnp.broadcast_to(
            embedding.astype(inputs.dtype),
            (batch, self.n_embeddings, self.embedding_dim),
        )
        operands = [embedding, inputs] if self.side == "left" else [inputs, embedding]
        return jnp.concatenate(operands, axis=self.axis)

"""Positional encoding / embedding layer tests.

Golden formula checks reproduce chambers/layers/embedding.py:5-31
independently in numpy (interleaved sin/cos with rate 1/T^(2*(j//2)/d)).
"""

import numpy as np
import jax

from chambers_tpu.layers import (
    ConcatEmbedding,
    LearnedEmbedding0D,
    LearnedEmbedding1D,
    PositionalEncoding1D,
    PositionalEncoding2D,
    positional_encoding_1d,
    positional_encoding_2d,
)


def _expected_1d(seq_len, dim, temperature=10000.0):
    out = np.zeros((seq_len, dim))
    for pos in range(seq_len):
        for j in range(dim):
            rate = 1.0 / temperature ** ((2 * (j // 2)) / dim)
            angle = pos * rate
            out[pos, j] = np.sin(angle) if j % 2 == 0 else np.cos(angle)
    return out[None].astype(np.float32)


def test_positional_encoding_1d_formula():
    enc = positional_encoding_1d(7, 10)
    np.testing.assert_allclose(enc, _expected_1d(7, 10), atol=1e-6)


def test_positional_encoding_1d_temperature():
    enc = positional_encoding_1d(5, 8, temperature=100.0)
    np.testing.assert_allclose(enc, _expected_1d(5, 8, 100.0), atol=1e-6)


def test_positional_encoding_1d_layer_adds():
    x = np.random.RandomState(0).randn(2, 7, 10).astype(np.float32)
    layer = PositionalEncoding1D()
    out = layer.apply({}, x)
    np.testing.assert_allclose(np.asarray(out), x + _expected_1d(7, 10), atol=1e-6)


def test_positional_encoding_2d_layout():
    h, w, d = 4, 6, 8
    enc = positional_encoding_2d(h, w, d)
    assert enc.shape == (1, h, w, d)
    row_code = _expected_1d(h, d // 2)[0]  # [h, d/2]
    col_code = _expected_1d(w, d // 2)[0]  # [w, d/2]
    # first half of channels varies with the row index, constant across cols
    for col in range(w):
        np.testing.assert_allclose(enc[0, :, col, : d // 2], row_code, atol=1e-6)
    # second half varies with the column index
    for row in range(h):
        np.testing.assert_allclose(enc[0, row, :, d // 2:], col_code, atol=1e-6)


def test_positional_encoding_2d_normalized_scale():
    h, w, d = 5, 5, 8
    enc = positional_encoding_2d(h, w, d, normalize=True)
    ys = np.arange(h) / (h - 1 + 1e-6) * (2 * np.pi)
    expected_first = np.sin(ys)  # rate for channel 0 is 1.0
    np.testing.assert_allclose(enc[0, :, 0, 0], expected_first, atol=1e-5)


def test_learned_embedding_1d():
    x = np.ones((2, 5, 4), np.float32)
    layer = LearnedEmbedding1D()
    variables = layer.init(jax.random.PRNGKey(0), x)
    emb = np.asarray(variables["params"]["embeddings"])
    assert emb.shape == (5, 4)
    out = layer.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), x + emb, atol=1e-6)


def test_learned_embedding_0d():
    x = np.zeros((2, 5, 4), np.float32)
    layer = LearnedEmbedding0D()
    variables = layer.init(jax.random.PRNGKey(0), x)
    assert variables["params"]["embeddings"].shape == (1, 4)


def test_concat_embedding_left_token():
    x = np.random.RandomState(0).randn(3, 5, 4).astype(np.float32)
    layer = ConcatEmbedding(n_embeddings=1, embedding_dim=4, axis=1, side="left")
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = np.asarray(layer.apply(variables, x))
    emb = np.asarray(variables["params"]["embeddings"])
    assert out.shape == (3, 6, 4)
    for i in range(3):
        np.testing.assert_allclose(out[i, 0], emb[0], atol=1e-6)
    np.testing.assert_allclose(out[:, 1:], x, atol=1e-6)


def test_concat_embedding_right():
    x = np.zeros((2, 3, 4), np.float32)
    layer = ConcatEmbedding(n_embeddings=2, embedding_dim=4, axis=1, side="right")
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = np.asarray(layer.apply(variables, x))
    assert out.shape == (2, 5, 4)
    np.testing.assert_allclose(out[:, :3], x, atol=1e-6)

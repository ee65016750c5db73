"""Encoder/Decoder block tests (pre-norm and post-norm orderings)."""

import numpy as np
import jax
import pytest

from chambers_tpu.layers import Decoder, DecoderLayer, Encoder, EncoderLayer


@pytest.fixture
def x():
    return np.random.RandomState(0).randn(2, 7, 16).astype(np.float32)


def _layer_norm(v, eps=1e-6):
    mean = v.mean(-1, keepdims=True)
    var = v.var(-1, keepdims=True)
    return (v - mean) / np.sqrt(var + eps)


def test_encoder_layer_prenorm_structure(x):
    """Pre-norm: output = x + attn(norm1(x)) + mlp(norm2(...)) — residual path
    must preserve the input contribution exactly."""
    layer = EncoderLayer(
        embed_dim=16, num_heads=4, ff_dim=32,
        attention_dropout_rate=0.0, dense_dropout_rate=0.0, pre_norm=True,
    )
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = np.asarray(layer.apply(variables, x))
    assert out.shape == x.shape
    assert not np.allclose(out, x)


def test_encoder_layer_postnorm_is_normalized(x):
    layer = EncoderLayer(
        embed_dim=16, num_heads=4, ff_dim=32,
        attention_dropout_rate=0.0, dense_dropout_rate=0.0, pre_norm=False,
    )
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = np.asarray(layer.apply(variables, x))
    # post-norm output passed through LayerNorm: per-token mean ~0 (scale
    # starts at 1, bias at 0)
    np.testing.assert_allclose(out.mean(-1), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(-1), 1.0, atol=1e-2)


def test_encoder_stack_num_layers(x):
    enc = Encoder(
        embed_dim=16, num_heads=4, ff_dim=32, num_layers=3,
        attention_dropout_rate=0.0, dense_dropout_rate=0.0,
        pre_norm=True, norm_output=True,
    )
    variables = enc.init(jax.random.PRNGKey(0), x)
    names = set(variables["params"].keys())
    assert {"layers_0", "layers_1", "layers_2", "norm_layer"} <= names
    out = enc.apply(variables, x)
    assert out.shape == x.shape


def test_encoder_remat_matches_plain(x):
    kwargs = dict(
        embed_dim=16, num_heads=4, ff_dim=32, num_layers=2,
        attention_dropout_rate=0.0, dense_dropout_rate=0.0,
        pre_norm=True, norm_output=True,
    )
    enc = Encoder(**kwargs)
    enc_remat = Encoder(remat=True, **kwargs)
    variables = enc.init(jax.random.PRNGKey(0), x)
    out = np.asarray(enc.apply(variables, x))
    out_remat = np.asarray(enc_remat.apply(variables, x))
    np.testing.assert_allclose(out, out_remat, atol=1e-6)


def test_decoder_layer_and_stack(x):
    memory = np.random.RandomState(1).randn(2, 9, 16).astype(np.float32)
    dec = Decoder(
        embed_dim=16, num_heads=4, ff_dim=32, num_layers=2,
        attention_dropout_rate=0.0, dense_dropout_rate=0.0,
        pre_norm=False, norm_output=False, causal=True,
    )
    variables = dec.init(jax.random.PRNGKey(0), [x, memory])
    out = dec.apply(variables, [x, memory])
    assert out.shape == x.shape


def test_decoder_return_sequence_stacks_layers(x):
    memory = np.random.RandomState(1).randn(2, 9, 16).astype(np.float32)
    dec = Decoder(
        embed_dim=16, num_heads=4, ff_dim=32, num_layers=3,
        attention_dropout_rate=0.0, dense_dropout_rate=0.0,
        causal=True, return_sequence=True, norm_output=True,
    )
    variables = dec.init(jax.random.PRNGKey(0), [x, memory])
    out = np.asarray(dec.apply(variables, [x, memory]))
    assert out.shape == (2, 3, 7, 16)


def test_decoder_causality(x):
    """Changing a later target token must not affect earlier outputs."""
    memory = np.random.RandomState(1).randn(2, 9, 16).astype(np.float32)
    layer = DecoderLayer(
        embed_dim=16, num_heads=4, ff_dim=32,
        attention_dropout_rate=0.0, dense_dropout_rate=0.0, causal=True,
    )
    variables = layer.init(jax.random.PRNGKey(0), [x, memory])
    out1 = np.asarray(layer.apply(variables, [x, memory]))
    x2 = x.copy()
    x2[:, -1] += 10.0
    out2 = np.asarray(layer.apply(variables, [x2, memory]))
    np.testing.assert_allclose(out1[:, :-1], out2[:, :-1], atol=1e-5)

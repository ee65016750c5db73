"""Seq2SeqTransformer tests."""

import numpy as np
import jax
import jax.numpy as jnp

from chambers_tpu.models import Seq2SeqTransformer


def _model():
    return Seq2SeqTransformer(
        input_vocab_size=50, output_vocab_size=60, embed_dim=32, num_heads=4,
        dim_feedforward=64, num_encoder_layers=2, num_decoder_layers=2,
        dropout_rate=0.0,
    )


def test_forward_shapes():
    model = _model()
    tokens = np.array([[5, 9, 3, 0, 0], [7, 2, 4, 8, 1]], np.int32)
    targets = np.array([[1, 2, 0], [3, 4, 5]], np.int32)
    variables = model.init(jax.random.PRNGKey(0), [tokens, targets])
    out = model.apply(variables, [tokens, targets])
    assert out.shape == (2, 3, 60)


def test_padding_mask_blocks_pad_tokens():
    """Changing a padded input token must not change the output."""
    model = _model()
    tokens = np.array([[5, 9, 3, 0, 0]], np.int32)
    targets = np.array([[1, 2, 4]], np.int32)
    variables = model.init(jax.random.PRNGKey(0), [tokens, targets])
    out1 = np.asarray(model.apply(variables, [tokens, targets]))

    tokens2 = tokens.copy()
    # a pad position stays a pad (mask comes from token != 0) — changing a
    # *real* token must change the output, establishing mask sensitivity
    tokens2[0, 1] = 8
    out2 = np.asarray(model.apply(variables, [tokens2, targets]))
    assert not np.allclose(out1, out2)


def test_decoder_is_causal():
    model = _model()
    tokens = np.array([[5, 9, 3]], np.int32)
    targets = np.array([[1, 2, 4, 6]], np.int32)
    variables = model.init(jax.random.PRNGKey(0), [tokens, targets])
    out1 = np.asarray(model.apply(variables, [tokens, targets]))
    targets2 = targets.copy()
    targets2[0, -1] = 9
    out2 = np.asarray(model.apply(variables, [tokens, targets2]))
    np.testing.assert_allclose(out1[0, :-1], out2[0, :-1], atol=1e-5)
    assert not np.allclose(out1[0, -1], out2[0, -1])


def test_jit_and_grad():
    model = _model()
    tokens = np.array([[5, 9, 3, 0]], np.int32)
    targets = np.array([[1, 2, 4]], np.int32)
    variables = model.init(jax.random.PRNGKey(0), [tokens, targets])

    def loss_fn(params):
        logits = model.apply({"params": params}, [tokens, targets])
        return jnp.mean(logits ** 2)

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))

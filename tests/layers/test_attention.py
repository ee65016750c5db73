"""MultiHeadAttention unit tests.

The numpy model reproduces the reference semantics of
chambers/layers/attention.py:99-127 (einsum projections with the
(d, n_heads, head_dim) layout, score scaling by sqrt(head_dim), Keras-style
[q_mask, v_mask] handling) independently, so both implementations are checked
against the same spec.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chambers_tpu.layers import MultiHeadAttention, scaled_dot_product_attention


def _np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _np_mha(params, q, v, k, causal=False, q_mask=None, v_mask=None):
    query = np.einsum("btd,dnh->bnth", q, params["w_query"]) + params["b_query"]
    value = np.einsum("btd,dnh->bnth", v, params["w_value"]) + params["b_value"]
    key = np.einsum("btd,dnh->bnth", k, params["w_key"]) + params["b_key"]

    h = query.shape[-1]
    scores = np.einsum("bnqh,bnkh->bnqk", query, key) / np.sqrt(h)
    if v_mask is not None:
        scores = scores + np.where(v_mask[:, None, None, :], 0.0, -1e9)
    if causal:
        tq, tv = scores.shape[-2], scores.shape[-1]
        tri = np.tril(np.ones((tq, tv), dtype=bool), k=tv - tq)
        scores = np.where(tri[None, None], scores, -1e9)
    probs = _np_softmax(scores)
    out = np.einsum("bnqk,bnkh->bnqh", probs, value)
    if q_mask is not None:
        out = out * q_mask[:, None, :, None]
    x = np.einsum("bnth,ndh->btd", out, params["w_projection"]) + params["b_projection"]
    return x


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _init(mha, *args, **kwargs):
    variables = mha.init(jax.random.PRNGKey(0), *args, **kwargs)
    return variables


def test_mha_matches_reference_semantics(rng):
    b, t, d, n, h = 2, 7, 16, 4, 4
    mha = MultiHeadAttention(head_dim=h, num_heads=n, dropout_rate=0.0)
    x = rng.randn(b, t, d).astype(np.float32)
    variables = _init(mha, [x, x])
    params = jax.tree.map(np.asarray, variables["params"])

    out = mha.apply(variables, [x, x])
    expected = _np_mha(params, x, x, x)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_mha_param_layout(rng):
    d, n, h = 16, 4, 4
    mha = MultiHeadAttention(head_dim=h, num_heads=n)
    x = rng.randn(2, 5, d).astype(np.float32)
    params = _init(mha, [x, x])["params"]
    assert params["w_query"].shape == (d, n, h)
    assert params["b_query"].shape == (n, 1, h)
    assert params["w_projection"].shape == (n, d, h)
    assert params["b_projection"].shape == (1, d)


def test_mha_cross_attention_and_masks(rng):
    b, tq, tv, d, n, h = 2, 5, 9, 16, 2, 8
    mha = MultiHeadAttention(head_dim=h, num_heads=n, dropout_rate=0.0)
    q = rng.randn(b, tq, d).astype(np.float32)
    v = rng.randn(b, tv, d).astype(np.float32)
    q_mask = rng.rand(b, tq) > 0.3
    v_mask = rng.rand(b, tv) > 0.3
    v_mask[:, 0] = True  # keep at least one key per row

    variables = _init(mha, [q, v], mask=[q_mask, v_mask])
    params = jax.tree.map(np.asarray, variables["params"])

    out = mha.apply(variables, [q, v], mask=[q_mask, v_mask])
    expected = _np_mha(params, q, v, v, q_mask=q_mask, v_mask=v_mask)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_fused_self_attention_matches_split_path(rng):
    """Self-attention ([x, x, x], same array) takes the single stacked-QKV
    einsum; passing copies forces the 3-einsum path. Same math, same K-dim
    accumulation — results must agree to float tolerance."""
    b, t, d, n, h = 2, 7, 16, 4, 4
    mha = MultiHeadAttention(head_dim=h, num_heads=n, dropout_rate=0.0)
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    variables = _init(mha, [x, x])
    fused = mha.apply(variables, [x, x, x])
    split = mha.apply(variables, [x, jnp.array(x), jnp.array(x)])
    np.testing.assert_allclose(np.asarray(fused), np.asarray(split),
                               atol=1e-6)


def test_score_dtype_bf16_close_to_fp32(rng):
    b, t, d, n, h = 2, 9, 16, 4, 4
    x = rng.randn(b, t, d).astype(np.float32)
    ref = MultiHeadAttention(head_dim=h, num_heads=n, dropout_rate=0.0)
    variables = _init(ref, [x, x])
    out32 = ref.apply(variables, [x, x])
    bf = MultiHeadAttention(head_dim=h, num_heads=n, dropout_rate=0.0,
                            score_dtype=jnp.bfloat16)
    outbf = bf.apply(variables, [x, x])
    # bf16 scores/softmax: ~1e-2 relative agreement expected
    np.testing.assert_allclose(np.asarray(outbf), np.asarray(out32),
                               atol=5e-2, rtol=5e-2)


def test_score_dtype_bf16_masks_dont_upcast(rng):
    b, tq, tv, d, n, h = 2, 5, 9, 16, 2, 8
    mha = MultiHeadAttention(head_dim=h, num_heads=n, dropout_rate=0.0,
                             causal=True, score_dtype=jnp.bfloat16)
    q = rng.randn(b, tq, d).astype(np.float32)
    v = rng.randn(b, tv, d).astype(np.float32)
    v_mask = rng.rand(b, tv) > 0.3
    v_mask[:, 0] = True
    variables = _init(mha, [q, v], mask=[None, v_mask])
    out = mha.apply(variables, [q, v], mask=[None, v_mask])
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_causal_attention_ignores_future(rng):
    b, n, t, h = 1, 2, 6, 4
    q = rng.randn(b, n, t, h).astype(np.float32)
    v = rng.randn(b, n, t, h).astype(np.float32)

    out1 = scaled_dot_product_attention(jnp.asarray(q), jnp.asarray(v), causal=True)
    # Perturb the future; prefix outputs must not change.
    v2 = v.copy()
    v2[:, :, -1] += 100.0
    q2 = q.copy()
    q2[:, :, -1] += 100.0
    out2 = scaled_dot_product_attention(jnp.asarray(q2), jnp.asarray(v2), causal=True)
    np.testing.assert_allclose(
        np.asarray(out1)[:, :, : t - 1], np.asarray(out2)[:, :, : t - 1], atol=1e-5
    )


def test_dropout_deterministic_flag(rng):
    d, n, h = 8, 2, 4
    mha = MultiHeadAttention(head_dim=h, num_heads=n, dropout_rate=0.5)
    x = rng.randn(2, 4, d).astype(np.float32)
    variables = _init(mha, [x, x])
    out_det = mha.apply(variables, [x, x], deterministic=True)
    out_det2 = mha.apply(variables, [x, x], deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_det), np.asarray(out_det2))

    out_train = mha.apply(
        variables, [x, x], deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert not np.allclose(np.asarray(out_det), np.asarray(out_train))

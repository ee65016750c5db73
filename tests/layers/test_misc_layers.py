"""Tests for pooling, descriptors, distance, normalization, ops, activations,
and tensor/ranking utils."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import erf

from chambers_tpu.activations import gelu
from chambers_tpu.layers import (
    RMAC,
    CosineSimilarity,
    GlobalGeneralizedMean,
    L1Distance,
    L2Distance,
    L2Normalization,
    RoiPooling,
    ops,
    rmac_regions,
)
from chambers_tpu.utils.ranking import (
    mean_average_precision,
    recall_at_k,
    score_matrix_to_binary_ranking,
)
from chambers_tpu.utils.tensor import remove_diagonal, remove_indices


def test_gelu_exact_matches_erf():
    x = np.array([-3.0, -1.0, 0.0, 1.0, 3.0], np.float32)
    expected = 0.5 * x * (1 + erf(x / np.sqrt(2)))
    np.testing.assert_allclose(np.asarray(gelu(jnp.asarray(x))), expected, atol=1e-6)
    # reference docstring values (chambers/activations.py:12-20)
    np.testing.assert_allclose(
        np.asarray(gelu(jnp.asarray(x))),
        [-0.00404951, -0.15865529, 0.0, 0.8413447, 2.9959507],
        atol=1e-6,
    )


def test_gelu_tanh_approximation():
    x = np.array([-3.0, -1.0, 0.0, 1.0, 3.0], np.float32)
    np.testing.assert_allclose(
        np.asarray(gelu(jnp.asarray(x), approximate=True)),
        [-0.00363752, -0.15880796, 0.0, 0.841192, 2.9963627],
        atol=1e-6,
    )


def test_gem_pooling_p1_is_average():
    x = np.abs(np.random.RandomState(0).randn(2, 4, 4, 3)).astype(np.float32) + 0.1
    gem = GlobalGeneralizedMean(p=1.0)
    variables = gem.init(jax.random.PRNGKey(0), x)
    out = np.asarray(gem.apply(variables, x))
    np.testing.assert_allclose(out, x.mean((1, 2)), rtol=1e-5)


def test_gem_pooling_large_p_approaches_max():
    x = np.abs(np.random.RandomState(0).randn(1, 6, 6, 2)).astype(np.float32) + 0.1
    gem = GlobalGeneralizedMean(p=64.0)
    variables = gem.init(jax.random.PRNGKey(0), x)
    out = np.asarray(gem.apply(variables, x))
    np.testing.assert_allclose(out, x.max((1, 2)), rtol=0.1)


def test_gem_per_channel_p_shape():
    x = np.ones((1, 3, 3, 5), np.float32)
    gem = GlobalGeneralizedMean(p=3.0, shared=False)
    variables = gem.init(jax.random.PRNGKey(0), x)
    assert variables["params"]["p"].shape == (5,)


def test_roi_pooling_max():
    x = np.zeros((1, 8, 8, 1), np.float32)
    x[0, 2, 3, 0] = 5.0
    x[0, 6, 6, 0] = 9.0
    # (x, y, w, h): box1 covers the 5.0; box2 covers the 9.0
    boxes = np.array([[[2, 1, 3, 3], [5, 5, 3, 3]]], np.int32)
    out = np.asarray(RoiPooling()([jnp.asarray(x), jnp.asarray(boxes)]))
    assert out.shape == (1, 2, 1)
    assert out[0, 0, 0] == 5.0
    assert out[0, 1, 0] == 9.0


def test_rmac_regions_square():
    regions = rmac_regions(8, 8, 3)
    assert regions.shape[1] == 4
    # scale 1 on a square map: one region covering most of the map
    assert (regions[:, 2] > 0).all() and (regions[:, 3] > 0).all()
    # all regions fit in bounds loosely (centers clamp can give offset < 0)
    assert (regions[:, 0] < 8).all() and (regions[:, 1] < 8).all()


def test_rmac_pools_per_region_max():
    x = np.random.RandomState(0).rand(2, 8, 8, 4).astype(np.float32)
    rmac = RMAC(scales=2)
    out = np.asarray(rmac(jnp.asarray(x)))
    regions = rmac_regions(8, 8, 2)
    assert out.shape == (2, len(regions), 4)
    for r, (ox, oy, tw, th) in enumerate(regions):
        y0, y1 = max(oy, 0), min(oy + th, 8)
        x0, x1 = max(ox, 0), min(ox + tw, 8)
        expected = x[:, y0:y1, x0:x1].max((1, 2))
        np.testing.assert_allclose(out[:, r], expected, atol=1e-6)


def test_distances():
    rng = np.random.RandomState(0)
    a = rng.randn(4, 8).astype(np.float32)
    b = rng.randn(4, 8).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(L1Distance()([a, b])), np.abs(a - b).sum(-1), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(L2Distance()([a, b])),
        np.sqrt(((a - b) ** 2).sum(-1)), atol=1e-5,
    )
    cos = np.asarray(CosineSimilarity()([a, b]))
    an = a / np.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=-1, keepdims=True)
    np.testing.assert_allclose(cos, ((an * bn).sum(-1) + 1) / 2, atol=1e-5)
    assert (cos >= 0).all() and (cos <= 1).all()


def test_l2_normalization():
    x = np.random.RandomState(0).randn(3, 5).astype(np.float32)
    out = np.asarray(L2Normalization(axis=-1)(x))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_ops_layers():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.testing.assert_allclose(np.asarray(ops.Sum(axis=1)(x)), x.sum(1))
    np.testing.assert_allclose(np.asarray(ops.Max(axis=0)(x)), x.max(0))
    np.testing.assert_allclose(np.asarray(ops.Min(axis=0)(x)), x.min(0))
    np.testing.assert_allclose(np.asarray(ops.Prod(axis=1)(x)), x.prod(1))
    np.testing.assert_allclose(np.asarray(ops.Argmax(axis=1)(x)), x.argmax(1))
    np.testing.assert_allclose(np.asarray(ops.Argmin(axis=1)(x)), x.argmin(1))
    a = np.random.RandomState(0).randn(3, 4).astype(np.float32)
    b = np.random.RandomState(1).randn(5, 4).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ops.Matmul(transpose_b=True)([a, b])), a @ b.T, atol=1e-5
    )


def test_remove_indices_and_diagonal():
    x = jnp.arange(5.0)
    np.testing.assert_array_equal(
        np.asarray(remove_indices(x, [1, 3])), [0.0, 2.0, 4.0]
    )
    mat = jnp.arange(9.0).reshape(3, 3)
    np.testing.assert_array_equal(
        np.asarray(remove_diagonal(mat)),
        [[1.0, 2.0], [3.0, 5.0], [6.0, 7.0]],
    )


def test_score_matrix_to_binary_ranking():
    scores = jnp.asarray([[0.9, 0.1, 0.5], [0.2, 0.8, 0.3]])
    yq = jnp.asarray([0, 1])
    yc = jnp.asarray([0, 1, 0])
    ranking = np.asarray(score_matrix_to_binary_ranking(scores, yq, yc))
    # query 0 ranks candidates [0, 2, 1] -> labels [0, 0, 1] -> binary [1, 1, 0]
    np.testing.assert_array_equal(ranking[0], [1.0, 1.0, 0.0])
    # query 1 ranks [1, 2, 0] -> [1, 0, 0] -> [1, 0, 0]
    np.testing.assert_array_equal(ranking[1], [1.0, 0.0, 0.0])

    r = np.asarray(
        score_matrix_to_binary_ranking(scores, yq, yc, remove_top1=True)
    )
    assert r.shape == (2, 2)


def test_recall_and_map():
    binary = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    assert float(recall_at_k(binary, 1)) == 0.5
    assert float(recall_at_k(binary, 3)) == 1.0
    # AP(query0) = 1.0; AP(query1) = 1/3
    np.testing.assert_allclose(
        float(mean_average_precision(binary)), (1.0 + 1.0 / 3.0) / 2, atol=1e-6
    )


def test_fast_layer_norm_matches_nn_layernorm():
    """FastLayerNorm with f32 stats must equal nn.LayerNorm exactly (same
    math, same param names so checkpoints interchange)."""
    import flax.linen as nn

    from chambers_tpu.layers.normalization import FastLayerNorm

    x = jnp.asarray(np.random.RandomState(0).randn(4, 7, 16)
                    .astype(np.float32))
    ref = nn.LayerNorm(epsilon=1e-6)
    v = ref.init(jax.random.PRNGKey(0), x)
    fast = FastLayerNorm(epsilon=1e-6, stats_dtype=jnp.float32)
    vf = fast.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(v) == jax.tree.structure(vf)
    np.testing.assert_allclose(np.asarray(ref.apply(v, x)),
                               np.asarray(fast.apply(v, x)), atol=1e-6)


def test_fast_layer_norm_bf16_stats_close():
    from chambers_tpu.layers.normalization import FastLayerNorm

    import flax.linen as nn

    x = jnp.asarray(np.random.RandomState(1).randn(4, 7, 16)
                    .astype(np.float32))
    ref = nn.LayerNorm(epsilon=1e-6)
    v = ref.init(jax.random.PRNGKey(0), x)
    fast = FastLayerNorm(epsilon=1e-6, stats_dtype=jnp.bfloat16)
    out = np.asarray(fast.apply(v, x), np.float32)
    np.testing.assert_allclose(out, np.asarray(ref.apply(v, x)),
                               atol=0.05, rtol=0.05)


def test_norm_stats_dtype_knob_on_encoder():
    """norm_stats_dtype plumbs through Encoder; param structure unchanged."""
    from chambers_tpu.layers import Encoder

    x = jnp.asarray(np.random.RandomState(2).randn(2, 9, 16)
                    .astype(np.float32))
    exact = Encoder(embed_dim=16, num_heads=2, ff_dim=32, num_layers=2,
                    pre_norm=True, norm_output=True,
                    attention_dropout_rate=0.0, dense_dropout_rate=0.0)
    v = exact.init(jax.random.PRNGKey(0), x)
    fast = Encoder(embed_dim=16, num_heads=2, ff_dim=32, num_layers=2,
                   pre_norm=True, norm_output=True,
                   attention_dropout_rate=0.0, dense_dropout_rate=0.0,
                   norm_stats_dtype=jnp.bfloat16)
    vf = fast.init(jax.random.PRNGKey(1), x)
    assert jax.tree.structure(v) == jax.tree.structure(vf)
    out_e = np.asarray(exact.apply(v, x))
    out_f = np.asarray(fast.apply(v, x))  # same params, bf16-stat norms
    assert not np.array_equal(out_e, out_f)
    np.testing.assert_allclose(out_f, out_e, atol=0.1, rtol=0.1)

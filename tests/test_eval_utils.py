"""batch_predict_pairs / pair_iteration_dataset tests."""

import numpy as np
import jax.numpy as jnp

from chambers_tpu.layers import CosineSimilarity
from chambers_tpu.utils.data import (
    batch_predict_pairs,
    pair_iteration_dataset,
    reshape_pair_predictions,
)
from chambers_tpu.utils.ranking import score_matrix_to_binary_ranking


def _pair_cosine(inputs):
    a, b = inputs  # [bq, d], [bc, d]
    return CosineSimilarity()([a[:, None, :], b[None, :, :]])


def test_pair_iteration_dataset_cartesian_order():
    q = np.arange(5)[:, None]
    c = np.arange(7)[:, None]
    pairs = list(pair_iteration_dataset(q, c, bq=2, bc=3))
    # 3 query batches x 3 candidate batches, candidate-major
    assert len(pairs) == 9
    (qb, cb) = pairs[0]
    np.testing.assert_array_equal(qb, [[0], [1]])
    np.testing.assert_array_equal(cb, [[0], [1], [2]])
    (qb, cb) = pairs[1]
    np.testing.assert_array_equal(qb, [[0], [1]])  # same query batch
    np.testing.assert_array_equal(cb, [[3], [4], [5]])
    (qb, cb) = pairs[3]
    np.testing.assert_array_equal(qb, [[2], [3]])  # next query batch


def test_reshape_pair_predictions():
    nq, nc, bq, bc = 4, 6, 2, 3
    full = np.arange(nq * nc, dtype=np.float32).reshape(nq, nc)
    # simulate per-pair-batch scoring in cartesian order
    blocks = []
    for i in range(nq // bq):
        for j in range(nc // bc):
            blocks.append(full[i * bq:(i + 1) * bq, j * bc:(j + 1) * bc])
    stacked = np.stack(blocks)  # [nqb*ncb, bq, bc]
    out = reshape_pair_predictions(stacked, bq, bc, nq, nc)
    np.testing.assert_array_equal(out, full)


def test_batch_predict_pairs_matches_direct():
    rng = np.random.RandomState(0)
    q = rng.randn(10, 8).astype(np.float32)
    c = rng.randn(7, 8).astype(np.float32)
    scores = batch_predict_pairs(_pair_cosine, q, bq=4, c=c, bc=3, verbose=False)
    direct = np.asarray(_pair_cosine([jnp.asarray(q), jnp.asarray(c)]))
    np.testing.assert_allclose(scores, direct, atol=1e-5)


def test_batch_predict_pairs_self_and_labels():
    rng = np.random.RandomState(0)
    q = rng.randn(6, 4).astype(np.float32)
    yq = np.array([0, 0, 1, 1, 2, 2])
    scores, (yq_out, yc_out) = batch_predict_pairs(
        _pair_cosine, q, bq=4, yq=yq, verbose=False
    )
    assert scores.shape == (6, 6)
    np.testing.assert_array_equal(yq_out.ravel(), yq)
    np.testing.assert_array_equal(yc_out, yq)
    # downstream retrieval eval plumbs through
    ranking = score_matrix_to_binary_ranking(
        jnp.asarray(scores), jnp.asarray(yq), jnp.asarray(yq), remove_top1=True
    )
    assert ranking.shape == (6, 5)

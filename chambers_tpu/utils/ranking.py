"""Retrieval-evaluation ranking utilities.

Parity: reference ``chambers/utils/ranking.py:6-35``, plus recall@k / mAP
helpers the reference leaves to user code.
"""

import jax.numpy as jnp


def score_matrix_to_binary_ranking(
    similarity_matrix, query_labels, candidate_labels, remove_top1=False
):
    """Convert a score matrix to per-query binary relevance rankings.

    :param similarity_matrix: ``[nq, nc]`` similarity scores.
    :param query_labels: ``[nq]`` labels.
    :param candidate_labels: ``[nc]`` labels.
    :param remove_top1: drop each query's best match (self-match convention).
    :return: ``[nq, nc]`` (or ``[nq, nc-1]``) float binary relevance, ranked by
        descending score.
    """
    query_labels = jnp.reshape(query_labels, [-1, 1])
    candidate_labels = jnp.reshape(candidate_labels, [1, -1])
    pair_signs = (query_labels == candidate_labels).astype(jnp.float32)

    index_ranking = jnp.argsort(-similarity_matrix, axis=1, stable=True)
    if remove_top1:
        index_ranking = index_ranking[:, 1:]

    return jnp.take_along_axis(pair_signs, index_ranking, axis=1)


def rank_labels(y, scores, remove_top1=False):
    """Labels sorted by descending score per query; returns (labels, indices)."""
    index_ranking = jnp.argsort(-scores, axis=1, stable=True)
    if remove_top1:
        index_ranking = index_ranking[:, 1:]
    ranking = jnp.take_along_axis(
        jnp.broadcast_to(jnp.reshape(y, [1, -1]), index_ranking.shape[:1] + (y.shape[0],)),
        index_ranking,
        axis=1,
    )
    return ranking, index_ranking


def recall_at_k(binary_ranking, k):
    """Fraction of queries with at least one relevant candidate in the top-k."""
    hits = jnp.max(binary_ranking[:, :k], axis=1)
    return jnp.mean(hits)


def mean_average_precision(binary_ranking):
    """Mean average precision over queries from a binary relevance ranking."""
    n = binary_ranking.shape[1]
    cum_rel = jnp.cumsum(binary_ranking, axis=1)
    ranks = jnp.arange(1, n + 1, dtype=jnp.float32)
    precision_at_i = cum_rel / ranks
    ap_num = jnp.sum(precision_at_i * binary_ranking, axis=1)
    n_rel = jnp.maximum(cum_rel[:, -1], 1.0)
    return jnp.mean(ap_num / n_rel)

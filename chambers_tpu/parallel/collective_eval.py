"""Cross-device retrieval evaluation collectives.

SURVEY.md §5.8: the reference's pairwise-similarity evaluation (§3.4,
``batch_predict_pairs``) becomes, on a mesh, an all-gather of candidate
embeddings over ICI with each device scoring its local query shard — the
canonical sharded ``Z @ Zᵀ``. Expressed with ``shard_map`` so XLA lays the
all-gather on the interconnect.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map  # stable API (jax.experimental.shard_map is deprecated)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_pairwise_scores(queries, candidates, mesh: Mesh,
                                axis: str = "data"):
    """Full ``[nq, nc]`` score matrix with both inputs row-sharded on
    ``axis``; each device all-gathers the candidates and scores its local
    query rows. Output rows are sharded like the queries.
    """

    def local(q_shard, c_shard):
        c_full = jax.lax.all_gather(c_shard, axis, axis=0, tiled=True)
        return q_shard @ c_full.T

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )
    sharding = NamedSharding(mesh, P(axis))
    queries = jax.device_put(jnp.asarray(queries), sharding)
    candidates = jax.device_put(jnp.asarray(candidates), sharding)
    return fn(queries, candidates)


def distributed_recall_at_k(queries, candidates, query_labels,
                            candidate_labels, k: int, mesh: Mesh,
                            axis: str = "data", remove_top1: bool = False):
    """recall@k computed with sharded queries — only per-device top-k and a
    final psum cross the interconnect (scores never leave the device)."""

    def local(q_shard, yq_shard, c_shard, yc_shard):
        c_full = jax.lax.all_gather(c_shard, axis, axis=0, tiled=True)
        yc_full = jax.lax.all_gather(yc_shard, axis, axis=0, tiled=True)
        scores = q_shard @ c_full.T                       # [nq_local, nc]
        kk = k + 1 if remove_top1 else k
        _, top_idx = jax.lax.top_k(scores, kk)
        if remove_top1:
            top_idx = top_idx[:, 1:]
        top_labels = yc_full[top_idx]                     # [nq_local, k]
        hits = jnp.any(top_labels == yq_shard[:, None], axis=1)
        # global mean via psum of (hits, count)
        total = jax.lax.psum(jnp.sum(hits.astype(jnp.float32)), axis)
        count = jax.lax.psum(jnp.float32(hits.shape[0]), axis)
        return jnp.reshape(total / count, (1,))

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    sharding = NamedSharding(mesh, P(axis))
    args = [
        jax.device_put(jnp.asarray(a), sharding)
        for a in (queries, query_labels, candidates, candidate_labels)
    ]
    return fn(args[0], args[1], args[2], args[3])[0]

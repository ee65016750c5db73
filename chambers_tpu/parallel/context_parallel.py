"""Sequence/context-parallel attention over a device mesh.

SURVEY.md §5.7: the reference has no long-context machinery (dense
single-device attention, t ≤ 578 — layers/attention.py:113-125), but the
blockwise flash kernel was designed with its query axis left shardable so a
context-parallel extension stays possible. This module is that extension:
the token axis of ``q`` is sharded over a mesh axis, K/V shards are
all-gathered over ICI (one tiled collective per operand), and each device runs the
blockwise Pallas kernel (`chambers_tpu.ops.flash_attention`) on its local
query rows against the full K/V — attention memory per device is
O(t·h + t_local·t) blockwise, never the global [t, t].

This is the all-gather (DeepSpeed-Ulysses-adjacent) formulation, the right
one at flash-kernel lengths where K/V are small relative to the scores they
generate; ring attention (streaming K/V blocks around the ICI ring) only
pays off when even gathered K/V exceed HBM — far beyond this model family's
regime, and out of scope as SURVEY §2.8 documents.
"""

from functools import partial
from typing import Optional

import jax
from jax import shard_map  # stable API (jax.experimental.shard_map deprecated)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chambers_tpu.ops.flash_attention import flash_attention


def context_parallel_attention(
    query,
    value,
    key=None,
    *,
    mesh: Mesh,
    axis: str = "data",
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
):
    """Flash attention with the query token axis sharded over ``axis``.

    :param query: ``[b, n, t, h]`` with ``t`` divisible by the mesh axis
        size; sharded (or shardable) on its token axis.
    :param value: ``[b, n, t, h]``; same sharding.
    :param key: optional ``[b, n, t, h]``; defaults to ``value``.
    :param mesh: the device mesh; ``axis`` names the dimension to shard
        tokens over.
    :return: attention output ``[b, n, t, h]``, token axis sharded on
        ``axis``.

    Numerics: softmax statistics are float32 inside the kernel, but the MXU
    multiplies f32 operands via bf16 passes under JAX's default precision
    (as does XLA's dense attention) — expect bf16-class (~1e-3 relative)
    agreement with an exact f32 reference on real hardware; CPU interpret
    mode is exact.

    Causal masking is not supported here: the kernel derives its causal
    offset from (kv_len − q_len), which is only correct when the local
    query block is the *last* rows — true for exactly one shard. A causal
    context-parallel form needs per-shard row offsets (ring attention
    territory); raise rather than silently mis-mask.
    """
    if key is None:
        key = value

    # the mesh's devices decide the execution platform, not the process
    # default backend — a CPU debug mesh on a TPU host must still take the
    # interpreter (and the vma fallback below)
    on_cpu = mesh.devices.flat[0].platform == "cpu"

    def local(q_shard, k_shard, v_shard):
        # one tiled all-gather per operand rides ICI; each device then runs
        # the blockwise kernel on its local query rows vs the full K/V
        k_full = jax.lax.all_gather(k_shard, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_shard, axis, axis=2, tiled=True)
        return flash_attention(
            q_shard, v_full, k_full, scale=scale, causal=False,
            block_q=block_q, block_k=block_k, interpret=on_cpu,
        )

    spec = P(None, None, axis, None)
    # Strict varying-mesh-axes checking stays ON on the compiled (Mosaic)
    # path: flash_attention propagates the operands' vma into its pallas
    # out_shapes (ops/flash_attention.py:_operand_vma) so the out_spec
    # type-checks. The CPU interpreter alone cannot run strict — jax 0.9.0's
    # pallas HLO interpreter slices blocks with invariant while_loop indices
    # against varying data and its dynamic_slice vma rule rejects the mix
    # ("Primitive dynamic_slice requires varying manual axes to match");
    # tests/test_parallel.py::test_context_parallel_strict_vma_cpu_canary
    # pins that limitation so the fallback is removed when JAX fixes it.
    check_vma = not on_cpu
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec, check_vma=check_vma)
    sharding = NamedSharding(mesh, spec)
    query = jax.device_put(query, sharding)
    key = jax.device_put(key, sharding)
    value = jax.device_put(value, sharding)
    return fn(query, key, value)

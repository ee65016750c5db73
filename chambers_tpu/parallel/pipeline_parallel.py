"""Pipeline parallelism: GPipe-style microbatching over a ``pipe`` mesh axis.

SURVEY.md §2.8 records the reference has no pipeline parallelism (it is a
single-device Keras library) and that PP is "not needed for ViT-L scale on
one pod slice". This module supplies the capability anyway, in the
TPU-native formulation, so model stacks that outgrow a chip's HBM can still
train: the layer stack is split into S contiguous *stages*, one per device
along a ``pipe`` mesh axis, and the batch into M *microbatches* that stream
through the stages. Communication is a single ``lax.ppermute`` of one
microbatch's activations per tick — a neighbor-to-neighbor transfer that
rides the ICI ring, never a global collective.

Schedule: plain GPipe. The scan runs M + S - 1 ticks; at tick t stage s
processes microbatch (t - s) when 0 <= t - s < M and garbage otherwise
(garbage lanes cost FLOPs but keep the program SPMD — every device runs the
identical traced computation, which is what XLA requires). Bubble fraction
is (S-1)/(M+S-1): pick M >= 4*S to keep it under ~20%.

Backward is ordinary autodiff through the scan: ``ppermute`` transposes to
the inverse permutation, so gradient activations flow backward stage-to-
stage over the same ICI links, and parameter gradients accumulate across
each stage's microbatch ticks — 1F1B-style memory savings can be layered on
with ``remat=True`` (rematerialize each stage application in the backward
pass).
"""

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_pipeline_stages(stage_param_trees: Sequence[Any]):
    """Stack S per-stage parameter pytrees into one tree with a leading
    stage axis on every leaf — the layout ``pipeline_apply`` expects
    (leaf shape ``[S, ...]``, sharded over the ``pipe`` mesh axis).

    All stages must share a pytree structure and leaf shapes (homogeneous
    stages — e.g. equal groups of transformer encoder layers).
    """
    trees = list(stage_param_trees)
    if not trees:
        raise ValueError("need at least one stage")
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *trees)


def group_layers_into_stages(layer_param_trees: Sequence[Any], n_stages: int):
    """Group L per-layer parameter pytrees into ``n_stages`` stage trees.

    Each stage tree's leaves gain a leading ``L // n_stages`` axis; the
    result is then stage-stacked, giving leaves ``[S, L/S, ...]``. A stage
    function receives the ``[L/S, ...]`` slice and typically runs
    ``lax.scan`` (or an unrolled loop) over it.
    """
    layers = list(layer_param_trees)
    if len(layers) % n_stages:
        raise ValueError(
            f"{len(layers)} layers not divisible into {n_stages} stages"
        )
    per = len(layers) // n_stages
    stages = [
        jax.tree.map(lambda *ls: jnp.stack(ls), *layers[i * per:(i + 1) * per])
        for i in range(n_stages)
    ]
    return stack_pipeline_stages(stages)


def shard_pipeline_params(stage_params, mesh: Mesh, axis: str = "pipe"):
    """Place stage-stacked params with the leading (stage) axis sharded
    over the ``pipe`` mesh axis — each device holds only its own stage's
    weights, which is the entire point of PP (HBM per device scales 1/S)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stage_params)


def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    x,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    n_microbatches: int,
    batch_axis: Optional[str] = None,
    remat: bool = False,
):
    """Run ``x`` through S pipelined stages of ``stage_fn`` over the mesh.

    :param stage_fn: ``(params_for_one_stage, activations) -> activations``;
        must preserve the activation shape (true for transformer blocks).
        ``params_for_one_stage`` is ``stage_params`` with the leading stage
        axis removed.
    :param stage_params: pytree with a leading stage axis of size S =
        ``mesh.shape[axis]`` on every leaf (see
        :func:`stack_pipeline_stages` / :func:`group_layers_into_stages`),
        sharded or shardable over ``axis``.
    :param x: global batch ``[B, ...]``. B (per data shard, if
        ``batch_axis``) must divide evenly into ``n_microbatches``.
    :param batch_axis: optional mesh axis name carrying data parallelism;
        the batch's leading axis is sharded over it, composing DP x PP.
    :param remat: rematerialize each stage application in the backward pass.
    :return: ``stage_fn^S(x)`` — identical math to applying the S stages
        sequentially on one device; output replicated over ``axis`` (and
        sharded over ``batch_axis`` when given).
    """
    S = mesh.shape[axis]
    M = int(n_microbatches)
    if M < 1:
        raise ValueError("n_microbatches must be >= 1")
    # the leading (stage) axis must match the mesh axis exactly: a larger
    # stack would shard multiple stages per device and `l[0]` below would
    # silently DROP every stage but the block's first
    for leaf in jax.tree.leaves(stage_params):
        if leaf.shape[0] != S:
            raise ValueError(
                f"stage_params leading axis {leaf.shape[0]} != mesh "
                f"'{axis}' size {S}; stack exactly one stage per device "
                "(group_layers_into_stages folds layers within a stage)"
            )
        break
    fn = jax.checkpoint(stage_fn) if remat else stage_fn

    def local(params_local, x_local):
        # params_local leaves are [1, ...] (this device's stage); drop it
        params = jax.tree.map(lambda l: l[0], params_local)
        n_local = x_local.shape[0]
        if n_local % M:
            raise ValueError(
                f"per-shard batch {n_local} not divisible by "
                f"n_microbatches={M}"
            )
        mb = n_local // M
        x_batches = x_local.reshape((M, mb) + x_local.shape[1:])

        s = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            act, out_buf = carry
            # stage 0 injects microbatch t (clipped: late ticks re-feed the
            # last microbatch; its output never reaches out_buf)
            feed = jax.lax.dynamic_index_in_dim(
                x_batches, jnp.minimum(t, M - 1), 0, keepdims=False
            )
            act_in = jnp.where(s == 0, feed, act)
            y = fn(params, act_in)
            # last stage banks finished microbatch t-(S-1)
            idx = jnp.clip(t - (S - 1), 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(out_buf, idx, 0,
                                               keepdims=False)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf, jnp.where(t >= S - 1, y, cur), idx, 0
            )
            # neighbor transfer over the ICI ring; stage 0's incoming value
            # is garbage and gets overwritten by `feed` next tick
            act = jax.lax.ppermute(y, axis, perm)
            return (act, out_buf), None

        # the carry is device-varying (each stage holds different
        # activations; each data shard different microbatches) but
        # zeros-init is axis-invariant: cast explicitly or shard_map's vma
        # typing rejects the scan
        varying = (axis,) + ((batch_axis,) if batch_axis else ())
        act0 = jax.lax.pcast(
            jnp.zeros((mb,) + x_local.shape[1:], x_local.dtype),
            varying, to="varying",
        )
        out0 = jax.lax.pcast(
            jnp.zeros(x_batches.shape, x_batches.dtype), varying, to="varying"
        )
        (_, out_buf), _ = jax.lax.scan(
            tick, (act0, out0), jnp.arange(M + S - 1)
        )
        # only the last stage holds real outputs; psum broadcasts them so
        # the result is replicated over the pipe axis (every other stage
        # contributes zeros)
        out = jnp.where(s == S - 1, out_buf, jnp.zeros_like(out_buf))
        out = jax.lax.psum(out, axis)
        return out.reshape((n_local,) + x_local.shape[1:])

    param_spec = jax.tree.map(lambda _: P(axis), stage_params)
    x_spec = P(batch_axis) if batch_axis else P()
    fn_sharded = shard_map(
        local, mesh=mesh,
        in_specs=(param_spec, x_spec), out_specs=x_spec,
    )
    stage_params = shard_pipeline_params(stage_params, mesh, axis)
    x = jax.device_put(x, NamedSharding(mesh, x_spec))
    return fn_sharded(stage_params, x)

"""Pipeline-parallel equivalence tests on the CPU-simulated 8-device mesh.

The contract: ``pipeline_apply`` over S stages x M microbatches computes
exactly ``stage_fn^S(x)`` — same forward values and same parameter/input
gradients as the sequential single-device program (SURVEY.md §2.8 PP row).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chambers_tpu.parallel import create_mesh
from chambers_tpu.parallel.pipeline_parallel import (
    group_layers_into_stages,
    pipeline_apply,
    stack_pipeline_stages,
)


def _dense_stage(params, x):
    return jnp.tanh(x @ params["w"] + params["b"])


def _make_stage_params(rng, n_stages, d):
    stages = []
    for _ in range(n_stages):
        stages.append({
            "w": jnp.asarray(rng.standard_normal((d, d)) * 0.3, jnp.float32),
            "b": jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32),
        })
    return stages


def _sequential(stages, x):
    for p in stages:
        x = _dense_stage(p, x)
    return x


@pytest.mark.parametrize("n_stages,n_microbatches", [(4, 4), (4, 1), (2, 8)])
def test_forward_matches_sequential(n_stages, n_microbatches):
    rng = np.random.default_rng(0)
    d, batch = 16, 8
    stages = _make_stage_params(rng, n_stages, d)
    x = jnp.asarray(rng.standard_normal((batch, d)), jnp.float32)

    mesh = create_mesh({"pipe": n_stages}, jax.devices()[:n_stages])
    stacked = stack_pipeline_stages(stages)
    out = pipeline_apply(
        _dense_stage, stacked, x, mesh=mesh, n_microbatches=n_microbatches
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_sequential(stages, x)),
        rtol=1e-6, atol=1e-6,
    )


def test_dp_times_pp_mesh():
    rng = np.random.default_rng(1)
    d, batch = 8, 16
    stages = _make_stage_params(rng, 4, d)
    x = jnp.asarray(rng.standard_normal((batch, d)), jnp.float32)

    mesh = create_mesh({"data": 2, "pipe": 4})
    stacked = stack_pipeline_stages(stages)
    out = pipeline_apply(
        _dense_stage, stacked, x, mesh=mesh, n_microbatches=4,
        batch_axis="data",
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_sequential(stages, x)),
        rtol=1e-6, atol=1e-6,
    )


@pytest.mark.parametrize("remat", [False, True])
def test_gradients_match_sequential(remat):
    rng = np.random.default_rng(2)
    d, batch = 8, 8
    stages = _make_stage_params(rng, 4, d)
    x = jnp.asarray(rng.standard_normal((batch, d)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((batch, d)), jnp.float32)

    mesh = create_mesh({"pipe": 4}, jax.devices()[:4])
    stacked = stack_pipeline_stages(stages)

    def pp_loss(stacked_params, x):
        y = pipeline_apply(
            _dense_stage, stacked_params, x, mesh=mesh, n_microbatches=4,
            remat=remat,
        )
        return jnp.mean((y - target) ** 2)

    def seq_loss(stacked_params, x):
        def body(h, p):
            return _dense_stage(p, h), None
        y, _ = jax.lax.scan(lambda h, p: (_dense_stage(p, h), None),
                            x, stacked_params)
        return jnp.mean((y - target) ** 2)

    (pp_val, pp_grads), pp_gx = (
        jax.value_and_grad(pp_loss)(stacked, x),
        jax.grad(pp_loss, argnums=1)(stacked, x),
    )
    (seq_val, seq_grads), seq_gx = (
        jax.value_and_grad(seq_loss)(stacked, x),
        jax.grad(seq_loss, argnums=1)(stacked, x),
    )
    np.testing.assert_allclose(float(pp_val), float(seq_val), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        pp_grads, seq_grads,
    )
    np.testing.assert_allclose(
        np.asarray(pp_gx), np.asarray(seq_gx), rtol=1e-5, atol=1e-6
    )


def test_encoder_layers_pipelined():
    """4 real EncoderLayers grouped into 2 stages match the sequential
    Encoder stack (deterministic path, final norm off)."""
    from chambers_tpu.layers.transformer import Encoder, EncoderLayer

    d, heads, ff, L, S = 16, 2, 32, 4, 2
    encoder = Encoder(
        embed_dim=d, num_heads=heads, ff_dim=ff, num_layers=L,
        attention_dropout_rate=0.0, dense_dropout_rate=0.0,
        pre_norm=True, norm_output=False,
    )
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((4, 6, d)), jnp.float32
    )
    variables = encoder.init(jax.random.PRNGKey(0), x)
    expected = encoder.apply(variables, x, deterministic=True)

    layer = EncoderLayer(
        embed_dim=d, num_heads=heads, ff_dim=ff,
        attention_dropout_rate=0.0, dense_dropout_rate=0.0, pre_norm=True,
    )
    layer_params = [variables["params"][f"layers_{i}"] for i in range(L)]
    stacked = group_layers_into_stages(layer_params, S)

    def stage_fn(params, x):
        # params leaves are [L/S, ...]: scan this stage's layers in order
        def body(h, p):
            return layer.apply({"params": p}, h, deterministic=True), None
        y, _ = jax.lax.scan(body, x, params)
        return y

    mesh = create_mesh({"pipe": S}, jax.devices()[:S])
    out = pipeline_apply(stage_fn, stacked, x, mesh=mesh, n_microbatches=2)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-5
    )


def test_uneven_microbatches_raise():
    rng = np.random.default_rng(4)
    stages = _make_stage_params(rng, 2, 4)
    x = jnp.zeros((6, 4), jnp.float32)
    mesh = create_mesh({"pipe": 2}, jax.devices()[:2])
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(
            _dense_stage, stack_pipeline_stages(stages), x,
            mesh=mesh, n_microbatches=4,
        )

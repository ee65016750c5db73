"""Composing parallelism strategies (VERDICT r3 next #4/#5).

Three-axis composition — data x model(TP) x expert(EP) in ONE jitted step —
is where sharding-rule conflicts surface (docs/scaling.md recipes;
SURVEY.md §2.8). And generation (greedy/beam decode with a lax.scan KV
cache) is exactly the kind of program that breaks under a batch-sharded
scan, so it runs here DP-sharded and with TP-sharded weights, asserting
token equality with single-device decode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from chambers_tpu.parallel import (
    SEQ2SEQ_TENSOR_PARALLEL_RULES,
    create_mesh,
    make_param_shardings,
    shard_batch,
)

BOS = 1


@pytest.fixture(scope="module")
def seq2seq_and_vars():
    from chambers_tpu.models import Seq2SeqTransformer

    module = Seq2SeqTransformer(
        input_vocab_size=24, output_vocab_size=24, embed_dim=32,
        num_heads=4, dim_feedforward=64, num_encoder_layers=2,
        num_decoder_layers=2, dropout_rate=0.0,
    )
    dummy = (jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32))
    variables = module.init(jax.random.PRNGKey(0), dummy)
    return module, variables


def test_three_axis_dp_tp_ep_train_step_matches_single_device():
    """One gradient step on a {data:2, model:2, expert:2} mesh — attention
    heads TP-sharded, expert weights EP-sharded, batch DP-sharded — must
    equal the same step on one device."""
    import optax

    from chambers_tpu.layers.moe import MoEEncoderLayer, moe_aux_loss
    from chambers_tpu.parallel.expert_parallel import moe_expert_parallel_rules

    moe = MoEEncoderLayer(
        embed_dim=32, num_heads=4, ff_dim=64, n_experts=4, pre_norm=True,
        n_selected_experts=2, router_z_loss_weight=1e-3,
        attention_dropout_rate=0.0, dense_dropout_rate=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 6, 32)), jnp.float32)
    params = moe.init(jax.random.PRNGKey(0), x)["params"]
    optimizer = optax.adamw(1e-3, weight_decay=1e-4)

    def step(params, opt_state, x):
        def loss_of(p):
            y, state = moe.apply({"params": p}, x, mutable=["intermediates"])
            return jnp.mean(y**2) + moe_aux_loss(state["intermediates"])

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # single device reference
    ref_params, _, ref_loss = jax.jit(step)(params, optimizer.init(params), x)

    mesh = create_mesh({"data": 2, "model": 2, "expert": 2})
    rules = (list(SEQ2SEQ_TENSOR_PARALLEL_RULES)
             + moe_expert_parallel_rules("expert"))
    shardings = make_param_shardings(params, mesh, rules)
    # the composition must actually place both strategies, or this test
    # would pass with everything silently replicated
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): s.spec
        for path, s in jax.tree_util.tree_flatten_with_path(shardings)[0]
    }
    assert flat["multi_head_attention/w_query"] == P(None, "model", None)
    assert flat["moe/w1"] == P("expert", None, None)
    placed = jax.tree.map(jax.device_put, params, shardings)
    xs = shard_batch(x, mesh)

    got_params, _, got_loss = jax.jit(step)(
        placed, optimizer.init(placed), xs)
    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5),
        got_params, ref_params)


def test_greedy_decode_dp_sharded_matches_single_device(seq2seq_and_vars):
    from chambers_tpu.models import greedy_decode

    module, variables = seq2seq_and_vars
    src = jnp.asarray(
        np.random.default_rng(11).integers(1, 24, (8, 8)), jnp.int32)
    want = np.asarray(
        greedy_decode(module, variables, src, max_len=8, bos_id=BOS,
                      use_cache=True))

    mesh = create_mesh({"data": 8})
    src_s = shard_batch(src, mesh)
    vars_r = jax.device_put(variables, NamedSharding(mesh, P()))
    got = jax.jit(lambda v, s: greedy_decode(
        module, v, s, max_len=8, bos_id=BOS, use_cache=True))(vars_r, src_s)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_beam_decode_dp_sharded_matches_single_device(seq2seq_and_vars):
    from chambers_tpu.models import beam_search_decode

    module, variables = seq2seq_and_vars
    src = jnp.asarray(
        np.random.default_rng(12).integers(1, 24, (8, 8)), jnp.int32)
    want, want_scores = beam_search_decode(
        module, variables, src, max_len=8, bos_id=BOS, beam_size=3,
        eos_id=2, return_scores=True, use_cache=True)

    mesh = create_mesh({"data": 8})
    src_s = shard_batch(src, mesh)
    vars_r = jax.device_put(variables, NamedSharding(mesh, P()))
    got, got_scores = jax.jit(lambda v, s: beam_search_decode(
        module, v, s, max_len=8, bos_id=BOS, beam_size=3, eos_id=2,
        return_scores=True, use_cache=True))(vars_r, src_s)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_allclose(np.asarray(got_scores),
                               np.asarray(want_scores), atol=1e-5)


@pytest.mark.parametrize("use_cache", [True, False])
def test_greedy_decode_tp_sharded_matches_single_device(
        seq2seq_and_vars, use_cache):
    """Decode with megatron-sharded weights: the per-step [b,1,d] matmuls
    and the KV cache updates partition over the model axis."""
    from chambers_tpu.models import greedy_decode

    module, variables = seq2seq_and_vars
    src = jnp.asarray(
        np.random.default_rng(13).integers(1, 24, (4, 8)), jnp.int32)
    want = np.asarray(
        greedy_decode(module, variables, src, max_len=8, bos_id=BOS,
                      use_cache=use_cache))

    mesh = create_mesh({"data": 2, "model": 4})
    shardings = make_param_shardings(
        variables["params"], mesh, SEQ2SEQ_TENSOR_PARALLEL_RULES)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): s.spec
        for path, s in jax.tree_util.tree_flatten_with_path(shardings)[0]
    }
    # the decoder's numbered attention blocks must be sharded too — the rule
    # set exists precisely because VIT_TENSOR_PARALLEL_RULES missed them
    assert flat["decoder/layers_0/multi_head_attention1/w_query"] == \
        P(None, "model", None)
    assert flat["decoder/layers_0/multi_head_attention2/w_projection"] == \
        P("model", None, None)
    placed = {"params": jax.tree.map(
        jax.device_put, variables["params"], shardings)}
    src_s = shard_batch(src, mesh)

    got = jax.jit(lambda v, s: greedy_decode(
        module, v, s, max_len=8, bos_id=BOS, use_cache=use_cache))(
        placed, src_s)
    np.testing.assert_array_equal(np.asarray(got), want)

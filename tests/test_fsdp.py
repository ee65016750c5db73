"""FSDP (ZeRO-3) sharding rules: layout, numerics, and the memory win."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from chambers_tpu.layers import Encoder
from chambers_tpu.models import Model
from chambers_tpu.parallel import (
    VIT_TENSOR_PARALLEL_RULES,
    create_mesh,
    fsdp_rules,
    make_param_shardings,
    shard_batch,
    shard_params,
)
from chambers_tpu.training import Trainer


def _leaf_sharding(tree, *path):
    node = tree
    for p in path:
        node = node[p]
    return node


class TestRuleGeneration:
    def test_largest_divisible_axis_wins(self):
        mesh = create_mesh({"data": 8})
        params = {"w": jnp.zeros((16, 64)), "tall": jnp.zeros((128, 24))}
        rules = fsdp_rules(params, mesh, min_weight_size=1)
        shardings = make_param_shardings(params, mesh, rules)
        assert shardings["w"].spec == P(None, "data")       # 64 > 16
        assert shardings["tall"].spec == P("data", None)    # 128 > 24

    def test_small_leaves_and_indivisible_axes_stay_replicated(self):
        mesh = create_mesh({"data": 8})
        params = {
            "bias": jnp.zeros(64),                 # below threshold
            "odd": jnp.zeros((7, 9)),              # nothing divides by 8
        }
        rules = fsdp_rules(params, mesh, min_weight_size=128)
        shardings = make_param_shardings(params, mesh, rules)
        assert shardings["bias"].spec == P()
        assert shardings["odd"].spec == P()

    def test_composes_with_tp_base_rules(self):
        mesh = create_mesh({"data": 4, "model": 2})
        params = {
            "block": {
                "dense1": {"kernel": jnp.zeros((32, 64)),
                           "bias": jnp.zeros(64)},
                "dense2": {"kernel": jnp.zeros((64, 32))},
                "multi_head_attention": {
                    "w_query": jnp.zeros((32, 4, 8)),
                },
            }
        }
        rules = fsdp_rules(params, mesh, axis="data",
                           base_rules=VIT_TENSOR_PARALLEL_RULES,
                           min_weight_size=1)
        s = make_param_shardings(params, mesh, rules)["block"]
        # TP keeps its axis; FSDP claims the largest remaining one
        assert s["dense1"]["kernel"].spec == P("data", "model")
        assert s["dense2"]["kernel"].spec == P("model", "data")
        # w_query (32, 4, 8): heads are TP's; FSDP takes d=32
        assert s["multi_head_attention"]["w_query"].spec == P(
            "data", "model", None)
        # TP'd bias (64,) has no free axis left for FSDP
        assert s["dense1"]["bias"].spec == P("model")

    def test_multi_axis_joint_sharding(self):
        mesh = create_mesh({"replica": 2, "fsdp": 4})
        params = {"w": jnp.zeros((64, 16))}
        rules = fsdp_rules(params, mesh, axis=("replica", "fsdp"),
                           min_weight_size=1)
        shardings = make_param_shardings(params, mesh, rules)
        assert shardings["w"].spec == P(("replica", "fsdp"), None)
        placed = shard_params(params, mesh, rules)
        assert {s.data.shape for s in placed["w"].addressable_shards} == {
            (8, 16)}

    def test_unknown_axis_raises(self):
        mesh = create_mesh({"data": 8})
        with pytest.raises(ValueError, match="no axis"):
            fsdp_rules({"w": jnp.zeros((8, 8))}, mesh, axis="fsdp")

    def test_axis_already_claimed_by_base_rules_is_not_duplicated(self):
        mesh = create_mesh({"data": 8})
        base = [(r"w$", P("data", None))]
        params = {"w": jnp.zeros((8, 64))}
        rules = fsdp_rules(params, mesh, base_rules=base, min_weight_size=1)
        shardings = make_param_shardings(params, mesh, rules)
        assert shardings["w"].spec == P("data", None)  # unchanged, no dup


class _Wide(nn.Module):
    """Enough params per layer that FSDP actually shards every kernel."""

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(64)(x)
        x = nn.relu(x)
        x = nn.Dense(64)(x)
        x = nn.relu(x)
        return nn.Dense(1)(x)


def _mse(y_true, y_pred):
    return jnp.mean((y_true - y_pred) ** 2)


def _batches(n_batches=4, batch=16, dim=8, seed=0):
    rng = np.random.RandomState(seed)
    return [(rng.randn(batch, dim).astype(np.float32),
             rng.randn(batch, 1).astype(np.float32))
            for _ in range(n_batches)]


class TestTrainerFSDP:
    def test_fsdp_training_matches_single_device(self):
        """The FSDP-sharded Trainer walks the same loss curve as the
        unsharded one — the layout is invisible to the math."""
        module = _Wide()
        variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))
        data = _batches()

        ref = Trainer(Model(module, variables), loss=_mse,
                      optimizer=optax.adam(1e-2), seed=3)
        hist_ref = ref.fit(data, epochs=3, verbose=False)

        mesh = create_mesh({"data": 8})
        rules = fsdp_rules(variables["params"], mesh, min_weight_size=64)
        fsdp = Trainer(Model(module, variables), loss=_mse,
                       optimizer=optax.adam(1e-2), seed=3, mesh=mesh,
                       param_sharding_rules=rules)
        hist_fsdp = fsdp.fit(data, epochs=3, verbose=False)

        for a, b in zip(hist_ref, hist_fsdp):
            np.testing.assert_allclose(a["loss"], b["loss"],
                                       rtol=1e-5, atol=1e-6)
        for pa, pb in zip(jax.tree.leaves(ref.variables["params"]),
                          jax.tree.leaves(fsdp.variables["params"])):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       rtol=1e-4, atol=1e-5)

    def test_optimizer_state_is_sharded(self):
        """The ZeRO point: Adam moments live 1/N per device, not replicated."""
        module = _Wide()
        variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))
        mesh = create_mesh({"data": 8})
        rules = fsdp_rules(variables["params"], mesh, min_weight_size=64)
        trainer = Trainer(Model(module, variables), loss=_mse,
                          optimizer=optax.adam(1e-2), mesh=mesh,
                          param_sharding_rules=rules)
        # Dense_0 kernel (8, 64): sharded over the 64 axis
        mu = trainer.state.opt_state[0].mu["Dense_0"]["kernel"]
        assert mu.sharding.spec == P(None, "data")
        assert {s.data.shape for s in mu.addressable_shards} == {(8, 8)}
        # params stay sharded after the step (no silent gather-and-keep)
        trainer.fit(_batches(n_batches=1), epochs=1, verbose=False)
        w = trainer.state.params["Dense_0"]["kernel"]
        assert {s.data.shape for s in w.addressable_shards} == {(8, 8)}

    def test_fsdp_composes_with_tp_on_encoder(self):
        """FSDP×TP on a real EncoderLayer stack: 2D mesh {data:4, model:2},
        forward matches the single-device forward."""
        mesh = create_mesh({"data": 4, "model": 2})
        enc = Encoder(embed_dim=32, num_heads=4, ff_dim=64, num_layers=2,
                      attention_dropout_rate=0.0, dense_dropout_rate=0.0,
                      pre_norm=True)
        x = np.random.RandomState(0).randn(8, 6, 32).astype(np.float32)
        variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 32)))
        want = np.asarray(enc.apply(variables, x, deterministic=True))

        rules = fsdp_rules(variables["params"], mesh,
                           base_rules=VIT_TENSOR_PARALLEL_RULES,
                           min_weight_size=64)
        placed = {"params": shard_params(variables["params"], mesh, rules)}
        # spot-check the 2D layout landed
        wq = placed["params"]["layers_0"]["multi_head_attention"]["w_query"]
        assert wq.sharding.spec == P("data", "model", None)

        x_s = shard_batch(jnp.asarray(x), mesh)
        out = jax.jit(
            lambda v, a: enc.apply(v, a, deterministic=True))(placed, x_s)
        np.testing.assert_allclose(np.asarray(out), want,
                                   rtol=1e-5, atol=1e-5)

"""Mixture-of-Experts layer + expert-parallel sharding tests.

Pins the Switch-style dense-dispatch semantics of
``chambers_tpu.layers.moe`` (SURVEY.md §2.8 EP row): single-expert
equivalence to a plain MLP, capacity dropping, the load-balancing aux
loss, and exact equality of the expert-parallel sharded run vs the
replicated single-device math on the 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chambers_tpu.activations import gelu
from chambers_tpu.layers.moe import MoEEncoderLayer, MoEMLP, moe_aux_loss
from chambers_tpu.parallel import create_mesh, make_param_shardings
from chambers_tpu.parallel.expert_parallel import moe_expert_parallel_rules


def _init(module, x, seed=0):
    return module.init(jax.random.PRNGKey(seed), x)


def test_single_expert_equals_dense_mlp():
    """E=1: the router gate is softmax over one logit == 1.0, capacity
    covers every token -> MoEMLP must equal w2(gelu(w1 x)) exactly."""
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 5, 8)), jnp.float32
    )
    moe = MoEMLP(ff_dim=16, n_experts=1, capacity_factor=1.0)
    variables = _init(moe, x)
    y = moe.apply(variables, x)

    p = variables["params"]
    h = gelu(x @ p["w1"][0] + p["b1"][0])
    expected = h @ p["w2"][0] + p["b2"][0]
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(expected), rtol=1e-6, atol=1e-6
    )


def test_output_shape_and_dtype():
    x = jnp.zeros((3, 7, 12), jnp.bfloat16)
    moe = MoEMLP(ff_dim=24, n_experts=4, dtype=jnp.bfloat16)
    variables = _init(moe, x)
    y = moe.apply(variables, x)
    assert y.shape == x.shape
    assert y.dtype == jnp.bfloat16


def test_each_token_visits_exactly_one_expert():
    """With ample capacity, every token's output equals its argmax expert's
    MLP output scaled by the gate probability."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 8)), jnp.float32)
    moe = MoEMLP(ff_dim=16, n_experts=4, capacity_factor=4.0)
    variables = _init(moe, x)
    y = np.asarray(moe.apply(variables, x))[0]

    p = variables["params"]
    tokens = np.asarray(x)[0]
    logits = tokens @ np.asarray(p["w_router"])
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    for i, t in enumerate(tokens):
        e = int(np.argmax(probs[i]))
        h = np.asarray(gelu(jnp.asarray(t @ np.asarray(p["w1"][e])
                                        + np.asarray(p["b1"][e]))))
        expected = (h @ np.asarray(p["w2"][e]) + np.asarray(p["b2"][e])) \
            * probs[i, e]
        np.testing.assert_allclose(y[i], expected, rtol=1e-4, atol=1e-5)


def test_capacity_drops_to_zero():
    """capacity_factor small enough that an oversubscribed expert drops its
    overflow tokens: dropped tokens produce exactly zero output."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 32, 8)), jnp.float32)
    # capacity = ceil(32/2 * 0.25) = 4 per expert -> at most 8 of 32 kept
    moe = MoEMLP(ff_dim=8, n_experts=2, capacity_factor=0.25)
    variables = _init(moe, x)
    y = np.asarray(moe.apply(variables, x))[0]
    n_zero = int((np.abs(y).max(axis=-1) == 0.0).sum())
    assert n_zero >= 32 - 8


def test_aux_loss_sown_and_near_uniform_at_init():
    """At a fresh random router the Switch balance loss ~= weight * 1.0
    (exactly 1.0 for perfectly uniform routing)."""
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((4, 64, 16)), jnp.float32
    )
    moe = MoEMLP(ff_dim=8, n_experts=4, aux_loss_weight=1.0)
    variables = _init(moe, x)
    _, state = moe.apply(variables, x, mutable=["intermediates"])
    aux = float(moe_aux_loss(state["intermediates"]))
    assert 0.5 < aux < 3.0

    assert float(moe_aux_loss({})) == 0.0


def test_moe_encoder_layer_runs_and_routes():
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, 10, 16)), jnp.float32
    )
    layer = MoEEncoderLayer(
        embed_dim=16, num_heads=2, ff_dim=32, n_experts=4, pre_norm=True,
        attention_dropout_rate=0.0, dense_dropout_rate=0.0,
    )
    variables = _init(layer, x)
    y, state = layer.apply(variables, x, mutable=["intermediates"])
    assert y.shape == x.shape
    assert float(moe_aux_loss(state["intermediates"])) > 0.0
    # gradient flows to every expert-stacked weight that received tokens
    def loss(p):
        return jnp.sum(layer.apply({"params": p}, x) ** 2)
    grads = jax.grad(loss)(variables["params"])
    assert float(jnp.abs(grads["moe"]["w_router"]).sum()) > 0.0


def test_expert_parallel_sharding_matches_replicated():
    """EP is pure sharding: the jitted layer with expert weights sharded
    over an 8-way mesh axis must equal the unsharded single-device run."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 16, 8)), jnp.float32)
    moe = MoEMLP(ff_dim=16, n_experts=8, capacity_factor=2.0)
    variables = _init(moe, x)
    expected = moe.apply(variables, x)

    mesh = create_mesh({"expert": 8})
    rules = moe_expert_parallel_rules("expert")
    shardings = make_param_shardings(variables["params"], mesh, rules)
    # the rules shard every expert-stacked leaf and replicate the router
    assert shardings["w1"].spec[0] == "expert"
    assert shardings["w_router"].spec == ()
    params = jax.tree.map(jax.device_put, variables["params"], shardings)

    y = jax.jit(lambda p, x: moe.apply({"params": p}, x))(params, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(expected), rtol=1e-5, atol=1e-6
    )


def test_expert_parallel_composes_with_dp():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((8, 8, 8)), jnp.float32)
    moe = MoEMLP(ff_dim=8, n_experts=4, capacity_factor=2.0)
    variables = _init(moe, x)
    expected = moe.apply(variables, x)

    mesh = create_mesh({"data": 2, "expert": 4})
    params = jax.tree.map(
        jax.device_put, variables["params"],
        make_param_shardings(
            variables["params"], mesh, moe_expert_parallel_rules("expert")
        ),
    )
    from chambers_tpu.parallel import shard_batch

    xs = shard_batch(x, mesh)
    y = jax.jit(lambda p, x: moe.apply({"params": p}, x))(params, xs)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(expected), rtol=1e-5, atol=1e-6
    )


def test_vit_moe_every_n():
    """moe_every_n swaps every n-th encoder MLP for a Switch MoE (V-MoE
    placement); default 0 leaves the reference param tree untouched."""
    from chambers_tpu.models.backbones.vision_transformer import (
        VisionTransformer,
    )

    kwargs = dict(
        patch_size=8, patch_dim=16, n_encoder_layers=4, n_heads=2, ff_dim=32,
        dropout_rate=0.0, include_top=False, pooling="cls",
    )
    x = jnp.zeros((2, 16, 16, 3))

    dense = VisionTransformer(**kwargs)
    dense_params = dense.init(jax.random.PRNGKey(0), x)["params"]
    enc = dense_params["encoder"]
    assert all("moe" not in enc[f"layers_{i}"] for i in range(4))

    moe_vit = VisionTransformer(moe_every_n=2, moe_n_experts=4, **kwargs)
    variables = moe_vit.init(jax.random.PRNGKey(0), x)
    enc = variables["params"]["encoder"]
    # layers 1 and 3 (1-indexed 2nd/4th) are MoE, 0 and 2 stay dense
    assert "moe" in enc["layers_1"] and "moe" in enc["layers_3"]
    assert "dense1" in enc["layers_0"] and "dense1" in enc["layers_2"]
    assert enc["layers_1"]["moe"]["w1"].shape == (4, 16, 32)

    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    y, state = moe_vit.apply(variables, imgs, mutable=["intermediates"])
    assert y.shape == (2, 16)
    # one aux loss sown per MoE layer, summable for the training objective
    aux = moe_aux_loss(state["intermediates"])
    assert np.isfinite(float(aux)) and float(aux) > 0.0


def test_vit_moe_expert_parallel_matches_replicated():
    from chambers_tpu.models.backbones.vision_transformer import (
        VisionTransformer,
    )

    vit = VisionTransformer(
        patch_size=8, patch_dim=16, n_encoder_layers=2, n_heads=2, ff_dim=32,
        dropout_rate=0.0, include_top=False, pooling="cls",
        moe_every_n=2, moe_n_experts=8,
    )
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 3)), jnp.float32)
    variables = vit.init(jax.random.PRNGKey(1), x)
    expected = vit.apply(variables, x)

    mesh = create_mesh({"expert": 8})
    params = jax.tree.map(
        jax.device_put, variables["params"],
        make_param_shardings(
            variables["params"], mesh, moe_expert_parallel_rules("expert")
        ),
    )
    y = jax.jit(lambda p, x: vit.apply({"params": p}, x))(params, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(expected), rtol=1e-5, atol=1e-5
    )


def test_group_size_matches_ungrouped_when_capacity_ample():
    """With capacity_factor high enough that no token drops, routing is
    per-token and grouping must not change the output at all."""
    d, n_tok = 16, 64
    x = jnp.asarray(np.random.RandomState(0).randn(2, n_tok // 2, d),
                    jnp.float32)
    m1 = MoEMLP(ff_dim=32, n_experts=4, capacity_factor=8.0)
    v = m1.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, d)))
    want = m1.apply(v, x)
    m2 = MoEMLP(ff_dim=32, n_experts=4, capacity_factor=8.0, group_size=16)
    got = m2.apply(v, x)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_group_size_bounds_dispatch_memory_and_enforces_per_group_capacity():
    """Grouped dispatch enforces capacity per group: tokens beyond
    ceil(group/E*cf) within their group drop (zero from the layer), even if
    a global queue would have kept them."""
    d = 8
    m = MoEMLP(ff_dim=16, n_experts=2, capacity_factor=0.5, group_size=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, d)))
    x = jnp.asarray(np.random.RandomState(1).randn(1, 32, d), jnp.float32)
    y, inter = m.apply(v, x, mutable=["intermediates"])
    # capacity per 8-token group = ceil(8/2*0.5) = 2 per expert -> at most
    # 4 routed tokens per group; the rest must be exactly zero rows
    zero_rows = np.asarray((jnp.abs(y[0]).max(axis=-1) == 0))
    assert zero_rows.sum() >= 32 - 4 * 4 - 1  # allow boundary slack
    assert float(moe_aux_loss(inter["intermediates"])) > 0


def test_group_size_indivisible_raises():
    d = 8
    m = MoEMLP(ff_dim=16, n_experts=2, group_size=7)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, d)))
    x = jnp.zeros((1, 32, d), jnp.float32)
    with pytest.raises(ValueError, match="group_size"):
        m.apply(v, x)


def test_moe_encoder_layer_dropout_rates_match_encoder_layer():
    """VERDICT-preempt: MoEEncoderLayer must use dense_dropout_rate for the
    attention-output dropout, exactly like EncoderLayer."""
    from chambers_tpu.layers.transformer import EncoderLayer

    kwargs = dict(embed_dim=16, num_heads=2, ff_dim=32,
                  attention_dropout_rate=0.9, dense_dropout_rate=0.1)
    moe = MoEEncoderLayer(n_experts=2, **kwargs)
    ref = EncoderLayer(**kwargs)
    vm = moe.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16)))
    vr = ref.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16)))
    moe_b, ref_b = moe.bind(vm), ref.bind(vr)
    assert moe_b.dropout1.rate == ref_b.dropout1.rate == 0.1
    assert moe_b.dropout2.rate == ref_b.dropout2.rate == 0.1
    # the in-attention dropout keeps the attention rate in both
    assert (moe_b.multi_head_attention.dropout_rate
            == ref_b.multi_head_attention.dropout_rate == 0.9)


def test_moe_encoder_layer_accepts_norm_stats_dtype():
    from chambers_tpu.layers.normalization import FastLayerNorm  # noqa: F401

    layer = MoEEncoderLayer(embed_dim=16, num_heads=2, ff_dim=32,
                            n_experts=2, norm_stats_dtype=jnp.bfloat16)
    v = layer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16)))
    y = layer.apply(v, jnp.ones((2, 4, 16), jnp.float32))
    assert y.shape == (2, 4, 16) and bool(jnp.isfinite(y).all())


def _naive_topk(x, params, k, capacity_factor=None, gelu_fn=None):
    """Per-token numpy reference: top-k routing with renormalized gates,
    ample capacity (no drops)."""
    from chambers_tpu.activations import gelu as _gelu

    gelu_fn = gelu_fn or (lambda v: np.asarray(_gelu(jnp.asarray(v))))
    p = {name: np.asarray(v) for name, v in params.items()}
    tokens = x.reshape(-1, x.shape[-1])
    logits = tokens @ p["w_router"]
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    out = np.zeros_like(tokens)
    for i, t in enumerate(tokens):
        top = np.argsort(-probs[i], kind="stable")[:k]
        gates = probs[i, top]
        if k > 1:
            gates = gates / gates.sum()
        for e, gate in zip(top, gates):
            h = gelu_fn(t @ p["w1"][e] + p["b1"][e])
            out[i] += gate * (h @ p["w2"][e] + p["b2"][e])
    return out.reshape(x.shape)


def test_top2_matches_naive_per_token_computation():
    """k=2 with ample capacity: every token's output is the gate-weighted
    (renormalized) sum of its two highest-probability experts' MLPs."""
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((2, 12, 8)), jnp.float32)
    moe = MoEMLP(ff_dim=16, n_experts=4, n_selected_experts=2,
                 capacity_factor=4.0)
    variables = _init(moe, x)
    y = np.asarray(moe.apply(variables, x))
    expected = _naive_topk(np.asarray(x), variables["params"], k=2)
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_topk_first_choices_outrank_second_choices_for_capacity():
    """Rank-major queueing: a later token's FIRST choice wins the last slot
    over an earlier token's SECOND choice."""
    d = 2
    # router = identity: logits are the token coordinates themselves
    # token0 prefers E1 then E0; token1 prefers E0 (strongly)
    x = jnp.asarray([[[1.0, 2.0], [3.0, 0.0]]], jnp.float32)  # [1, 2, 2]
    # capacity = max(1, ceil(2*2/2 * 0.2)) = 1 slot per expert
    moe = MoEMLP(ff_dim=4, n_experts=2, n_selected_experts=2,
                 capacity_factor=0.2)
    variables = _init(moe, x)
    p = dict(variables["params"])
    p["w_router"] = jnp.eye(2, dtype=jnp.float32)
    y = np.asarray(moe.apply({"params": p}, x))[0]

    # E0's one slot: token1 rank-0 beats token0 rank-1 (despite batch order)
    # E1's one slot: token0 rank-0 beats token1 rank-1
    # -> each token keeps exactly its first choice, second choice dropped
    probs = np.asarray(jax.nn.softmax(np.asarray(x[0]), axis=-1))
    pn = {k_: np.asarray(v) for k_, v in p.items()}
    from chambers_tpu.activations import gelu as _gelu

    def expert(t, e):
        h = np.asarray(_gelu(jnp.asarray(t @ pn["w1"][e] + pn["b1"][e])))
        return h @ pn["w2"][e] + pn["b2"][e]

    t0, t1 = np.asarray(x[0])
    # renormalized rank-0 gates (the rank-1 term drops, its gate does not
    # redistribute — the dropped share simply vanishes, GShard semantics)
    g0 = probs[0, 1] / (probs[0, 1] + probs[0, 0])
    g1 = probs[1, 0] / (probs[1, 0] + probs[1, 1])
    np.testing.assert_allclose(y[0], g0 * expert(t0, 1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(y[1], g1 * expert(t1, 0), rtol=1e-5, atol=1e-6)


def test_topk_validates_k():
    x = jnp.zeros((1, 4, 8), jnp.float32)
    for bad in (0, 5):
        moe = MoEMLP(ff_dim=8, n_experts=4, n_selected_experts=bad)
        with pytest.raises(ValueError, match="n_selected_experts"):
            moe.init(jax.random.PRNGKey(0), x)


def test_top2_grouped_matches_global_when_capacity_ample():
    d = 16
    x = jnp.asarray(np.random.RandomState(11).randn(2, 32, d), jnp.float32)
    m1 = MoEMLP(ff_dim=32, n_experts=4, n_selected_experts=2,
                capacity_factor=8.0)
    v = m1.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, d)))
    want = m1.apply(v, x)
    m2 = MoEMLP(ff_dim=32, n_experts=4, n_selected_experts=2,
                capacity_factor=8.0, group_size=16)
    got = m2.apply(v, x)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_top2_expert_parallel_matches_replicated():
    """k=2 is still pure einsums: EP sharding must not change the math."""
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((4, 16, 8)), jnp.float32)
    moe = MoEMLP(ff_dim=16, n_experts=8, n_selected_experts=2,
                 capacity_factor=2.0)
    variables = _init(moe, x)
    expected = moe.apply(variables, x)

    mesh = create_mesh({"expert": 8})
    params = jax.tree.map(
        jax.device_put, variables["params"],
        make_param_shardings(
            variables["params"], mesh, moe_expert_parallel_rules("expert")
        ),
    )
    y = jax.jit(lambda p, x: moe.apply({"params": p}, x))(params, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(expected), rtol=1e-5, atol=1e-6
    )


def test_vit_accepts_moe_n_selected_experts():
    from chambers_tpu.models.backbones.vision_transformer import (
        VisionTransformer,
    )

    vit = VisionTransformer(
        patch_size=8, patch_dim=16, n_encoder_layers=2, n_heads=2, ff_dim=32,
        dropout_rate=0.0, include_top=False, pooling="cls",
        moe_every_n=2, moe_n_experts=4, moe_n_selected_experts=2,
    )
    x = jnp.asarray(
        np.random.default_rng(13).standard_normal((2, 16, 16, 3)), jnp.float32
    )
    variables = vit.init(jax.random.PRNGKey(0), x)
    y = vit.apply(variables, x)
    assert y.shape == (2, 16) and bool(jnp.isfinite(y).all())


def test_router_z_loss_default_off_is_identical():
    """weight=0.0 (default) must not change output or the sown aux."""
    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.standard_normal((2, 8, 8)), jnp.float32)
    m0 = MoEMLP(ff_dim=16, n_experts=4)
    v = _init(m0, x)
    y0, s0 = m0.apply(v, x, mutable=["intermediates"])
    m1 = MoEMLP(ff_dim=16, n_experts=4, router_z_loss_weight=0.0)
    y1, s1 = m1.apply(v, x, mutable=["intermediates"])
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    np.testing.assert_array_equal(
        np.asarray(moe_aux_loss(s0["intermediates"])),
        np.asarray(moe_aux_loss(s1["intermediates"])),
    )


def test_router_z_loss_value_matches_numpy():
    """aux(zw>0) - aux(zw=0) == zw * mean(logsumexp(router logits)^2)."""
    rng = np.random.default_rng(15)
    x = jnp.asarray(rng.standard_normal((2, 8, 8)), jnp.float32)
    base = MoEMLP(ff_dim=16, n_experts=4)
    v = _init(base, x)
    _, s0 = base.apply(v, x, mutable=["intermediates"])
    zw = 1e-3
    m = MoEMLP(ff_dim=16, n_experts=4, router_z_loss_weight=zw)
    y, s1 = m.apply(v, x, mutable=["intermediates"])
    got = float(moe_aux_loss(s1["intermediates"])
                - moe_aux_loss(s0["intermediates"]))

    logits = np.asarray(x).reshape(-1, 8) @ np.asarray(
        v["params"]["w_router"]
    )
    lse = np.log(np.exp(logits - logits.max(-1, keepdims=True))
                 .sum(-1)) + logits.max(-1)
    want = zw * float(np.mean(lse ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # the routed output itself is untouched by the z-loss term
    y_base = base.apply(v, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_base))


def test_encoder_plumbs_router_z_loss():
    from chambers_tpu.layers.transformer import Encoder

    enc = Encoder(
        embed_dim=16, num_heads=2, ff_dim=32, num_layers=2,
        dense_dropout_rate=0.0, attention_dropout_rate=0.0,
        moe_every_n=2, moe_n_experts=4, moe_router_z_loss_weight=1e-3,
    )
    x = jnp.asarray(
        np.random.default_rng(16).standard_normal((2, 8, 16)), jnp.float32
    )
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)))
    _, s1 = enc.apply(v, x, mutable=["intermediates"])
    enc0 = Encoder(
        embed_dim=16, num_heads=2, ff_dim=32, num_layers=2,
        dense_dropout_rate=0.0, attention_dropout_rate=0.0,
        moe_every_n=2, moe_n_experts=4,
    )
    _, s0 = enc0.apply(v, x, mutable=["intermediates"])
    assert float(moe_aux_loss(s1["intermediates"])) > float(
        moe_aux_loss(s0["intermediates"])
    )


def test_moe_decoder_layer_shapes_and_aux():
    from chambers_tpu.layers.moe import MoEDecoderLayer

    layer = MoEDecoderLayer(
        embed_dim=16, num_heads=2, ff_dim=32, n_experts=4,
        n_selected_experts=2, pre_norm=True,
        attention_dropout_rate=0.0, dense_dropout_rate=0.0,
    )
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((2, 6, 16)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((2, 9, 16)), jnp.float32)
    v = layer.init(jax.random.PRNGKey(0), [x, mem])
    y, state = layer.apply(v, [x, mem], mutable=["intermediates"])
    assert y.shape == (2, 6, 16) and bool(jnp.isfinite(y).all())
    assert float(moe_aux_loss(state["intermediates"])) > 0.0


def test_moe_decoder_layer_matches_dense_decoder_outside_mlp():
    """k=2 of E=2 experts that BOTH carry the dense MLP's weights, ample
    capacity: the renormalized gates sum to exactly 1, so MoEDecoderLayer
    must equal DecoderLayer — proves the attention/norm/residual wiring is
    identical regardless of what the router does."""
    from chambers_tpu.layers.moe import MoEDecoderLayer
    from chambers_tpu.layers.transformer import DecoderLayer

    common = dict(embed_dim=16, num_heads=2, ff_dim=32, pre_norm=False,
                  attention_dropout_rate=0.0, dense_dropout_rate=0.0)
    dense = DecoderLayer(**common)
    moe = MoEDecoderLayer(n_experts=2, n_selected_experts=2,
                          capacity_factor=4.0, **common)

    rng = np.random.default_rng(18)
    x = jnp.asarray(rng.standard_normal((1, 6, 16)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((1, 9, 16)), jnp.float32)
    vd = dense.init(jax.random.PRNGKey(3), [x, mem])
    vm = moe.init(jax.random.PRNGKey(3), [x, mem])

    pd = dict(vd["params"])
    pm = dict(vm["params"])
    # share every non-MLP submodule's weights
    for name in ("multi_head_attention1", "multi_head_attention2",
                 "norm1", "norm2", "norm3"):
        pm[name] = pd[name]
    moe_p = dict(pm["moe"])
    moe_p["w1"] = jnp.stack([pd["dense1"]["kernel"]] * 2)
    moe_p["b1"] = jnp.stack([pd["dense1"]["bias"]] * 2)
    moe_p["w2"] = jnp.stack([pd["dense2"]["kernel"]] * 2)
    moe_p["b2"] = jnp.stack([pd["dense2"]["bias"]] * 2)
    pm["moe"] = moe_p

    want = dense.apply({"params": pd}, [x, mem])
    got = moe.apply({"params": pm}, [x, mem])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_decoder_stack_moe_every_n():
    from chambers_tpu.layers.transformer import Decoder

    dec = Decoder(
        embed_dim=16, num_heads=2, ff_dim=32, num_layers=4,
        attention_dropout_rate=0.0, dense_dropout_rate=0.0,
        moe_every_n=2, moe_n_experts=4, moe_n_selected_experts=2,
    )
    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((2, 7, 16)), jnp.float32)
    v = dec.init(jax.random.PRNGKey(0), [x, mem])
    # layers 1 and 3 (0-indexed) are MoE: expert-stacked w1 present
    p = v["params"]
    assert "moe" in p["layers_1"] and "moe" in p["layers_3"]
    assert "dense1" in p["layers_0"] and "dense1" in p["layers_2"]
    y, state = dec.apply(v, [x, mem], mutable=["intermediates"])
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())
    # one sown aux per MoE layer
    aux_leaves = [l for path, l in
                  jax.tree_util.tree_leaves_with_path(state["intermediates"])]
    assert len(aux_leaves) == 2


def test_seq2seq_moe_trains_and_sows_aux():
    from chambers_tpu.models import Seq2SeqTransformer

    model = Seq2SeqTransformer(
        input_vocab_size=12, output_vocab_size=12, embed_dim=16,
        num_heads=2, dim_feedforward=32, num_encoder_layers=2,
        num_decoder_layers=2, dropout_rate=0.0,
        moe_every_n=2, moe_n_experts=4, moe_n_selected_experts=2,
    )
    rng = np.random.default_rng(20)
    tokens = jnp.asarray(rng.integers(1, 12, (2, 7)), jnp.int32)
    targets = jnp.asarray(rng.integers(1, 12, (2, 6)), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), [tokens, targets])

    def loss_fn(params):
        logits, state = model.apply(
            {"params": params}, [tokens, targets], mutable=["intermediates"]
        )
        ce = jnp.mean(logits.astype(jnp.float32) ** 2)
        return ce + moe_aux_loss(state["intermediates"]), state

    (loss, state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        v["params"]
    )
    assert bool(jnp.isfinite(loss))
    # both stacks routed: encoder layer 1 + decoder layer 1 sow aux
    flat = {jax.tree_util.keystr(pth) for pth, _ in
            jax.tree_util.tree_leaves_with_path(state["intermediates"])}
    assert any("encoder" in k for k in flat)
    assert any("decoder" in k for k in flat)
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0


def test_moe_decoder_expert_parallel_matches_replicated():
    from chambers_tpu.layers.moe import MoEDecoderLayer

    layer = MoEDecoderLayer(
        embed_dim=16, num_heads=2, ff_dim=32, n_experts=8,
        n_selected_experts=2, capacity_factor=2.0, pre_norm=True,
        attention_dropout_rate=0.0, dense_dropout_rate=0.0,
    )
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    v = layer.init(jax.random.PRNGKey(0), [x, mem])
    expected = layer.apply(v, [x, mem])

    mesh = create_mesh({"expert": 8})
    params = jax.tree.map(
        jax.device_put, v["params"],
        make_param_shardings(
            v["params"], mesh, moe_expert_parallel_rules("expert")
        ),
    )
    got = jax.jit(
        lambda p, x, mem: layer.apply({"params": p}, [x, mem])
    )(params, x, mem)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)

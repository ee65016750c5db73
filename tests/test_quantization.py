"""Int8 post-training quantization (chambers_tpu/quantization.py).

The reference has no quantization capability (its fastest inference mode is
the Keras mixed_float16 policy, /root/reference/chambers/utils/generic.py:
32-41); this is a beyond-reference serving feature, so the tests pin the
build's own contract: exact fallback equality, structure preservation,
bounded quantization error, and the inference-only guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from chambers_tpu.quantization import (
    QuantDense,
    dequantize_variables,
    dynamic_quantize,
    quantize_variables,
    quantize_weight,
)


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def test_quantize_weight_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    q, s = quantize_weight(w, (0,))
    assert q.dtype == jnp.int8 and q.shape == w.shape
    assert s.shape == (1, 32)
    # per-channel absmax symmetric: max |w - q*s| <= scale/2 per column
    err = np.abs(np.asarray(w) - np.asarray(q, np.float32) * np.asarray(s))
    assert (err <= np.asarray(s) / 2 + 1e-7).all()


def test_dynamic_quantize_rows():
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 128)) * 3.0
    q, s = dynamic_quantize(x)
    assert q.dtype == jnp.int8 and s.shape == (8, 1)
    back = np.asarray(q, np.float32) * np.asarray(s)
    assert _rel_err(back, x) < 0.01


def test_quant_dense_without_quant_vars_is_nn_dense():
    """Bit-exact fallback: QuantDense == nn.Dense on identical params (the
    drop-in-swap contract that keeps checkpoints and parity suites valid)."""
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 16), jnp.float32)
    ref = nn.Dense(8)
    v = ref.init(jax.random.PRNGKey(3), x)
    got = QuantDense(8).apply(v, x)
    want = ref.apply(v, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # bf16 compute dtype too
    got = QuantDense(8, dtype=jnp.bfloat16).apply(v, x)
    want = nn.Dense(8, dtype=jnp.bfloat16).apply(v, x)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_quant_dense_int8_path_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(4), (32, 64))
    dense = QuantDense(48)
    v = dense.init(jax.random.PRNGKey(5), x)
    qv = quantize_variables(v)
    assert qv["params"]["kernel"].dtype == jnp.int8
    assert qv["params"]["bias"].dtype == v["params"]["bias"].dtype
    got = dense.apply(qv, x)
    want = dense.apply(v, x)
    assert got.dtype == want.dtype
    assert _rel_err(got, want) < 0.02


def test_quantize_variables_structure_and_include():
    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(4, (3, 3), name="conv")(x)
            x = x.reshape((x.shape[0], -1))
            x = QuantDense(8, name="d1")(x)
            return QuantDense(2, name="d2")(x)

    net = Net()
    x = jnp.ones((2, 8, 8, 3))
    v = net.init(jax.random.PRNGKey(0), x)
    qv = quantize_variables(v)
    # conv kernels (4-D) are never quantized
    assert qv["params"]["conv"]["kernel"].dtype == v["params"]["conv"]["kernel"].dtype
    assert qv["params"]["d1"]["kernel"].dtype == jnp.int8
    assert "kernel_scale" in qv["quant"]["d1"]
    assert "conv" not in qv["quant"]
    # shapes preserved exactly (checkpoint-shaped tree)
    assert (jax.tree.map(jnp.shape, qv["params"])
            == jax.tree.map(jnp.shape, v["params"]))

    # include regex restricts the quantized set
    qv2 = quantize_variables(v, include=r"d2/kernel")
    assert qv2["params"]["d1"]["kernel"].dtype != jnp.int8
    assert qv2["params"]["d2"]["kernel"].dtype == jnp.int8

    with pytest.raises(ValueError):
        quantize_variables(qv)  # already quantized
    with pytest.raises(ValueError):
        quantize_variables(v, include="no_such_param")


def test_include_cannot_split_a_weight_group():
    """Grouped weights (MHA q/k/v/projection, MoE w1/w2) key their whole
    int8 path on one sentinel scale, so a partial include would silently
    feed raw int8 through a float einsum — must raise instead."""
    from chambers_tpu.layers import MultiHeadAttention

    mha = MultiHeadAttention(head_dim=8, num_heads=2, dropout_rate=0.0)
    x = jnp.ones((1, 3, 16))
    v = mha.init(jax.random.PRNGKey(0), [x, x])
    with pytest.raises(ValueError, match="splits the quantization group"):
        quantize_variables(v, include=r"w_projection$")
    with pytest.raises(ValueError, match="splits the quantization group"):
        quantize_variables(v, include=r"w_(query|key)$")


def test_quant_dense_dtype_matches_float_branch_promotion():
    """With dtype=None, f32 params, and bf16 inputs the float branch
    promotes to f32 (nn.Dense promote_dtype semantics); the int8 branch
    must resolve the same output dtype, not the input dtype."""
    x = jax.random.normal(jax.random.PRNGKey(30), (4, 16)).astype(jnp.bfloat16)
    dense = QuantDense(8)
    v = dense.init(jax.random.PRNGKey(31), x)
    assert dense.apply(v, x).dtype == jnp.float32
    assert dense.apply(quantize_variables(v), x).dtype == jnp.float32


def test_dequantize_round_trip():
    x = jax.random.normal(jax.random.PRNGKey(6), (8, 32))
    dense = QuantDense(16)
    v = dense.init(jax.random.PRNGKey(7), x)
    back = dequantize_variables(quantize_variables(v))
    assert "quant" not in back
    assert _rel_err(back["params"]["kernel"], v["params"]["kernel"]) < 0.005
    np.testing.assert_array_equal(np.asarray(back["params"]["bias"]),
                                  np.asarray(v["params"]["bias"]))


def test_mha_quantized_self_attention():
    from chambers_tpu.layers import MultiHeadAttention

    mha = MultiHeadAttention(head_dim=16, num_heads=4, dropout_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 10, 64))
    v = mha.init(jax.random.PRNGKey(9), [x, x])
    qv = quantize_variables(v)
    for name in ("w_query", "w_key", "w_value", "w_projection"):
        assert qv["params"][name].dtype == jnp.int8
        assert f"{name}_scale" in qv["quant"]
    got = mha.apply(qv, [x, x])
    want = mha.apply(v, [x, x])
    assert _rel_err(got, want) < 0.03


def test_mha_quantized_cross_attention():
    from chambers_tpu.layers import MultiHeadAttention

    mha = MultiHeadAttention(head_dim=8, num_heads=2, dropout_rate=0.0)
    q = jax.random.normal(jax.random.PRNGKey(10), (2, 5, 16))
    m = jax.random.normal(jax.random.PRNGKey(11), (2, 9, 16))
    v = mha.init(jax.random.PRNGKey(12), [q, m])
    got = mha.apply(quantize_variables(v), [q, m])
    want = mha.apply(v, [q, m])
    assert _rel_err(got, want) < 0.03


def test_encoder_layer_quantized():
    from chambers_tpu.layers import EncoderLayer

    layer = EncoderLayer(embed_dim=32, num_heads=4, ff_dim=64,
                         attention_dropout_rate=0.0, dense_dropout_rate=0.0,
                         pre_norm=True)
    x = jax.random.normal(jax.random.PRNGKey(13), (2, 7, 32))
    v = layer.init(jax.random.PRNGKey(14), x)
    got = layer.apply(quantize_variables(v), x)
    want = layer.apply(v, x)
    assert _rel_err(got, want) < 0.03


def test_vit_quantized_end_to_end():
    """Small ViT: quantized features stay within a few percent of float —
    the serving-accuracy envelope of dynamic per-token/per-channel int8."""
    from chambers_tpu.models.backbones.vision_transformer import (
        VisionTransformer,
    )

    vit = VisionTransformer(
        patch_size=8, patch_dim=64, n_encoder_layers=3, n_heads=4,
        ff_dim=128, dropout_rate=0.0, include_top=False, pooling="cls",
    )
    x = jax.random.normal(jax.random.PRNGKey(15), (2, 32, 32, 3))
    v = vit.init(jax.random.PRNGKey(16), x, deterministic=True)
    qv = quantize_variables(v)
    # patch embedding (conv) must remain float
    assert qv["params"]["patch_embeddings"]["kernel"].dtype != jnp.int8
    got = vit.apply(qv, x, deterministic=True)
    want = vit.apply(v, x, deterministic=True)
    assert _rel_err(got, want) < 0.05


@pytest.mark.parametrize("k", [1, 2])
def test_moe_mlp_quantized_error_bound(k):
    """MoE expert banks quantize per expert per channel; routing (router
    softmax, top-k, dispatch/combine) stays float, so the quantized layer
    routes identically and only the expert MLP math carries int8 error."""
    from chambers_tpu.layers.moe import MoEMLP

    moe = MoEMLP(ff_dim=32, n_experts=4, capacity_factor=2.0,
                 n_selected_experts=k)
    x = jax.random.normal(jax.random.PRNGKey(20), (2, 8, 16))
    v = moe.init(jax.random.PRNGKey(21), x)
    qv = quantize_variables(v)
    assert qv["params"]["w1"].dtype == jnp.int8
    assert qv["params"]["w2"].dtype == jnp.int8
    # router must stay float — its softmax drives routing decisions
    assert qv["params"]["w_router"].dtype == v["params"]["w_router"].dtype
    assert qv["quant"]["w1_scale"].shape == (4, 1, 32)
    assert qv["quant"]["w2_scale"].shape == (4, 1, 16)
    got = moe.apply(qv, x)
    want = moe.apply(v, x)
    assert _rel_err(got, want) < 0.03


def test_moe_quantized_expert_parallel_matches_replicated():
    """Quantized expert banks shard over the expert axis (scales ride the
    same leading axis via shard_quantized) and the EP forward matches the
    replicated quantized forward."""
    from chambers_tpu.layers.moe import MoEMLP
    from chambers_tpu.parallel import create_mesh, shard_quantized
    from chambers_tpu.parallel.expert_parallel import (
        moe_expert_parallel_rules,
    )

    mesh = create_mesh({"expert": 8})
    moe = MoEMLP(ff_dim=32, n_experts=8, capacity_factor=2.0)
    x = jax.random.normal(jax.random.PRNGKey(22), (4, 8, 16))
    qv = quantize_variables(moe.init(jax.random.PRNGKey(23), x))
    want = np.asarray(moe.apply(qv, x))

    placed = shard_quantized(qv, mesh, moe_expert_parallel_rules("expert"))
    assert placed["params"]["w1"].sharding.spec[0] == "expert"
    assert placed["quant"]["w1_scale"].sharding.spec[0] == "expert"
    got = jax.jit(lambda v, a: moe.apply(v, a))(placed, x)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_quantized_greedy_decode_runs_cached_and_full():
    """Quantized variables flow through the compiled decode loops: the KV
    cache primes/updates through the int8 projections, and cached ==
    full-recompute decode exactly (same int8 numerics either way, f32
    compute dtype so there are no bf16 argmax near-ties)."""
    from chambers_tpu.models import Seq2SeqTransformer, greedy_decode

    module = Seq2SeqTransformer(
        input_vocab_size=32, output_vocab_size=32, embed_dim=16,
        num_heads=2, dim_feedforward=32, num_encoder_layers=1,
        num_decoder_layers=1, dropout_rate=0.0,
    )
    src = jnp.asarray(
        np.random.RandomState(0).randint(1, 32, (2, 6)), jnp.int32)
    v = module.init(
        jax.random.PRNGKey(0),
        (jnp.zeros((1, 6), jnp.int32), jnp.zeros((1, 6), jnp.int32)),
    )
    qv = quantize_variables(v)
    full = greedy_decode(module, qv, src, max_len=6, bos_id=1,
                         use_cache=False)
    cached = greedy_decode(module, qv, src, max_len=6, bos_id=1,
                           use_cache=True)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(cached))


def test_trainer_refuses_quantized_variables():
    import optax

    from chambers_tpu.models.model import Model
    from chambers_tpu.training import Trainer

    dense = QuantDense(4)
    x = jnp.ones((2, 8))
    v = quantize_variables(dense.init(jax.random.PRNGKey(17), x))
    model = Model(dense, v)
    with pytest.raises(ValueError, match="inference-only"):
        Trainer(model, loss=lambda y, p: jnp.mean(p ** 2),
                optimizer=optax.sgd(1e-2))


def test_serving_export_quantized_artifact(tmp_path):
    """Quantized variables bake into the AOT serving artifact and reload."""
    from chambers_tpu.models.model import Model
    from chambers_tpu.serving import (
        export_serving_artifact,
        load_serving_artifact,
    )

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic: bool = True):
            return QuantDense(8, name="dense")(x)

    head = Head()
    x = jnp.ones((4, 16), jnp.float32)
    v = head.init(jax.random.PRNGKey(18), x)
    qv = quantize_variables(v)
    path = str(tmp_path / "quant.stablehlo")
    export_serving_artifact(Model(head, qv), path, input_shape=(16,),
                            input_dtype=jnp.float32)
    fn = load_serving_artifact(path)
    got = fn(np.ones((4, 16), np.float32))
    want = head.apply(qv, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

"""LoRA adapter tests (chambers_tpu.training.lora).

Covers: exact base-model equality at init (b=0), factor shapes for Dense
and the MHA (d,n,h)/(n,d,h) layouts, adapter-only training through
Trainer(trainable=lora.TRAINABLE), merge == adapted forward, adapter
extract/insert round-trip, and scale handling.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from flax import linen as nn
from flax.traverse_util import flatten_dict

from chambers_tpu.models import Model
from chambers_tpu.training import Trainer, lora


class _TinyAttnNet(nn.Module):
    """Dense -> MHA self-attention -> Dense head: exercises both the 2D
    kernel and all four MHA projection layouts."""

    @nn.compact
    def __call__(self, x, deterministic=True):
        from chambers_tpu.layers.attention import MultiHeadAttention

        x = nn.Dense(16, name="embed")(x)
        x = MultiHeadAttention(head_dim=8, num_heads=2, dropout_rate=0.0,
                               name="attn")([x, x])
        return nn.Dense(1, name="head")(x[:, 0])


def _make_model(seed=0):
    module = _TinyAttnNet()
    variables = module.init(jax.random.PRNGKey(seed), jnp.zeros((1, 5, 4)))
    return Model(module, variables)


def _x(batch=8, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(batch, 5, 4), jnp.float32)


def test_add_lora_is_identity_at_init():
    model = _make_model()
    x = _x()
    base_out = model.module.apply(model.variables, x)
    params = lora.add_lora(model.variables["params"], rank=4,
                           rng=jax.random.PRNGKey(1))
    apply_fn = lora.wrap_apply(model.module)
    adapted = apply_fn({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(base_out), np.asarray(adapted))


def test_lora_factor_shapes():
    model = _make_model()
    params = lora.add_lora(model.variables["params"], rank=4,
                           rng=jax.random.PRNGKey(1))
    flat = {"/".join(map(str, k)): v for k, v in flatten_dict(params).items()}
    # Dense kernel [4, 16] -> a [4, 4], b [4, 16]
    assert flat["embed/kernel_lora_a"].shape == (4, 4)
    assert flat["embed/kernel_lora_b"].shape == (4, 16)
    # w_query (d=16, n=2, h=8) -> a [16, 4], b [4, 2, 8]
    assert flat["attn/w_query_lora_a"].shape == (16, 4)
    assert flat["attn/w_query_lora_b"].shape == (4, 2, 8)
    # w_projection (n=2, d=16, h=8): in=(n,h) out=d -> a [16, 4], b [4, 16]
    assert flat["attn/w_projection_lora_a"].shape == (2 * 8, 4)
    assert flat["attn/w_projection_lora_b"].shape == (4, 16)
    # biases and adapters themselves get no adapters
    assert "embed/bias_lora_a" not in flat
    assert "embed/kernel_lora_a_lora_a" not in flat


def test_lora_training_moves_only_adapters_and_merges():
    model = _make_model()
    params = lora.add_lora(model.variables["params"], rank=4,
                           rng=jax.random.PRNGKey(1))
    model.replace_variables({"params": params})
    before = jax.tree.map(lambda a: np.asarray(a).copy(), params)

    def mse(y, y_pred):
        return jnp.mean((y - y_pred) ** 2)

    rng = np.random.RandomState(0)
    data = [(rng.randn(8, 5, 4).astype(np.float32),
             rng.randn(8, 1).astype(np.float32)) for _ in range(4)]
    trainer = Trainer(model, loss=mse, optimizer=optax.adam(1e-2),
                      trainable=lora.TRAINABLE,
                      apply_fn=lora.wrap_apply(model.module))
    history = trainer.fit(data, epochs=10, verbose=False)
    assert history[-1]["loss"] < history[0]["loss"] * 0.9

    after = trainer.state.params
    fb, fa = flatten_dict(before), flatten_dict(after)
    for k in fb:
        name = "/".join(map(str, k))
        if name.endswith("_lora_b"):
            assert not np.array_equal(fb[k], np.asarray(fa[k])), name
        elif not name.endswith("_lora_a"):
            np.testing.assert_array_equal(fb[k], np.asarray(fa[k]), err_msg=name)

    # merged base-shaped tree == adapted forward, through the ORIGINAL module
    x = _x()
    adapted = lora.wrap_apply(model.module)({"params": after}, x)
    merged = lora.merge_lora(after)
    assert flatten_dict(merged).keys() == flatten_dict(
        jax.tree.map(lambda a: a, before)).keys() - {
        k for k in fb if "/".join(map(str, k)).endswith(("_lora_a", "_lora_b"))
    }
    merged_out = model.module.apply({"params": merged}, x)
    np.testing.assert_allclose(np.asarray(adapted), np.asarray(merged_out),
                               rtol=1e-6, atol=1e-6)


def test_lora_extract_insert_roundtrip():
    model = _make_model()
    params = lora.add_lora(model.variables["params"], rank=2,
                           rng=jax.random.PRNGKey(1))
    # pretend training moved b
    params = jax.tree.map(lambda a: a + 0.1, params)
    adapters = lora.extract_lora(params)
    n_adapters = len(flatten_dict(adapters))
    assert n_adapters > 0 and n_adapters % 2 == 0
    rebuilt = lora.insert_lora(model.variables["params"], adapters)
    x = _x()
    out_a = lora.wrap_apply(model.module)({"params": params}, x)
    # rebuilt differs in the base (+0.1 was applied to everything in
    # `params`), so compare the adapter leaves instead
    fa, fr = flatten_dict(params), flatten_dict(rebuilt)
    for k in flatten_dict(adapters):
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fr[k]))
    # and the adapted forward runs on the rebuilt tree
    out_r = lora.wrap_apply(model.module)({"params": rebuilt}, x)
    assert np.isfinite(np.asarray(out_r)).all() and out_a.shape == out_r.shape


def test_lora_scale_consistency():
    model = _make_model()
    params = lora.add_lora(model.variables["params"], rank=2,
                           rng=jax.random.PRNGKey(1))
    # move b so scale matters
    params = jax.tree.map(lambda a: a + 0.05, params)
    x = _x()
    out1 = lora.wrap_apply(model.module, scale=1.0)({"params": params}, x)
    out2 = lora.wrap_apply(model.module, scale=2.0)({"params": params}, x)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    merged2 = lora.merge_lora(params, scale=2.0)
    np.testing.assert_allclose(
        np.asarray(model.module.apply({"params": merged2}, x)),
        np.asarray(out2), rtol=1e-6, atol=1e-6)


def test_lora_skips_conv_kernels():
    """4D patch-embedding conv kernels are not adapted by default."""
    from chambers_tpu.models.backbones.vision_transformer import (
        VisionTransformer,
    )

    vit = VisionTransformer(patch_size=8, patch_dim=16, n_encoder_layers=1,
                            n_heads=2, ff_dim=32, dropout_rate=0.0,
                            include_top=True, classes=3, pooling="cls")
    variables = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = lora.add_lora(variables["params"], rank=2,
                           rng=jax.random.PRNGKey(1))
    paths = ["/".join(map(str, k)) for k in flatten_dict(params)]
    conv = [p for p in paths if "patch_embeddings" in p and "_lora" in p]
    assert conv == []
    assert any(p.endswith("w_query_lora_a") for p in paths)
    # the adapted ViT still equals the base ViT at init
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3), jnp.float32)
    base = vit.apply(variables, x, deterministic=True)
    adapted = lora.wrap_apply(vit)({"params": params}, x,
                                   deterministic=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(adapted))


def test_lora_errors():
    model = _make_model()
    with pytest.raises(ValueError, match="rank"):
        lora.add_lora(model.variables["params"], rank=0,
                      rng=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="matched no"):
        lora.add_lora(model.variables["params"], rank=2,
                      rng=jax.random.PRNGKey(0), targets=(r"/nonexistent$",))
    with pytest.raises(ValueError, match="no LoRA adapters"):
        lora.extract_lora(model.variables["params"])
    params = lora.add_lora(model.variables["params"], rank=2,
                           rng=jax.random.PRNGKey(0))
    adapters = lora.extract_lora(params)
    bad = jax.tree.map(lambda a: jnp.zeros((3, 3), a.dtype), adapters)
    with pytest.raises(ValueError, match="does not factor"):
        lora.insert_lora(model.variables["params"], bad)


def test_apply_to_model_routes_every_inference_path():
    """apply_to_model installs the adapted forward on the Model itself, so
    model(x), model.predict, and trainer.predict all see the adapters —
    none of them silently serve the base model."""
    model = _make_model()
    x = _x()
    base = np.asarray(model.module.apply(model.variables, x))
    model = lora.apply_to_model(model, rank=4, rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(model(x)), base)  # b=0 at init

    def mse(y, y_pred):
        return jnp.mean((y - y_pred) ** 2)

    rng = np.random.RandomState(0)
    data = [(rng.randn(8, 5, 4).astype(np.float32),
             rng.randn(8, 1).astype(np.float32)) for _ in range(4)]
    # no apply_fn= needed: the Trainer picks up the model's override
    trainer = Trainer(model, loss=mse, optimizer=optax.adam(1e-2),
                      trainable=lora.TRAINABLE)
    history = trainer.fit(data, epochs=8, verbose=False)
    assert history[-1]["loss"] < history[0]["loss"]

    adapted = np.asarray(
        lora.wrap_apply(model.module)({"params": trainer.state.params}, x))
    raw_base = np.asarray(
        model.module.apply({"params": trainer.state.params}, x))
    assert not np.allclose(adapted, raw_base)  # training moved the adapters
    np.testing.assert_allclose(np.asarray(model.predict(np.asarray(x))),
                               adapted, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(trainer.predict(np.asarray(x))),
                               adapted, rtol=1e-5, atol=1e-6)


def test_lora_orphan_adapters_fail_loudly():
    """A filtered/corrupted tree holding half an adapter pair must raise,
    not silently serve the base model (merge skips) or KeyError."""
    model = _make_model()
    params = lora.add_lora(model.variables["params"], rank=2,
                           rng=jax.random.PRNGKey(1))
    flat = dict(flatten_dict(params))
    a_key = next(k for k in flat if str(k[-1]).endswith("_lora_a"))
    b_key = a_key[:-1] + (str(a_key[-1])[:-len("_lora_a")] + "_lora_b",)

    from flax.traverse_util import unflatten_dict

    no_b = unflatten_dict({k: v for k, v in flat.items() if k != b_key})
    with pytest.raises(ValueError, match="orphan"):
        lora.merge_lora(no_b)
    no_a = unflatten_dict({k: v for k, v in flat.items() if k != a_key})
    with pytest.raises(ValueError, match="orphan"):
        lora.merge_lora(no_a)
    with pytest.raises(ValueError, match="orphan"):
        lora.extract_lora(no_b)
    half = unflatten_dict({a_key: flat[a_key]})
    with pytest.raises(ValueError, match="orphan"):
        lora.insert_lora(model.variables["params"], half)

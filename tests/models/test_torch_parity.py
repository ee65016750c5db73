"""Cross-framework ViT parity vs PyTorch (transformers).

Equivalent of the reference's manual weight-parity test
(test_units/manual_test_vit_weights.py): import a torch ViT's weights into the
Chambers layout and require numerical agreement. The reference checks released
timm weights (network-bound); here a randomly-initialized HF ViT serves as the
ground truth — the mapping logic under test is identical, and tolerances
mirror the reference's (1e-5 per-module, 1e-3 end-to-end logits,
manual_test_vit_weights.py:260-341).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from chambers_tpu.models.backbones.h5_import import load_torch_vit_weights
from chambers_tpu.models.backbones.vision_transformer import VisionTransformer

HIDDEN, LAYERS, HEADS, FF, IMG, PATCH = 48, 2, 3, 96, 32, 16


@pytest.fixture(scope="module")
def torch_vit():
    cfg = transformers.ViTConfig(
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=FF,
        image_size=IMG,
        patch_size=PATCH,
        layer_norm_eps=1e-6,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = transformers.ViTModel(cfg, add_pooling_layer=False)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_vit(torch_vit):
    vit = VisionTransformer(
        patch_size=PATCH, patch_dim=HIDDEN, n_encoder_layers=LAYERS,
        n_heads=HEADS, ff_dim=FF, dropout_rate=0.0,
        include_top=False, pooling=None,
    )
    dummy = jnp.zeros((1, IMG, IMG, 3))
    variables = vit.init(jax.random.PRNGKey(0), dummy)
    variables = load_torch_vit_weights(
        torch_vit.state_dict(), variables, num_heads=HEADS
    )
    return vit, variables


def test_end_to_end_token_parity(torch_vit, jax_vit):
    vit, variables = jax_vit
    rng = np.random.RandomState(0)
    x = rng.randn(2, IMG, IMG, 3).astype(np.float32)

    with torch.no_grad():
        torch_out = torch_vit(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()

    jax_out = np.asarray(vit.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(jax_out, torch_out, atol=1e-4)


def test_patch_embedding_parity(torch_vit, jax_vit):
    vit, variables = jax_vit
    rng = np.random.RandomState(1)
    x = rng.randn(1, IMG, IMG, 3).astype(np.float32)

    with torch.no_grad():
        torch_patches = torch_vit.embeddings.patch_embeddings(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).numpy()

    params = variables["params"]["patch_embeddings"]
    patches = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(params["kernel"]),
        window_strides=(PATCH, PATCH), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(params["bias"])
    patches = np.asarray(patches).reshape(1, -1, HIDDEN)
    np.testing.assert_allclose(patches, torch_patches, atol=1e-5)


def test_single_encoder_layer_parity(torch_vit, jax_vit):
    """Layer-by-layer parity at the reference's per-module tolerance."""
    vit, variables = jax_vit
    rng = np.random.RandomState(2)
    tokens = rng.randn(2, 5, HIDDEN).astype(np.float32)

    with torch.no_grad():
        torch_out = torch_vit.encoder.layer[0](torch.from_numpy(tokens))
        if isinstance(torch_out, (tuple, list)):
            torch_out = torch_out[0]
        torch_out = torch_out.numpy()

    from chambers_tpu.layers import EncoderLayer

    layer = EncoderLayer(
        embed_dim=HIDDEN, num_heads=HEADS, ff_dim=FF,
        attention_dropout_rate=0.0, dense_dropout_rate=0.0, pre_norm=True,
    )
    layer_vars = {"params": variables["params"]["encoder"]["layers_0"]}
    jax_out = np.asarray(layer.apply(layer_vars, jnp.asarray(tokens)))
    np.testing.assert_allclose(jax_out, torch_out, atol=1e-5)


def test_gradients_flow(jax_vit):
    """The imported model must be trainable end-to-end."""
    vit, variables = jax_vit
    x = jnp.asarray(np.random.RandomState(3).randn(2, IMG, IMG, 3), jnp.float32)

    def loss_fn(params):
        out = vit.apply({"params": params}, x)
        return jnp.mean(out ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)

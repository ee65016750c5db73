"""AOT serving export tests (jax.export StableHLO artifacts)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chambers_tpu.models.backbones.vision_transformer import VisionTransformer
from chambers_tpu.models import Model
from chambers_tpu.serving import (
    export_serving_artifact,
    load_serving_artifact,
)


@pytest.fixture(scope="module")
def tiny_vit():
    vit = VisionTransformer(
        patch_size=8, patch_dim=32, n_encoder_layers=2, n_heads=2,
        ff_dim=64, dropout_rate=0.0, include_top=True, classes=7,
        pooling="cls",
    )
    x = jnp.zeros((1, 32, 32, 3))
    variables = vit.init(jax.random.PRNGKey(0), x)
    return Model(vit, variables)


def test_export_fixed_batch_roundtrip(tiny_vit, tmp_path):
    path = str(tmp_path / "model.stablehlo")
    nbytes = export_serving_artifact(tiny_vit, path, (32, 32, 3),
                                     batch_size=4)
    assert nbytes > 0
    serve = load_serving_artifact(path)
    x = np.random.RandomState(0).rand(4, 32, 32, 3).astype(np.float32)
    got = np.asarray(serve(x))
    want = np.asarray(tiny_vit.module.apply(tiny_vit.variables,
                                            jnp.asarray(x),
                                            deterministic=True))
    assert got.shape == (4, 7)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_symbolic_batch(tiny_vit, tmp_path):
    path = str(tmp_path / "model_poly.stablehlo")
    export_serving_artifact(tiny_vit, path, (32, 32, 3), batch_size=None)
    serve = load_serving_artifact(path)
    for b in (1, 3, 8):
        x = np.random.RandomState(b).rand(b, 32, 32, 3).astype(np.float32)
        out = np.asarray(serve(x))
        assert out.shape == (b, 7)
        want = np.asarray(tiny_vit.module.apply(
            tiny_vit.variables, jnp.asarray(x), deterministic=True))
        np.testing.assert_allclose(out, want, atol=1e-5)


def test_artifact_is_self_contained(tiny_vit, tmp_path):
    """The artifact bakes the variables: calling it never touches the model
    object (deleting the model is fine)."""
    path = str(tmp_path / "model.stablehlo")
    export_serving_artifact(tiny_vit, path, (32, 32, 3), batch_size=2)
    x = np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32)
    want = np.asarray(tiny_vit.module.apply(tiny_vit.variables,
                                            jnp.asarray(x),
                                            deterministic=True))
    del tiny_vit
    serve = load_serving_artifact(path)
    np.testing.assert_allclose(np.asarray(serve(x)), want, atol=1e-5)

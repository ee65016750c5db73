"""Keras legacy-h5 weight import tests.

Builds a synthetic weights file in the legacy Keras layout (top-level
``layer_names`` attr, per-layer ``weight_names``) with the reference ViT's
naming scheme, imports it, and checks every parameter landed in the right
place with the right values.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

h5py = pytest.importorskip("h5py")

from chambers_tpu.models.backbones.h5_import import (
    load_keras_h5_weights,
    load_vit_h5_weights,
)
from chambers_tpu.models.backbones.vision_transformer import VisionTransformer

PATCH, DIM, LAYERS, HEADS, FF, IMG = 16, 48, 2, 3, 96, 32
TOKENS = (IMG // PATCH) ** 2 + 1


def _write_reference_style_h5(path, rng):
    """Emulate the layer/weight naming of the reference Keras ViT."""
    arrays = {}

    def a(name, shape):
        arrays[name] = rng.randn(*shape).astype(np.float32)
        return arrays[name]

    with h5py.File(path, "w") as f:
        layer_specs = {}

        layer_specs["patch_embeddings"] = [
            ("patch_embeddings/embedding/kernel:0", (PATCH, PATCH, 3, DIM)),
            ("patch_embeddings/embedding/bias:0", (DIM,)),
        ]
        layer_specs["add_cls_token"] = [
            ("add_cls_token/embeddings:0", (1, DIM)),
        ]
        layer_specs["pos_embedding"] = [
            ("pos_embedding/embeddings:0", (TOKENS, DIM)),
        ]
        enc = []
        for i in range(LAYERS):
            suffix = "" if i == 0 else f"_{i}"
            base = f"encoder/encoder_layer{suffix}"
            mha = f"{base}/multi_head_attention{suffix}"
            enc += [
                (f"{mha}/w_query:0", (DIM, HEADS, DIM // HEADS)),
                (f"{mha}/b_query:0", (HEADS, 1, DIM // HEADS)),
                (f"{mha}/w_value:0", (DIM, HEADS, DIM // HEADS)),
                (f"{mha}/b_value:0", (HEADS, 1, DIM // HEADS)),
                (f"{mha}/w_key:0", (DIM, HEADS, DIM // HEADS)),
                (f"{mha}/b_key:0", (HEADS, 1, DIM // HEADS)),
                (f"{mha}/w_projection:0", (HEADS, DIM, DIM // HEADS)),
                (f"{mha}/b_projection:0", (1, DIM)),
                (f"{base}/layer_normalization{suffix}/gamma:0", (DIM,)),
                (f"{base}/layer_normalization{suffix}/beta:0", (DIM,)),
                (f"{base}/dense{suffix}/kernel:0", (DIM, FF)),
                (f"{base}/dense{suffix}/bias:0", (FF,)),
                (f"{base}/dense_x{suffix}/kernel:0", (FF, DIM)),
                (f"{base}/dense_x{suffix}/bias:0", (DIM,)),
                (f"{base}/layer_normalization_b{suffix}/gamma:0", (DIM,)),
                (f"{base}/layer_normalization_b{suffix}/beta:0", (DIM,)),
            ]
        enc += [
            ("encoder/layer_normalization_final/gamma:0", (DIM,)),
            ("encoder/layer_normalization_final/beta:0", (DIM,)),
        ]
        layer_specs["encoder"] = enc
        layer_specs["predictions"] = [
            ("predictions/kernel:0", (DIM, 10)),
            ("predictions/bias:0", (10,)),
        ]

        f.attrs["layer_names"] = [s.encode() for s in layer_specs]
        for layer_name, weights in layer_specs.items():
            g = f.create_group(layer_name)
            g.attrs["weight_names"] = [w.encode() for w, _ in weights]
            for wname, shape in weights:
                g.create_dataset(wname, data=a(wname, shape))

    return arrays


def test_h5_roundtrip_into_flax_tree(tmp_path):
    rng = np.random.RandomState(0)
    path = str(tmp_path / "vit.h5")
    arrays = _write_reference_style_h5(path, rng)

    flat = load_keras_h5_weights(path)
    assert len(flat) == len(arrays)

    vit = VisionTransformer(
        patch_size=PATCH, patch_dim=DIM, n_encoder_layers=LAYERS, n_heads=HEADS,
        ff_dim=FF, dropout_rate=0.0, include_top=True, classes=10, pooling="cls",
    )
    variables = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)))
    imported = load_vit_h5_weights(path, variables)
    p = imported["params"]

    np.testing.assert_array_equal(
        p["patch_embeddings"]["kernel"], arrays["patch_embeddings/embedding/kernel:0"]
    )
    np.testing.assert_array_equal(
        p["add_cls_token"]["embeddings"], arrays["add_cls_token/embeddings:0"]
    )
    np.testing.assert_array_equal(
        p["pos_embedding"]["embeddings"], arrays["pos_embedding/embeddings:0"]
    )
    for i in range(LAYERS):
        suffix = "" if i == 0 else f"_{i}"
        layer = p["encoder"][f"layers_{i}"]
        mha = f"encoder/encoder_layer{suffix}/multi_head_attention{suffix}"
        np.testing.assert_array_equal(
            layer["multi_head_attention"]["w_query"], arrays[f"{mha}/w_query:0"]
        )
        np.testing.assert_array_equal(
            layer["multi_head_attention"]["w_projection"],
            arrays[f"{mha}/w_projection:0"],
        )
        base = f"encoder/encoder_layer{suffix}"
        # first norm pair in file order -> norm1; second -> norm2
        np.testing.assert_array_equal(
            layer["norm1"]["scale"],
            arrays[f"{base}/layer_normalization{suffix}/gamma:0"],
        )
        np.testing.assert_array_equal(
            layer["norm2"]["scale"],
            arrays[f"{base}/layer_normalization_b{suffix}/gamma:0"],
        )
        # dense disambiguation by shape
        np.testing.assert_array_equal(
            layer["dense1"]["kernel"], arrays[f"{base}/dense{suffix}/kernel:0"]
        )
        np.testing.assert_array_equal(
            layer["dense2"]["kernel"], arrays[f"{base}/dense_x{suffix}/kernel:0"]
        )
    np.testing.assert_array_equal(
        p["encoder"]["norm_layer"]["scale"],
        arrays["encoder/layer_normalization_final/gamma:0"],
    )
    np.testing.assert_array_equal(
        p["predictions"]["kernel"], arrays["predictions/kernel:0"]
    )

    # imported model runs
    out = vit.apply(imported, jnp.ones((1, IMG, IMG, 3)))
    assert out.shape == (1, 10)


def test_h5_shape_mismatch_raises(tmp_path):
    rng = np.random.RandomState(0)
    path = str(tmp_path / "vit.h5")
    _write_reference_style_h5(path, rng)
    vit = VisionTransformer(
        patch_size=PATCH, patch_dim=DIM, n_encoder_layers=LAYERS, n_heads=HEADS,
        ff_dim=FF, dropout_rate=0.0, include_top=True, classes=99, pooling="cls",
    )
    variables = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)))
    with pytest.raises(ValueError, match="Shape mismatch"):
        load_vit_h5_weights(path, variables)

"""Order-based CNN h5 import tests (synthetic legacy-format files)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

h5py = pytest.importorskip("h5py")

from chambers_tpu.models.backbones.h5_import_cnn import (
    _ordered_param_leaves,
    load_cnn_h5_weights,
)
from chambers_tpu.models.backbones.senet import MODELS_PARAMS, SENetModule


def _write_stream_h5(path, arrays):
    """Write arrays as a single-layer legacy h5 (order-preserving)."""
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = [b"all"]
        g = f.create_group("all")
        names = [f"all/w_{i}:0" for i in range(len(arrays))]
        g.attrs["weight_names"] = [n.encode() for n in names]
        for name, arr in zip(names, arrays):
            g.create_dataset(name, data=arr)


@pytest.fixture(scope="module")
def small_senet():
    module = SENetModule(model_params=MODELS_PARAMS["seresnet50"]._replace(
        repetitions=(1, 1)), classes=5)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return module, variables


def test_ordered_leaves_interleave_bn(small_senet):
    _, variables = small_senet
    leaves = _ordered_param_leaves(variables)
    names = ["/".join(p) for p, _ in leaves]
    # first module: conv kernel then BN gamma/beta/mean/var
    assert names[0].endswith("_ConvBN_0/Conv_0/kernel")
    assert names[1].endswith("_ConvBN_0/BatchNorm_0/scale")
    assert names[2].endswith("_ConvBN_0/BatchNorm_0/bias")
    assert names[3].endswith("_ConvBN_0/BatchNorm_0/mean")
    assert names[4].endswith("_ConvBN_0/BatchNorm_0/var")
    # total leaf count covers every param + batch stat
    n_expected = sum(
        1 for _ in jax.tree.leaves(variables["params"])
    ) + sum(1 for _ in jax.tree.leaves(variables["batch_stats"]))
    assert len(leaves) == n_expected


def test_roundtrip_exact_shapes(tmp_path, small_senet):
    module, variables = small_senet
    rng = np.random.RandomState(0)
    leaves = _ordered_param_leaves(variables)
    arrays = [rng.randn(*shape).astype(np.float32) for _, shape in leaves]
    path = str(tmp_path / "senet.h5")
    _write_stream_h5(path, arrays)

    loaded = load_cnn_h5_weights(path, variables)
    # spot-check first conv kernel and a deep BN stat
    np.testing.assert_array_equal(
        loaded["params"]["_ConvBN_0"]["Conv_0"]["kernel"], arrays[0]
    )
    np.testing.assert_array_equal(
        loaded["batch_stats"]["_ConvBN_0"]["BatchNorm_0"]["mean"], arrays[3]
    )
    # model runs with imported weights
    out = module.apply(loaded, jnp.zeros((1, 32, 32, 3)), deterministic=True)
    assert out.shape == (1, 5)


def test_grouped_conv_concat(tmp_path):
    """Per-group Keras kernels concatenate into the grouped-conv kernel."""
    module = SENetModule(model_params=MODELS_PARAMS["seresnext50"]._replace(
        repetitions=(1,)), classes=3)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    leaves = _ordered_param_leaves(variables)

    rng = np.random.RandomState(1)
    arrays = [rng.randn(*shape).astype(np.float32) for _, shape in leaves]

    # find the SEResNeXt grouped conv kernel ([3, 3, 4, 128]) and split it
    # into 32 per-group kernels like the reference's GroupConv2D would save
    target_idx = next(
        i for i, (p, s) in enumerate(leaves)
        if len(s) == 4 and s[:3] == (3, 3, 4) and s[3] == 128
    )
    full = arrays[target_idx]
    parts = [full[..., i * 4:(i + 1) * 4] for i in range(32)]
    stream = arrays[:target_idx] + parts + arrays[target_idx + 1:]

    path = str(tmp_path / "senext.h5")
    _write_stream_h5(path, stream)
    loaded = load_cnn_h5_weights(path, variables)

    got = loaded["params"]["SEResNeXtBottleneck_0"]["_ConvBN_1"]["Conv_0"]["kernel"]
    np.testing.assert_array_equal(np.asarray(got), full)


def test_stream_mismatch_raises(tmp_path, small_senet):
    _, variables = small_senet
    leaves = _ordered_param_leaves(variables)
    rng = np.random.RandomState(0)
    arrays = [rng.randn(*shape).astype(np.float32) for _, shape in leaves]
    path = str(tmp_path / "bad.h5")
    _write_stream_h5(path, arrays[:-2])  # truncated
    with pytest.raises(ValueError, match="exhausted"):
        load_cnn_h5_weights(path, variables)

    arrays[0] = np.zeros((9, 9, 9, 9), np.float32)
    _write_stream_h5(path, arrays)
    with pytest.raises(ValueError, match="mismatch"):
        load_cnn_h5_weights(path, variables)

"""Generic utility tests."""

import io

import numpy as np
import pytest

from chambers_tpu.utils.generic import (
    ProgressBar,
    Timer,
    deserialize_object,
    get_model_memory_usage,
    set_random_seed,
    use_mixed_precision,
)


def test_set_random_seed_deterministic():
    key1 = set_random_seed(42)
    a = np.random.rand(3)
    key2 = set_random_seed(42)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(key1), np.asarray(key2))


def test_deserialize_object():
    registry = {"adder": lambda x=0: x + 1}
    assert deserialize_object("adder", registry, "op", x=2) == 3
    with pytest.raises(ValueError, match="Unknown op"):
        deserialize_object("missing", registry, "op")
    with pytest.raises(ValueError):
        deserialize_object(123, registry, "op")


def test_use_mixed_precision():
    import jax.numpy as jnp

    assert use_mixed_precision("bfloat16") == jnp.bfloat16
    assert use_mixed_precision("mixed_float16") == jnp.float16
    with pytest.raises(ValueError):
        use_mixed_precision("int4")


def test_timer():
    with Timer() as t:
        sum(range(1000))
    assert t.elapsed >= 0


def test_progress_bar_renders():
    stream = io.StringIO()
    bar = ProgressBar(total=4, cols=8, stream=stream)
    bar.add(1)
    bar.update(4)
    out = stream.getvalue()
    assert "1/4" in out and "4/4" in out
    assert "=" in out


def test_progress_bar_dataset_apply():
    from chambers_tpu.data import Dataset

    stream = io.StringIO()
    bar = ProgressBar(total=3, stream=stream)
    ds = bar.dataset_apply_fn(Dataset.range(3))
    assert len(list(ds)) == 3
    assert "3/3" in stream.getvalue()


def test_model_memory_usage():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from chambers_tpu.models import Model

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            return nn.Dense(2048)(x)

    module = Net()
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 2048)))
    model = Model(module, variables)
    gb_params_only = get_model_memory_usage(1, model)
    assert gb_params_only > 0  # 2048x2048 fp32 ≈ 0.016 GB
    gb_with_acts = get_model_memory_usage(8, model, input_shape=(2048,))
    assert gb_with_acts >= gb_params_only


def test_reference_helper_parity():
    """Public helpers the reference exports (caught by the round-3 symbol
    sweep): validate_dir_path (io.py:21-25), arg_to_gather_nd
    (utils/tensor.py:28-34), the Reduce/ArgReduce wrapper extension points
    (layers/ops.py:54-101), and the sincos helpers (embedding.py:5-31)."""
    import jax.numpy as jnp
    import numpy as np

    from chambers_tpu.data import validate_dir_path
    from chambers_tpu.layers import angle_rates, sequence_sin_cos_angles
    from chambers_tpu.layers.embedding import positional_encoding_1d
    from chambers_tpu.layers.ops import (
        ArgReduceFunctionWrapper,
        ReduceFunctionWrapper,
        Sum,
    )
    from chambers_tpu.utils.tensor import arg_to_gather_nd, take_along_rows

    assert validate_dir_path("a/b") == "a/b/"
    assert validate_dir_path("a/b/") == "a/b/"

    # sincos helpers reproduce the precomputed 1D encoding
    seq = jnp.arange(7, dtype=jnp.float32)[:, None]
    enc = sequence_sin_cos_angles(seq, 16)
    np.testing.assert_allclose(enc, positional_encoding_1d(7, 16),
                               atol=1e-6)
    rates = angle_rates(jnp.arange(16), 16)
    assert rates.shape == (1, 16) and float(rates[0, 0]) == 1.0

    # wrapper extension points equal their preconfigured instances
    x = jnp.asarray(np.random.RandomState(0).randn(4, 5).astype(np.float32))
    np.testing.assert_array_equal(
        ReduceFunctionWrapper(jnp.sum, axis=1)(x), Sum(axis=1)(x))
    med = ReduceFunctionWrapper(
        lambda v, axis, keepdims: jnp.median(v, axis=axis,
                                             keepdims=keepdims), axis=0)(x)
    np.testing.assert_array_equal(med, jnp.median(x, axis=0))
    am = ArgReduceFunctionWrapper(jnp.argmax, axis=1)(x)
    np.testing.assert_array_equal(am, jnp.argmax(x, axis=1))

    # arg_to_gather_nd coordinates gather the same values as the dense path
    idx = jnp.asarray([[2, 0], [1, 1], [0, 2], [4, 3]])
    coords = arg_to_gather_nd(idx)
    assert coords.shape == (8, 2)
    gathered = x[coords[:, 0], coords[:, 1]].reshape(4, 2)
    np.testing.assert_array_equal(gathered, take_along_rows(x, idx))


def test_set_dtype_policy_deep():
    import jax.numpy as jnp
    import pytest

    from chambers_tpu.layers import EncoderLayer
    from chambers_tpu.utils.generic import set_dtype_policy_deep

    layer = EncoderLayer(embed_dim=8, num_heads=2, ff_dim=16)
    cast = set_dtype_policy_deep(layer, "mixed_bfloat16")
    assert cast.dtype == jnp.bfloat16
    assert layer.dtype != jnp.bfloat16  # original is untouched (clone)

    class NoDtype:
        pass

    with pytest.raises(ValueError, match="dtype"):
        set_dtype_policy_deep(NoDtype(), "bfloat16")

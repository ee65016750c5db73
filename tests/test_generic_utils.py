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

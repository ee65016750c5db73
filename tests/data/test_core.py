"""Dataset core combinator tests."""

import numpy as np
import pytest

from chambers_tpu.data import Dataset


def test_from_tensor_slices_single():
    ds = Dataset.from_tensor_slices(np.arange(5))
    assert [int(x) for x in ds] == [0, 1, 2, 3, 4]


def test_from_tensor_slices_tuple():
    ds = Dataset.from_tensor_slices((np.arange(3), np.arange(3) * 10))
    assert [(int(a), int(b)) for a, b in ds] == [(0, 0), (1, 10), (2, 20)]


def test_length_mismatch_raises():
    with pytest.raises(ValueError):
        Dataset.from_tensor_slices((np.arange(3), np.arange(4)))


def test_map_sequential_and_parallel():
    ds = Dataset.range(10)
    assert [int(x) for x in ds.map(lambda x: x * 2)] == list(range(0, 20, 2))
    # parallel map preserves order
    assert [int(x) for x in ds.map(lambda x: x * 2, num_parallel_calls=4)] == \
        list(range(0, 20, 2))


def test_map_parallel_propagates_errors():
    def bad(x):
        if x == 5:
            raise RuntimeError("boom")
        return x

    with pytest.raises(RuntimeError, match="boom"):
        list(Dataset.range(10).map(bad, num_parallel_calls=4))


def test_batch_and_drop_remainder():
    ds = Dataset.range(7).batch(3)
    batches = list(ds)
    assert [len(b) for b in batches] == [3, 3, 1]
    ds = Dataset.range(7).batch(3, drop_remainder=True)
    assert [len(b) for b in ds] == [3, 3]


def test_batch_tuples():
    ds = Dataset.from_tensor_slices((np.arange(4), np.arange(4))).batch(2)
    xb, yb = next(iter(ds))
    assert xb.shape == (2,) and yb.shape == (2,)


def test_unbatch():
    ds = Dataset.range(6).batch(2).unbatch()
    assert [int(x) for x in ds] == list(range(6))


def test_repeat_take_skip():
    assert len(list(Dataset.range(3).repeat(2))) == 6
    assert [int(x) for x in Dataset.range(10).take(3)] == [0, 1, 2]
    assert [int(x) for x in Dataset.range(5).skip(2)] == [2, 3, 4]
    # infinite repeat + take terminates
    assert len(list(Dataset.range(2).repeat().take(9))) == 9


def test_flat_map():
    ds = Dataset.range(3).flat_map(lambda x: Dataset.range(int(x)))
    assert [int(v) for v in ds] == [0, 0, 1]


def test_filter():
    assert [int(x) for x in Dataset.range(10).filter(lambda x: x % 2 == 0)] == \
        [0, 2, 4, 6, 8]


def test_concatenate():
    ds = Dataset.range(2).concatenate(Dataset.range(3))
    assert [int(x) for x in ds] == [0, 1, 0, 1, 2]


def test_prefetch_preserves_order_and_errors():
    assert [int(x) for x in Dataset.range(100).prefetch(4)] == list(range(100))

    def gen():
        yield 1
        raise RuntimeError("producer failed")

    with pytest.raises(RuntimeError, match="producer failed"):
        list(Dataset.from_generator(gen).prefetch(2))


def test_cache():
    calls = []

    def gen():
        for i in range(3):
            calls.append(i)
            yield i

    ds = Dataset.from_generator(gen).cache()
    assert [int(x) for x in ds] == [0, 1, 2]
    assert [int(x) for x in ds] == [0, 1, 2]
    assert len(calls) == 3  # second pass served from cache


def test_interleave_basic_round_robin():
    ds = Dataset.from_tensor_slices(np.arange(4)).interleave(
        lambda x: Dataset.from_tensor_slices(np.full(2, int(x))),
        cycle_length=2, block_length=1,
    )
    assert [int(v) for v in ds] == [0, 1, 0, 1, 2, 3, 2, 3]


def test_interleave_block_length():
    ds = Dataset.from_tensor_slices(np.arange(4)).interleave(
        lambda x: Dataset.from_tensor_slices(np.full(4, int(x))),
        cycle_length=2, block_length=2,
    )
    assert [int(v) for v in ds] == [0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3]


def test_interleave_uneven_children():
    """tf.data golden shape: exhausted slots refill and wait their turn."""
    lengths = {0: 3, 1: 3, 2: 1}
    ds = Dataset.from_tensor_slices(np.arange(3)).interleave(
        lambda x: Dataset.from_tensor_slices(np.full(lengths[int(x)], int(x))),
        cycle_length=2, block_length=2,
    )
    # slots (0,1): 0,0 1,1 then 0 exhausts -> 2 joins tail; 1 exhausts
    assert [int(v) for v in ds] == [0, 0, 1, 1, 0, 1, 2]


def test_shuffle_deterministic_with_seed():
    ds1 = [int(x) for x in Dataset.range(20).shuffle(20, seed=5)]
    ds2 = [int(x) for x in Dataset.range(20).shuffle(20, seed=5)]
    assert ds1 == ds2
    assert sorted(ds1) == list(range(20))
    assert ds1 != list(range(20))


def test_shuffle_small_buffer_is_local():
    out = [int(x) for x in Dataset.range(100).shuffle(5, seed=0)]
    assert sorted(out) == list(range(100))
    # with a buffer of 5, element i can move at most ~buffer positions early
    for pos, v in enumerate(out):
        assert v <= pos + 5


def test_device_prefetch_order_and_placement():
    import jax

    from chambers_tpu.data.loader import device_prefetch

    batches = [({"x": np.full((2, 2), i, np.float32)}, np.full(2, i)) for i in range(7)]
    out = list(device_prefetch(batches, size=3))
    assert len(out) == 7
    for i, (d, y) in enumerate(out):
        assert isinstance(d["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(d["x"]), batches[i][0]["x"])

    # with a mesh sharding
    from chambers_tpu.parallel import batch_sharding, create_mesh

    mesh = create_mesh({"data": 8})
    out = list(device_prefetch(
        [np.zeros((16, 4), np.float32)], sharding=batch_sharding(mesh)
    ))
    assert out[0].sharding.spec == ("data",)

    with pytest.raises(ValueError):
        list(device_prefetch(batches, size=0))


def test_cardinality_propagation():
    """tf.data cardinality semantics (reference utils/data.py:6-11 relies
    on the -1 infinite / -2 unknown sentinels): known for sized sources
    through count-preserving/transforming combinators, unknown where the
    element count is data-dependent."""
    from chambers_tpu.data.core import (
        INFINITE_CARDINALITY,
        UNKNOWN_CARDINALITY,
    )
    from chambers_tpu.utils.data import valid_cardinality

    d = Dataset.from_tensor_slices(np.arange(10))
    assert d.cardinality() == 10
    assert d.batch(3).cardinality() == 4
    assert d.batch(3, drop_remainder=True).cardinality() == 3
    assert d.repeat().cardinality() == INFINITE_CARDINALITY
    assert d.repeat(3).cardinality() == 30
    assert d.take(4).cardinality() == 4
    assert d.take(99).cardinality() == 10
    assert d.skip(4).cardinality() == 6
    assert d.shard(3, 1).cardinality() == 3
    assert d.concatenate(d).cardinality() == 20
    assert d.map(lambda x: x).cardinality() == 10
    assert d.shuffle(4, seed=0).cardinality() == 10
    assert d.repeat().take(7).cardinality() == 7
    assert d.filter(lambda x: True).cardinality() == UNKNOWN_CARDINALITY
    assert Dataset.from_generator(lambda: iter([1])).cardinality() \
        == UNKNOWN_CARDINALITY
    # reported counts match what actually streams
    for ds in (d.batch(3), d.shard(3, 1), d.skip(4), d.repeat(3)):
        assert sum(1 for _ in ds) == ds.cardinality()
    assert valid_cardinality(d)
    assert not valid_cardinality(d.repeat())
    assert not valid_cardinality(d.filter(lambda x: True))


def test_zip_shortest_and_cardinality():
    """Dataset.zip: tf.data semantics — element tuples, stops at the
    shortest input, cardinality = min of the known ones."""
    from chambers_tpu.data.core import INFINITE_CARDINALITY

    a = Dataset.range(5)
    b = Dataset.from_tensor_slices(np.asarray([10, 11, 12]))
    z = Dataset.zip((a, b))
    assert z.cardinality() == 3
    got = [(int(x), int(y)) for x, y in iter(z)]
    assert got == [(0, 10), (1, 11), (2, 12)]

    inf = Dataset.range(2).repeat()
    assert inf.cardinality() == INFINITE_CARDINALITY
    z2 = Dataset.zip((inf, Dataset.range(4)))
    assert z2.cardinality() == 4
    assert len(list(iter(z2))) == 4

    with pytest.raises(ValueError, match="at least one"):
        Dataset.zip(())


def test_enumerate_matches_tf_semantics():
    ds = Dataset.from_tensor_slices(np.asarray([7, 8, 9])).enumerate(start=5)
    got = [(int(i), int(v)) for i, v in iter(ds)]
    assert got == [(5, 7), (6, 8), (7, 9)]
    assert ds.cardinality() == 3

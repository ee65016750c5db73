"""Record serde + dataset persistence round-trip tests.

Mirrors the reference's test_units/data/test_tf_record.py: round-trip equality
for 1/2/3-tensor elements, spec modes, variable-shape datasets, and the
expected error on shape mismatch (test_tf_record.py:182-198).
"""

import numpy as np
import pytest

from chambers_tpu.data import (
    Dataset,
    dataset_to_records,
    load_dataset,
    records_to_dataset,
    save_dataset,
)
from chambers_tpu.data.records import check_spec, element_spec


def _assert_elements_equal(a, b):
    if isinstance(a, tuple):
        assert isinstance(b, tuple) and len(a) == len(b)
        for x, y in zip(a, b):
            _assert_elements_equal(x, y)
    elif isinstance(a, str):
        assert a == b
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("make", [
    lambda rng: rng.randn(4, 3).astype(np.float32),
    lambda rng: (rng.randn(4, 3).astype(np.float32), np.int64(7)),
    lambda rng: (
        rng.randn(2, 2).astype(np.float32),
        rng.randint(0, 10, (5,)),
        np.float64(3.5),
    ),
])
def test_roundtrip_tuples(tmp_path, make):
    rng = np.random.RandomState(0)
    elements = [make(rng) for _ in range(5)]
    ds = Dataset.from_generator(lambda: iter(elements))
    path = str(tmp_path / "data.records")
    dataset_to_records(ds, path)
    restored = list(records_to_dataset(path))
    assert len(restored) == 5
    for orig, rest in zip(elements, restored):
        _assert_elements_equal(orig, rest)


def test_roundtrip_strings(tmp_path):
    elements = [("hello", np.int32(1)), ("world", np.int32(2))]
    ds = Dataset.from_generator(lambda: iter(elements))
    path = str(tmp_path / "s.records")
    dataset_to_records(ds, path)
    restored = list(records_to_dataset(path))
    assert restored[0][0] == "hello" and int(restored[1][1]) == 2


def test_variable_shapes_with_set_dimension(tmp_path):
    rng = np.random.RandomState(0)
    elements = [rng.randn(i + 2, 3).astype(np.float32) for i in range(4)]
    ds = Dataset.from_generator(lambda: iter(elements))
    path = str(tmp_path / "var.records")
    dataset_to_records(ds, path)

    # full set_shape fails on the second element (different shape)
    with pytest.raises(ValueError, match="mismatch"):
        list(records_to_dataset(path, set_shape=True))

    # rank-only spec passes
    restored = list(records_to_dataset(path, set_shape=False, set_dimension=2))
    assert len(restored) == 4
    _assert_elements_equal(elements[2], restored[2])

    # no spec at all passes
    restored = list(records_to_dataset(path, set_shape=False))
    assert len(restored) == 4


def test_rank_mismatch_raises(tmp_path):
    elements = [np.zeros((2, 2), np.float32), np.zeros((2, 2, 2), np.float32)]
    ds = Dataset.from_generator(lambda: iter(elements))
    path = str(tmp_path / "rank.records")
    dataset_to_records(ds, path)
    with pytest.raises(ValueError, match="Rank mismatch"):
        list(records_to_dataset(path, set_shape=False, set_dimension=2))


def test_element_spec_modes():
    el = (np.zeros((3, 4), np.float32), np.int64(1))
    assert element_spec(el, set_shape=True) == (((3, 4), "<f4"), ((), "<i8"))
    spec = element_spec(el, set_shape=False, set_dimension=2)
    assert spec[0] == ((None, None), "<f4")
    spec = element_spec(el, set_shape=False)
    assert spec[0][0] is None
    check_spec(el, element_spec(el, set_shape=True))


def test_empty_record_file_raises(tmp_path):
    path = str(tmp_path / "empty.records")
    open(path, "wb").close()
    with pytest.raises(ValueError, match="empty"):
        records_to_dataset(path)


def test_save_load_dataset_single_shard(tmp_path):
    rng = np.random.RandomState(0)
    elements = [
        (rng.randint(0, 255, (4, 4, 3), dtype=np.uint8), np.int64(i))
        for i in range(7)
    ]
    ds = Dataset.from_generator(lambda: iter(elements))
    path = str(tmp_path / "snapshot")
    save_dataset(ds, path)
    restored = list(load_dataset(path))
    assert len(restored) == 7
    for orig, rest in zip(elements, restored):
        _assert_elements_equal(orig, rest)


def test_save_load_dataset_multi_shard_preserves_order(tmp_path):
    elements = [(np.full((2, 2), i, np.int32), np.int64(i)) for i in range(10)]
    ds = Dataset.from_generator(lambda: iter(elements))
    path = str(tmp_path / "sharded")
    save_dataset(ds, path, n_files=3)
    import os

    shards = [f for f in os.listdir(path) if f.endswith(".records")]
    assert len(shards) == 3
    restored = list(load_dataset(path))
    assert [int(y) for _, y in restored] == list(range(10))


def test_load_dataset_element_spec(tmp_path):
    elements = [(np.zeros((2, 3), np.float32), np.int64(0))]
    ds = Dataset.from_generator(lambda: iter(elements))
    path = str(tmp_path / "spec")
    save_dataset(ds, path)
    restored = load_dataset(path)
    assert restored.element_spec == (((2, 3), "<f4"), ((), "<i8"))

"""TFRecord / tf.train.Example interop (reference chambers/data/tf_record.py).

The self round-trip always runs; the byte-level interop gates run against
real TensorFlow when it is installed (it is on the dev host) — files written
by chambers_tpu must load through the reference's exact deserialize recipe,
and files written by the reference's exact serialize recipe must load here.
"""

import numpy as np
import pytest

from chambers_tpu.data import Dataset
from chambers_tpu.data.tfrecord import (
    dataset_to_tfrecord,
    make_dataset_deserialize_fn,
    proto_to_tensor,
    read_tfrecord,
    serialize_to_example,
    tensor_to_proto,
    tfrecord_to_dataset,
    write_tfrecord,
)


def _elements():
    rng = np.random.RandomState(1)
    return [
        (rng.randn(4, 3).astype(np.float32),
         np.asarray(rng.randint(0, 9, (4,)), np.int64),
         np.float64(1.25))
        for _ in range(3)
    ]


def test_tensor_proto_round_trip_dtypes():
    rng = np.random.RandomState(0)
    cases = [
        rng.randn(3, 4).astype(np.float32),
        rng.randn(2, 2, 2).astype(np.float16),
        np.float64(2.5),                      # scalar
        np.arange(5, dtype=np.uint8),
        np.arange(-4, 4, dtype=np.int32).reshape(2, 4),
        np.asarray([-(2 ** 62), 2 ** 62], np.int64),
        np.array([True, False, True]),
        np.array([b"ab", b"cde"], dtype=object),
    ]
    for v in cases:
        r = proto_to_tensor(tensor_to_proto(v))
        np.testing.assert_array_equal(np.asarray(v), r)
        if np.asarray(v).dtype.kind not in "SUO":
            assert r.dtype == np.asarray(v).dtype


def test_tfrecord_self_round_trip(tmp_path):
    els = _elements()
    path = str(tmp_path / "own.tfrecord")
    n = dataset_to_tfrecord(Dataset.from_generator(lambda: iter(els)), path)
    assert n == len(els)
    back = list(tfrecord_to_dataset(path))
    assert len(back) == len(els)
    for want, got in zip(els, back):
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w), g)
            assert np.asarray(w).dtype == g.dtype


def test_tfrecord_crc_rejects_corruption(tmp_path):
    path = str(tmp_path / "c.tfrecord")
    write_tfrecord(path, [b"payload-bytes"])
    raw = bytearray(open(path, "rb").read())
    raw[14] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="CRC"):
        list(read_tfrecord(path))


def test_single_tensor_elements_unwrap(tmp_path):
    els = [np.arange(4, dtype=np.int32), np.arange(4, 8, dtype=np.int32)]
    path = str(tmp_path / "one.tfrecord")
    dataset_to_tfrecord(Dataset.from_tensor_slices(np.stack(els)), path)
    back = list(tfrecord_to_dataset(path))
    # one tensor per example deserializes unwrapped (tf_record.py:113-116)
    assert isinstance(back[0], np.ndarray)
    np.testing.assert_array_equal(back[0], els[0])


def test_interop_with_real_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")
    els = _elements() + [
        (np.array([b"hello", b"tpu"], dtype=object).reshape(2),
         np.asarray(0, np.int64), np.float64(0.0)),
    ]

    # ours -> TF via the reference's tfrecord_to_dataset recipe
    ours = str(tmp_path / "ours.tfrecord")
    dataset_to_tfrecord(Dataset.from_generator(lambda: iter(els)), ours)
    for want, rec in zip(els, tf.data.TFRecordDataset(ours)):
        ex = tf.train.Example.FromString(rec.numpy())
        f = ex.features.feature
        for i, w in enumerate(want):
            dtype = tf.as_dtype(int(f[f"t{i}_dtype"].int64_list.value[0]))
            got = tf.io.parse_tensor(
                f[f"t{i}_raw"].bytes_list.value[0], out_type=dtype).numpy()
            np.testing.assert_array_equal(np.asarray(w), got)

    # TF (the reference's exact serialize recipe) -> ours
    def tf_serialize(*args):
        feature = {}
        for i, t in enumerate(args):
            t = tf.constant(t)
            feature[f"t{i}_raw"] = tf.train.Feature(
                bytes_list=tf.train.BytesList(
                    value=[tf.io.serialize_tensor(t).numpy()]))
            feature[f"t{i}_dtype"] = tf.train.Feature(
                int64_list=tf.train.Int64List(
                    value=[t.dtype.as_datatype_enum]))
            feature[f"t{i}_shape"] = tf.train.Feature(
                int64_list=tf.train.Int64List(value=t.shape.as_list()))
        return tf.train.Example(
            features=tf.train.Features(feature=feature)).SerializeToString()

    theirs = str(tmp_path / "theirs.tfrecord")
    with tf.io.TFRecordWriter(theirs) as w:
        for el in els:
            w.write(tf_serialize(*el))
    for want, got in zip(els, tfrecord_to_dataset(theirs)):
        for w_, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w_), g)
            if np.asarray(w_).dtype.kind not in "SUO":
                assert np.asarray(w_).dtype == g.dtype


def test_native_crc32c_matches_python():
    """The native CRC kernel (data/native_crc.py: SSE4.2 or slice-by-8) is
    bit-identical to the pure-Python reference across edge lengths (0, <8,
    8-boundary, large) — it carries every TFRecord framing checksum."""
    from chambers_tpu.data import native_crc
    from chambers_tpu.data.tfrecord import _crc32c_py

    if not native_crc.available():
        pytest.skip("no C++ toolchain for the native CRC (pure-Python "
                    "fallback is in use)")
    rng = np.random.RandomState(0)
    for n in [0, 1, 3, 7, 8, 9, 15, 16, 63, 64, 255, 4096, 65537]:
        buf = rng.randint(0, 256, n, dtype=np.uint8).tobytes()
        assert native_crc.crc32c(buf) == _crc32c_py(buf), n
    # the known-answer vector: CRC32C("123456789") = 0xE3069283
    assert native_crc.crc32c(b"123456789") == 0xE3069283
    assert _crc32c_py(b"123456789") == 0xE3069283

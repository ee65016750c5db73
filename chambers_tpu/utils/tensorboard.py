"""TensorBoard event files — written and read without TensorFlow.

Parity: the reference's ``ExperimentCallback`` wires
``tf.keras.callbacks.TensorBoard`` into every experiment
(/root/reference/chambers/callbacks.py:39-46), so a reference user expects
to point TensorBoard at the experiment's ``logs/`` directory and see
scalar curves. This module speaks the actual wire format — ``Event``
protos (tensorflow/core/util/event.proto) in TFRecord framing — reusing
the hand-rolled protobuf codec and CRC32C container from
:mod:`chambers_tpu.data.tfrecord`, so the files it writes load in
TensorBoard (and in ``tf.compat.v1.train.summary_iterator``) unchanged,
and files TensorFlow wrote load here. Byte-level interop is pinned against
real TF in ``tests/test_tensorboard.py`` (skipped when TF is absent).

Supported summary kinds: scalars (``simple_value``), histograms
(``HistogramProto`` with TF's default exponential buckets or explicit
``bins``), and text (``DT_STRING`` tensor + the ``text`` plugin metadata).
"""

from __future__ import annotations

import itertools
import os
import socket
import struct
import time
from typing import Iterator, Optional, Sequence, Union

import numpy as np

from chambers_tpu.data.tfrecord import (
    _iter_fields,
    _len_delim,
    _masked_crc,
    _read_varint,
    _signed_varint,
    _tag,
    _zigzag_to_signed,
)

__all__ = ["SummaryWriter", "read_events", "default_histogram_buckets"]


# ---------------------------------------------------------------------------
# proto field helpers (writer side)
# ---------------------------------------------------------------------------

def _double(field: int, value: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", float(value))


def _float32(field: int, value: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", float(value))


def _packed_doubles(field: int, values: Sequence[float]) -> bytes:
    payload = b"".join(struct.pack("<d", float(v)) for v in values)
    return _len_delim(field, payload)


def _event_bytes(wall_time: float, step: Optional[int] = None,
                 file_version: Optional[str] = None,
                 summary: Optional[bytes] = None) -> bytes:
    # Event: 1 wall_time (double), 2 step (int64), 3 file_version (string),
    # 5 summary (Summary)
    out = _double(1, wall_time)
    if step:
        out += _tag(2, 0) + _signed_varint(int(step))
    if file_version is not None:
        out += _len_delim(3, file_version.encode("utf-8"))
    if summary is not None:
        out += _len_delim(5, summary)
    return out


def _value_common(tag: str) -> bytes:
    return _len_delim(1, tag.encode("utf-8"))  # Summary.Value.tag = 1


def _scalar_summary(tag: str, value: float) -> bytes:
    # Summary.value (repeated, field 1) of Value{tag=1, simple_value=2}
    return _len_delim(1, _value_common(tag) + _float32(2, value))


def _histo_summary(tag: str, histo: bytes) -> bytes:
    return _len_delim(1, _value_common(tag) + _len_delim(5, histo))


def _text_summary(tag: str, text: str) -> bytes:
    # Value{tag, tensor=8 (DT_STRING), metadata=9 {plugin_data{name:"text"},
    # data_class: DATA_CLASS_TENSOR}} — what TB's text plugin reads.
    from chambers_tpu.data.tfrecord import tensor_to_proto

    tensor = tensor_to_proto(text)
    plugin = _len_delim(1, "text".encode("utf-8"))  # PluginData.plugin_name
    metadata = _len_delim(1, plugin) + _tag(4, 0) + b"\x02"  # data_class=2
    return _len_delim(
        1, _value_common(tag) + _len_delim(8, tensor) + _len_delim(9, metadata)
    )


def default_histogram_buckets() -> np.ndarray:
    """TF's default histogram bucket limits: ±1e-12·1.1^k exponential edges
    (tensorflow/core/lib/histogram/histogram.cc) — what
    ``tf.summary.histogram`` v1 used. Returned as ascending edge values."""
    pos = []
    v = 1e-12
    while v < 1e20:
        pos.append(v)
        v *= 1.1
    return np.asarray([-x for x in reversed(pos)] + [0.0] + pos
                      + [np.finfo(np.float64).max])


def _histogram_proto(values: np.ndarray,
                     bins: Optional[Union[int, Sequence[float]]] = None
                     ) -> bytes:
    """HistogramProto: 1 min, 2 max, 3 num, 4 sum, 5 sum_squares (doubles),
    6 bucket_limit (packed doubles, upper edges), 7 bucket (packed counts).
    """
    values = np.asarray(values, np.float64).ravel()
    if values.size == 0:
        raise ValueError("cannot histogram an empty array")
    if bins is None:
        edges = default_histogram_buckets()
        # TB convention: bucket i counts values in (edge[i-1], edge[i]];
        # drop the leading/trailing all-zero buckets to keep records small
        counts, _ = np.histogram(values, np.concatenate(([-np.inf], edges)))
        nz = np.flatnonzero(counts)
        lo, hi = (int(nz[0]), int(nz[-1]) + 1) if nz.size else (0, 1)
        limits, counts = edges[lo:hi], counts[lo:hi]
    elif isinstance(bins, int):
        counts, edges = np.histogram(values, bins=bins)
        limits = edges[1:]
    else:
        edges = np.asarray(bins, np.float64)
        counts, _ = np.histogram(values, bins=edges)
        limits = edges[1:]
    out = (_double(1, values.min()) + _double(2, values.max())
           + _double(3, values.size) + _double(4, values.sum())
           + _double(5, np.square(values).sum())
           + _packed_doubles(6, limits)
           + _packed_doubles(7, counts))
    return out


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

class SummaryWriter:
    """Append-only TensorBoard event-file writer (one file per instance).

    ``TensorBoard --logdir <log_dir>`` picks the file up live: every record
    is flushed by default (``flush_each=False`` to buffer). Usable as a
    context manager.
    """

    _uid = itertools.count()  # distinct files even within one second

    def __init__(self, log_dir: str, filename_suffix: str = "",
                 flush_each: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        host = socket.gethostname()
        name = (f"events.out.tfevents.{int(time.time())}.{host}"
                f".{os.getpid()}.{next(SummaryWriter._uid)}{filename_suffix}")
        self.path = os.path.join(log_dir, name)
        self._flush_each = flush_each
        self._file = open(self.path, "wb")
        # the version record TensorBoard requires as record 0
        self._write_record(_event_bytes(time.time(),
                                        file_version="brain.Event:2"))

    def _write_record(self, data: bytes) -> None:
        if self._file is None:
            raise ValueError("SummaryWriter is closed")
        header = struct.pack("<Q", len(data))
        self._file.write(header)
        self._file.write(struct.pack("<I", _masked_crc(header)))
        self._file.write(data)
        self._file.write(struct.pack("<I", _masked_crc(data)))
        if self._flush_each:
            self._file.flush()

    def add_scalar(self, tag: str, value, step: int,
                   wall_time: Optional[float] = None) -> None:
        self._write_record(_event_bytes(
            wall_time if wall_time is not None else time.time(), step,
            summary=_scalar_summary(tag, float(value))))

    def add_histogram(self, tag: str, values, step: int,
                      bins: Optional[Union[int, Sequence[float]]] = None,
                      wall_time: Optional[float] = None) -> None:
        """``bins=None`` uses TF's exponential buckets; an int or explicit
        edge sequence uses ``np.histogram`` semantics."""
        self._write_record(_event_bytes(
            wall_time if wall_time is not None else time.time(), step,
            summary=_histo_summary(tag, _histogram_proto(
                np.asarray(values), bins))))

    def add_text(self, tag: str, text: str, step: int,
                 wall_time: Optional[float] = None) -> None:
        self._write_record(_event_bytes(
            wall_time if wall_time is not None else time.time(), step,
            summary=_text_summary(tag, text)))

    def flush(self) -> None:
        if self._file is not None:
            self._file.flush()

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None

    def __enter__(self) -> "SummaryWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def _parse_value(buf: bytes) -> dict:
    out: dict = {}
    for field, wire, val in _iter_fields(buf):
        if field == 1:
            out["tag"] = val.decode("utf-8")
        elif field == 2:
            out["simple_value"] = struct.unpack("<f", val)[0]
        elif field == 5:
            out["histo"] = _parse_histo(val)
        elif field == 8:
            from chambers_tpu.data.tfrecord import proto_to_tensor

            out["tensor"] = proto_to_tensor(val)
    return out


def _parse_packed_doubles(val: bytes) -> np.ndarray:
    return np.frombuffer(val, "<f8")


def _parse_histo(buf: bytes) -> dict:
    names = {1: "min", 2: "max", 3: "num", 4: "sum", 5: "sum_squares"}
    out: dict = {"bucket_limit": [], "bucket": []}
    for field, wire, val in _iter_fields(buf):
        if field in names:
            out[names[field]] = struct.unpack("<d", val)[0]
        elif field == 6:
            out["bucket_limit"] = (_parse_packed_doubles(val) if wire == 2
                                   else out["bucket_limit"]
                                   + [struct.unpack("<d", val)[0]])
        elif field == 7:
            out["bucket"] = (_parse_packed_doubles(val) if wire == 2
                             else out["bucket"]
                             + [struct.unpack("<d", val)[0]])
    out["bucket_limit"] = np.asarray(out["bucket_limit"], np.float64)
    out["bucket"] = np.asarray(out["bucket"], np.float64)
    return out


def read_events(path: str) -> Iterator[dict]:
    """Yield the events of a tfevents file as dicts: ``wall_time``, ``step``,
    and one of ``file_version`` | ``values`` (a list of parsed
    ``Summary.Value`` dicts with ``tag`` + ``simple_value``/``histo``/
    ``tensor``). CRC-checked; accepts files written here or by TensorFlow."""
    from chambers_tpu.data.tfrecord import read_tfrecord

    for record in read_tfrecord(path):
        event: dict = {"wall_time": 0.0, "step": 0}
        for field, wire, val in _iter_fields(record):
            if field == 1:
                event["wall_time"] = struct.unpack("<d", val)[0]
            elif field == 2:
                event["step"] = _zigzag_to_signed(val)
            elif field == 3:
                event["file_version"] = val.decode("utf-8")
            elif field == 5:
                event.setdefault("values", []).extend(
                    _parse_value(v) for f, w, v in _iter_fields(val)
                    if f == 1)
        yield event

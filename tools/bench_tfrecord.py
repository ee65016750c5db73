"""TFRecord read-throughput benchmark: chambers_tpu vs tf.data.

Writes one shard of ``--records`` records x ``--bytes`` payload (the scale
of encoded-image records), then times:
  1. chambers_tpu full read (framing + CRC verify + Example parse -> numpy)
  2. tf.data.TFRecordDataset frame iteration (C++ framing + CRC, no parse)

The pure-Python CRC32C was 94% of (1) before data/_native/crc32c.cpp
(6 MB/s on this host); numbers of record live in BASELINE.md.

Usage: python tools/bench_tfrecord.py [--records 2000] [--bytes 20000]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--records", type=int, default=2000)
    parser.add_argument("--bytes", type=int, default=20000)
    parser.add_argument("--path", default="/tmp/chtpu_bench.tfrecord")
    args = parser.parse_args()

    from chambers_tpu.data import Dataset, native_crc
    from chambers_tpu.data.tfrecord import dataset_to_tfrecord, tfrecord_to_dataset

    rng = np.random.RandomState(0)
    payload = rng.randint(0, 256, (args.records, args.bytes), dtype=np.uint8)
    labels = np.arange(args.records, dtype=np.int64)
    dataset_to_tfrecord(Dataset.from_tensor_slices((payload, labels)),
                        args.path)
    size_mb = os.path.getsize(args.path) / 1e6
    print(f"shard: {args.records} records, {size_mb:.1f} MB; "
          f"native crc: {native_crc.available()}")

    for name, run in [
        ("chambers_tpu full read (frame+crc+parse)",
         lambda: sum(1 for _ in iter(tfrecord_to_dataset(args.path)))),
    ]:
        run()  # warm the page cache / lib
        t0 = time.perf_counter()
        n = run()
        dt = time.perf_counter() - t0
        print(f"{name}: {n / dt:.0f} rec/s, {size_mb / dt:.0f} MB/s")

    try:
        os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
        import tensorflow as tf  # noqa: F401

        def tf_frames():
            return sum(1 for _ in tf.data.TFRecordDataset(args.path))

        tf_frames()
        t0 = time.perf_counter()
        n = tf_frames()
        dt = time.perf_counter() - t0
        print(f"tf.data frame iteration (no parse): {n / dt:.0f} rec/s, "
              f"{size_mb / dt:.0f} MB/s")
    except ImportError:
        print("tensorflow not installed; skipping the tf.data row")


if __name__ == "__main__":
    main()

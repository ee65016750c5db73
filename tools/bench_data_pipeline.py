"""Host-side input-pipeline throughput: chambers_tpu.data vs tf.data.

The reference rides tf.data's C++ threadpool; this build's `Dataset` engine
is Python threads + PIL decode (the GIL releases during libjpeg work).
Measures decoded images/sec through the same P×K class-interleave pipeline
both engines expose, on synthetic ImageNet-sized JPEGs.

Run: python tools/bench_data_pipeline.py  (host-only; no TPU involved)
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLASSES = 16
IMAGES_PER_CLASS = 24
SIZE = (500, 375)
BATCH = 32
WARM_BATCHES = 4
MEASURE_BATCHES = 40


def make_dataset_dir(root):
    from PIL import Image

    rng = np.random.RandomState(0)
    dirs = []
    for c in range(N_CLASSES):
        d = os.path.join(root, f"class_{c:02d}")
        os.makedirs(d, exist_ok=True)
        for i in range(IMAGES_PER_CLASS):
            arr = rng.randint(0, 256, (SIZE[1], SIZE[0], 3), np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i:03d}.jpg"),
                                      quality=85)
        dirs.append(d)
    return dirs


def bench_chambers(dirs):
    from chambers_tpu.data import InterleaveImageClassDataset

    # AUTOTUNE default: thread pool sized to the host, or a sync stream on
    # single-core machines where a CPU-bound pool only adds overhead
    ds = InterleaveImageClassDataset(
        dirs, list(range(len(dirs))), class_cycle_length=8,
        images_per_block=4, shuffle=True, seed=42, repeats=-1,
    ).batch(BATCH).prefetch()
    it = iter(ds)
    for _ in range(WARM_BATCHES):
        next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in range(MEASURE_BATCHES):
        x, y = next(it)
        n += len(y)
    dt = time.perf_counter() - t0
    return n / dt


def bench_chambers_native_batch(dirs):
    """Same P*K interleave via the explicit decode=False route: batch file
    paths first and decode each batch straight into one [B,h,w,3] buffer
    through the native C++ thread-pool decoder (one GIL release per batch).
    The decode=True default now fuses to this same path automatically
    (data/dataset.py _DecodedImageDataset), so the two rows should match."""
    from chambers_tpu.data import InterleaveImageClassDataset
    from chambers_tpu.data.io import read_and_decode_image_batch

    ds = InterleaveImageClassDataset(
        dirs, list(range(len(dirs))), class_cycle_length=8,
        images_per_block=4, shuffle=True, seed=42, repeats=-1, decode=False,
    ).batch(BATCH).map(
        lambda f, y: (read_and_decode_image_batch(f), np.asarray(y))
    ).prefetch()
    it = iter(ds)
    for _ in range(WARM_BATCHES):
        next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in range(MEASURE_BATCHES):
        x, y = next(it)
        n += len(y)
    dt = time.perf_counter() - t0
    return n / dt


def bench_tfdata(dirs):
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    labels = list(range(len(dirs)))

    def interleave_fn(d, label):
        files = tf.io.matching_files(tf.strings.join([d, "/*.jpg"]))
        files = tf.random.shuffle(files, seed=42)
        lab = tf.fill([tf.shape(files)[0]], label)
        return tf.data.Dataset.from_tensor_slices((files, lab))

    def decode(f, label):
        img = tf.io.decode_jpeg(tf.io.read_file(f), channels=3)
        return img, label

    ds = (tf.data.Dataset.from_tensor_slices((dirs, labels))
          .shuffle(len(dirs), seed=42).repeat()
          .interleave(interleave_fn, cycle_length=8, block_length=4,
                      num_parallel_calls=tf.data.AUTOTUNE)
          .map(decode, num_parallel_calls=tf.data.AUTOTUNE)
          .padded_batch(BATCH, padded_shapes=([SIZE[1], SIZE[0], 3], []))
          .prefetch(tf.data.AUTOTUNE))
    it = iter(ds)
    for _ in range(WARM_BATCHES):
        next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in range(MEASURE_BATCHES):
        x, y = next(it)
        n += int(y.shape[0])
    dt = time.perf_counter() - t0
    return n / dt


def main():
    with tempfile.TemporaryDirectory() as root:
        print(f"writing {N_CLASSES * IMAGES_PER_CLASS} JPEGs "
              f"({SIZE[0]}x{SIZE[1]})...", flush=True)
        dirs = make_dataset_dir(root)
        ours = bench_chambers(dirs)
        print(f"chambers_tpu.data P*K interleave+decode: {ours:8.1f} img/s",
              flush=True)
        try:
            from chambers_tpu.data import native

            if native.available():
                nat = bench_chambers_native_batch(dirs)
                print(f"chambers_tpu.data batched native decode: {nat:8.1f}"
                      " img/s", flush=True)
        except Exception as e:
            print(f"native batch decode unavailable: {type(e).__name__}: {e}")
        try:
            tfd = bench_tfdata(dirs)
            print(f"tf.data same pipeline:                   {tfd:8.1f} img/s",
                  flush=True)
            print(f"ratio (ours/tf.data): {ours / tfd:.2f}x")
        except Exception as e:
            print(f"tf.data comparison unavailable: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

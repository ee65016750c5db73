"""Native (C++/libjpeg) batch decoder tests.

The shared library compiles on first use with the system toolchain; if that
fails (no g++/libjpeg), these tests skip and the pure-Python paths remain
the contract.
"""

import os

import numpy as np
import pytest
from PIL import Image

from chambers_tpu.data import native
from chambers_tpu.data.io import read_and_decode_images


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native decoder not buildable here")


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("jpegs")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        arr = rng.randint(0, 256, (40 + i, 64, 3), np.uint8)
        p = tmp / f"{i}.jpg"
        Image.fromarray(arr).save(p, quality=90)
        paths.append(str(p))
    return tmp, paths


def test_batch_decode_matches_pil_bytes(jpeg_dir):
    """Same system libjpeg as PIL → byte-identical output."""
    _, paths = jpeg_dir
    outs = native.decode_jpeg_batch(paths, num_threads=2)
    for p, o in zip(paths, outs):
        ref = np.asarray(Image.open(p).convert("RGB"), np.uint8)
        np.testing.assert_array_equal(o, ref, err_msg=p)


def test_grayscale_jpeg_expands_to_rgb(jpeg_dir):
    tmp, _ = jpeg_dir
    rng = np.random.RandomState(1)
    p = tmp / "gray.jpg"
    Image.fromarray(rng.randint(0, 256, (30, 44), np.uint8), mode="L").save(
        p, quality=90)
    out = native.decode_jpeg(str(p))
    ref = np.asarray(Image.open(p).convert("RGB"), np.uint8)
    np.testing.assert_array_equal(out, ref)


def test_missing_and_invalid_files_raise(jpeg_dir):
    tmp, paths = jpeg_dir
    with pytest.raises(RuntimeError, match="header"):
        native.decode_jpeg_batch([str(tmp / "nope.jpg")])
    bad = tmp / "not_a_jpeg.jpg"
    with open(bad, "wb") as f:
        f.write(b"\x00" * 512)  # no JPEG structure at all
    with pytest.raises(RuntimeError, match="header"):
        native.decode_jpeg_batch([str(bad)])
    # NOTE: a truncated-but-header-intact JPEG decodes leniently (libjpeg
    # pads missing scanlines and warns), matching cv2; PIL would raise.
    trunc = tmp / "truncated.jpg"
    with open(paths[0], "rb") as f:
        data = f.read()
    with open(trunc, "wb") as f:
        f.write(data[: len(data) // 4])
    out = native.decode_jpeg(str(trunc))
    assert out.shape == (40, 64, 3)


def test_read_and_decode_images_fallback_mixed(jpeg_dir):
    """The batch helper handles non-JPEG members via per-element fallback."""
    tmp, paths = jpeg_dir
    rng = np.random.RandomState(2)
    png_arr = rng.randint(0, 256, (20, 30, 3), np.uint8)
    png = tmp / "img.png"
    Image.fromarray(png_arr).save(png, format="PNG")
    outs = read_and_decode_images([paths[0], str(png)])
    assert outs[0].shape == (40, 64, 3)
    np.testing.assert_array_equal(outs[1], png_arr)  # lossless


def test_read_and_decode_images_pure_jpeg_uses_native(jpeg_dir):
    _, paths = jpeg_dir
    outs = read_and_decode_images(paths)
    refs = native.decode_jpeg_batch(paths)
    for o, r in zip(outs, refs):
        np.testing.assert_array_equal(o, r)


def test_stacked_batch_decode_identical(jpeg_dir):
    """stack=True decodes into one [n,h,w,3] buffer, byte-identical to the
    per-image arrays (uniform-dims batch)."""
    tmp, _ = jpeg_dir
    rng = np.random.RandomState(3)
    paths = []
    for i in range(4):
        p = tmp / f"uniform_{i}.jpg"
        Image.fromarray(rng.randint(0, 256, (32, 48, 3), np.uint8)).save(
            p, quality=90)
        paths.append(str(p))
    outs = native.decode_jpeg_batch(paths)
    stacked = native.decode_jpeg_batch(paths, stack=True)
    assert isinstance(stacked, np.ndarray)
    assert stacked.shape == (4, 32, 48, 3)
    np.testing.assert_array_equal(stacked, np.stack(outs))


def test_stacked_batch_decode_ragged_raises(jpeg_dir):
    _, paths = jpeg_dir  # heights 40..45 — ragged by construction
    with pytest.raises(ValueError, match="uniform"):
        native.decode_jpeg_batch(paths, stack=True)


def test_stacked_batch_decode_empty_raises():
    """stack=True promises [n,h,w,3]; with zero paths the dims are
    unknowable, so the contract is a ValueError (stack=False returns [])."""
    with pytest.raises(ValueError, match="at least one path"):
        native.decode_jpeg_batch([], stack=True)
    assert native.decode_jpeg_batch([]) == []


def test_dims_cache_stale_entry_retries(jpeg_dir):
    """A wrong cached dimension entry is detected by the decoder (-3) and
    recovered by one re-probe + retry, not a corrupted output."""
    _, paths = jpeg_dir
    native.decode_jpeg_batch([paths[0]])  # populate the cache
    key = os.fsencode(paths[0])
    stamp, h, w = native._DIMS_CACHE[key]
    native._DIMS_CACHE[key] = (stamp, h + 8, w + 8)  # poison it
    out = native.decode_jpeg_batch([paths[0]])[0]
    ref = np.asarray(Image.open(paths[0]).convert("RGB"), np.uint8)
    np.testing.assert_array_equal(out, ref)
    assert native._DIMS_CACHE[key][1:] == (h, w)  # re-probed


def test_ifast_dct_is_close_not_identical(jpeg_dir):
    """dct_method='ifast' (tf.io.decode_jpeg's default) stays within a few
    LSB of the islow/PIL-parity default."""
    _, paths = jpeg_dir
    islow = native.decode_jpeg_batch(paths)
    ifast = native.decode_jpeg_batch(paths, dct_method="ifast")
    for a, b in zip(islow, ifast):
        assert a.shape == b.shape
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 16
    with pytest.raises(ValueError, match="dct_method"):
        native.decode_jpeg_batch(paths, dct_method="fastest")


# ---------------------------------------------------------------------------
# Concurrency stress (round-5 verdict #5). The pool is the only
# multi-threaded native code in the repo and this host is single-core, so
# thread interleavings must be forced explicitly: many pool threads per
# call, many Python caller threads per pool, repeated runs, and cache
# invalidations racing the decodes. Every output must stay byte-identical
# to PIL. Mirrors the threading contract of tf.data's decode
# (reference chambers/data/dataset.py:255-260).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def uniform_corpus(tmp_path_factory):
    """32 uniform-dim JPEGs + their PIL-decoded ground truth batch."""
    tmp = tmp_path_factory.mktemp("stress_jpegs")
    rng = np.random.RandomState(7)
    paths = []
    for i in range(32):
        arr = rng.randint(0, 256, (48, 64, 3), np.uint8)
        p = tmp / f"s{i:02d}.jpg"
        Image.fromarray(arr).save(p, quality=85)
        paths.append(str(p))
    ref = np.stack([np.asarray(Image.open(p).convert("RGB"), np.uint8)
                    for p in paths])
    return paths, ref


def test_stress_pool_threads_byte_identical(uniform_corpus):
    """16 pool threads racing into ONE stacked [n,h,w,3] buffer, 20 runs:
    every run byte-identical — adjacent rows written by different threads
    must never bleed."""
    paths, ref = uniform_corpus
    for run in range(20):
        out = native.decode_jpeg_batch(paths, num_threads=16, stack=True)
        np.testing.assert_array_equal(out, ref, err_msg=f"run {run}")


def test_stress_concurrent_python_callers(uniform_corpus):
    """8 Python caller threads × 6 iterations, each driving its own
    8-thread native pool over a shuffled view of the corpus (mixed
    stack=True/False), while a 9th thread repeatedly clears the dims cache
    mid-flight. All outputs byte-identical; no exception escapes."""
    import threading

    paths, ref = uniform_corpus
    errors = []
    stop = threading.Event()

    def invalidator():
        while not stop.is_set():
            native.clear_dims_cache()

    def caller(seed):
        rng = np.random.RandomState(seed)
        try:
            for it in range(6):
                idx = rng.permutation(len(paths))
                sub = [paths[i] for i in idx]
                if it % 2 == 0:
                    out = native.decode_jpeg_batch(sub, num_threads=8,
                                                   stack=True)
                    np.testing.assert_array_equal(out, ref[idx])
                else:
                    outs = native.decode_jpeg_batch(sub, num_threads=8)
                    for j, o in enumerate(outs):
                        np.testing.assert_array_equal(o, ref[idx[j]])
        except Exception as exc:  # noqa: BLE001 — collected for the assert
            errors.append((seed, repr(exc)))

    inv = threading.Thread(target=invalidator, daemon=True)
    inv.start()
    threads = [threading.Thread(target=caller, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    stop.set()
    inv.join(timeout=10)
    assert not any(t.is_alive() for t in threads), "caller thread hung"
    assert errors == []


def test_stress_rewrite_dims_between_rounds(uniform_corpus, tmp_path):
    """Files rewritten with DIFFERENT dims between threaded rounds: the
    stat-validated dims cache must never hand a stale geometry to the pool
    (and the -3 stale-retry path must stay correct under 16 threads)."""
    rng = np.random.RandomState(11)
    paths = []
    for i in range(8):
        p = tmp_path / f"m{i}.jpg"
        Image.fromarray(rng.randint(0, 256, (40, 56, 3), np.uint8)).save(
            p, quality=85)
        paths.append(str(p))
    for round_ in range(4):
        out = native.decode_jpeg_batch(paths, num_threads=16, stack=True)
        for i, p in enumerate(paths):
            np.testing.assert_array_equal(
                out[i], np.asarray(Image.open(p).convert("RGB"), np.uint8),
                err_msg=f"round {round_} file {i}")
        # rewrite every file with new contents and a new geometry
        h, w = 40 + 8 * (round_ + 1), 56 + 8 * (round_ + 1)
        for p in paths:
            Image.fromarray(
                rng.randint(0, 256, (h, w, 3), np.uint8)).save(p, quality=85)

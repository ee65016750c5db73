"""ctypes loader for the native batch JPEG decoder (``_native/fastjpeg.cpp``).

The reference's decode rides tf.data's C++ runtime; this module is the
TPU-native build's native IO component. The shared library is compiled
on first use with the system toolchain (``g++ -O3 -shared -fPIC ...
-ljpeg``) into a per-user cache, then loaded via ctypes — the image ships
no pybind11, so the C ABI + ctypes is the binding layer.

Public surface:

- :func:`available` — whether the native decoder could be built/loaded.
- :func:`decode_jpeg` — one file → uint8 ``[h, w, 3]`` RGB array.
- :func:`decode_jpeg_batch` — N files decoded by a C thread pool (the GIL
  is released for the whole batch; Python threads never see per-element
  work). Linked against the same system libjpeg-turbo as PIL, so output is
  byte-identical to the PIL path (pinned by tests) — unlike cv2, which
  bundles its own codec build.

This is an explicit opt-in fast path (``Dataset.batch(...).map(decode)``
style); the default per-element decoder in ``chambers_tpu.data.io`` is
unchanged.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native",
                    "fastjpeg.cpp")
_LOCK = threading.Lock()
_LIB = None
_LOAD_FAILED = False


def _cache_dir() -> str:
    root = os.environ.get("CHAMBERS_TPU_CACHE",
                          os.path.join(os.path.expanduser("~"),
                                       ".chambers_tpu"))
    path = os.path.join(root, "native")
    os.makedirs(path, exist_ok=True)
    return path


def _build_and_load():
    """Compile (if stale) and dlopen the shared library; None on failure."""
    so_path = os.path.join(_cache_dir(), "libfastjpeg.so")
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                   "-o", so_path + ".tmp", "-ljpeg", "-lpthread"]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(so_path + ".tmp", so_path)
        lib = ctypes.CDLL(so_path)
    except (OSError, subprocess.SubprocessError):
        return None

    lib.cj_jpeg_dims.restype = ctypes.c_int
    lib.cj_jpeg_dims.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
    lib.cj_decode_into.restype = ctypes.c_int
    lib.cj_decode_into.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                   ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.cj_decode_batch.restype = ctypes.c_int
    lib.cj_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    return lib


def _get_lib():
    global _LIB, _LOAD_FAILED
    if _LIB is None and not _LOAD_FAILED:
        with _LOCK:
            if _LIB is None and not _LOAD_FAILED:
                _LIB = _build_and_load()
                _LOAD_FAILED = _LIB is None
    return _LIB


def available() -> bool:
    return _get_lib() is not None


def _default_threads() -> int:
    from chambers_tpu.utils.generic import effective_cpu_count

    return min(effective_cpu_count(), 32)


def decode_jpeg(path) -> np.ndarray:
    """Decode one JPEG to an RGB uint8 ``[h, w, 3]`` array (native)."""
    return decode_jpeg_batch([path])[0]


# path -> (mtime_ns, size, h, w). Probing dimensions costs a full file read
# + header parse per image (~8% of the decode); in a repeats=-1 training
# pipeline the same files are re-decoded every epoch, so a stat-validated
# cache turns the probe into one syscall from epoch 2 on. A stale entry
# (file rewritten within a timestamp tick with different dims) is caught by
# the decoder itself: cj_decode_into re-checks dims and returns -3, which
# triggers a re-probe + one retry below.
_DIMS_CACHE: dict = {}
_DIMS_CACHE_MAX = 1 << 20


def clear_dims_cache():
    _DIMS_CACHE.clear()


def _fast_dct(dct_method: Optional[str]) -> int:
    if dct_method is None:
        dct_method = os.environ.get("CHAMBERS_JPEG_DCT", "islow")
    if dct_method not in ("islow", "ifast"):
        raise ValueError(f"dct_method must be 'islow' or 'ifast', "
                         f"got {dct_method!r}")
    return int(dct_method == "ifast")


def _probe_dims(lib, encoded_path, display_path):
    try:
        st = os.stat(encoded_path)
        stamp = (st.st_mtime_ns, st.st_size)
    except OSError:
        stamp = None
    if stamp is not None:
        hit = _DIMS_CACHE.get(encoded_path)
        if hit is not None and hit[0] == stamp:
            return hit[1], hit[2]
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.cj_jpeg_dims(encoded_path, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise RuntimeError(
            f"cannot read JPEG header of {display_path!r} (code {rc})")
    if stamp is not None:
        if len(_DIMS_CACHE) >= _DIMS_CACHE_MAX:
            _DIMS_CACHE.clear()
        _DIMS_CACHE[encoded_path] = (stamp, h.value, w.value)
    return h.value, w.value


def decode_jpeg_batch(paths: Sequence, num_threads: Optional[int] = None,
                      stack: bool = False,
                      dct_method: Optional[str] = None,
                      _retry: bool = True):
    """Decode JPEG files with the native thread pool.

    :param stack: with uniform image dimensions, decode straight into ONE
        ``[n, h, w, 3]`` batch buffer and return it — no per-image arrays,
        no ``np.stack`` copy afterwards. Raises ValueError if dims differ.
    :param dct_method: ``"islow"`` (default; byte-identical to the PIL
        path) or ``"ifast"`` (libjpeg's fast integer DCT — what
        ``tf.io.decode_jpeg`` defaults to, ~10% faster, ±few LSB pixel
        differences). Default overridable via ``CHAMBERS_JPEG_DCT``.
    :raises RuntimeError: if the native library is unavailable or any file
        fails to decode (fall back to ``io.read_and_decode_image`` for
        non-JPEG inputs).
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(
            "native JPEG decoder unavailable (no g++/libjpeg at build "
            "time?) — use chambers_tpu.data.io.read_and_decode_image"
        )
    fast_dct = _fast_dct(dct_method)
    n = len(paths)
    if n == 0:
        if stack:
            raise ValueError(
                "decode_jpeg_batch(stack=True) needs at least one path: the "
                "batch dims [n, h, w, 3] are unknowable for an empty list"
            )
        return []
    encoded = [os.fsencode(os.fspath(p)) for p in paths]
    c_paths = (ctypes.c_char_p * n)(*encoded)
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    for i, p in enumerate(encoded):
        hs[i], ws[i] = _probe_dims(lib, p, paths[i])

    if stack:
        h0, w0 = hs[0], ws[0]
        for i in range(n):
            if hs[i] != h0 or ws[i] != w0:
                raise ValueError(
                    f"stack=True requires uniform dimensions; "
                    f"{os.fspath(paths[i])!r} is {hs[i]}x{ws[i]}, "
                    f"expected {h0}x{w0}")
        batch = np.empty((n, h0, w0, 3), np.uint8)
        stride = h0 * w0 * 3
        base = batch.ctypes.data
        outs = (ctypes.c_void_p * n)(*[base + i * stride for i in range(n)])
        arrays = batch
    else:
        arrays = [np.empty((hs[i], ws[i], 3), np.uint8) for i in range(n)]
        outs = (ctypes.c_void_p * n)(*[arr.ctypes.data for arr in arrays])
    results = (ctypes.c_int * n)()
    failures = lib.cj_decode_batch(
        c_paths, outs, hs, ws, results, n,
        num_threads if num_threads else _default_threads(), fast_dct,
    )
    if failures:
        stale = [i for i in range(n) if results[i] == -3]
        if stale and _retry:
            # file mutated under the dims cache — drop and re-probe once
            for i in stale:
                _DIMS_CACHE.pop(encoded[i], None)
            return decode_jpeg_batch(paths, num_threads=num_threads,
                                     stack=stack, dct_method=dct_method,
                                     _retry=False)
        bad = [(os.fspath(paths[i]), results[i]) for i in range(n)
               if results[i] != 0]
        raise RuntimeError(f"native JPEG decode failed for {bad}")
    return arrays

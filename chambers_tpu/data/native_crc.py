"""ctypes loader for the native CRC32C (``_native/crc32c.cpp``).

TFRecord framing checksums (tfrecord.py) are verified on every read; the
pure-Python table loop runs ~25 MB/s, which made record reading ~30x
slower than tf.data's C++ runtime (profiled: 94% of read time on 20 KB
records). The native kernel uses the SSE4.2 ``crc32`` instruction where
the CPU has it, slice-by-8 tables otherwise. Same compile-on-first-use +
ctypes pattern as :mod:`chambers_tpu.data.native`; pure Python remains the
fallback when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native",
                    "crc32c.cpp")
_LOCK = threading.Lock()
_LIB = None
_LOAD_FAILED = False


def _build_and_load():
    from chambers_tpu.data.native import _cache_dir

    so_path = os.path.join(_cache_dir(), "libchtpucrc.so")
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                   "-o", so_path + ".tmp"]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(so_path + ".tmp", so_path)
        lib = ctypes.CDLL(so_path)
    except (OSError, subprocess.SubprocessError):
        return None
    lib.chtpu_crc32c.restype = ctypes.c_uint32
    lib.chtpu_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
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


def crc32c(data: bytes) -> int:
    """Finalized CRC32C of ``data`` (init 0xFFFFFFFF, final xor) — the
    value tfrecord.py's ``_crc32c`` computes. ctypes releases the GIL for
    the call."""
    return int(_get_lib().chtpu_crc32c(data, len(data)))

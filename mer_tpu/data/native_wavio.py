"""ctypes binding for the native batch WAV decoder (native/wavio.cc).

Thread-pooled C++ decode of a whole batch straight into a preallocated
[n, max_samples] float32 buffer — the host-side IO hot path feeding the
device pipeline.  Auto-builds with make on first use when a toolchain is
available; falls back to the stdlib reader (data/audio_io.py) otherwise.
Set MER_TPU_NATIVE=0 to force the Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libwavio.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("MER_TPU_NATIVE") == "0":
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"], check=True, capture_output=True, timeout=120
                )
            except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.decode_wav_batch.restype = ctypes.c_int
        lib.decode_wav_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_wav_batch(
    paths: list[str],
    max_samples: int,
    expect_rate: int = 0,
    n_threads: int = 0,
    out: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode PCM wavs into a fixed [n, max_samples] float32 buffer.

    Returns (buffer, lengths); lengths[i] < 0 encodes a per-file error
    (-1 open, -2 format, -3 sample-rate mismatch when expect_rate > 0).
    Raises RuntimeError if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native wavio unavailable (build failed or disabled)")

    n = len(paths)
    if out is None:
        out = np.empty((n, max_samples), dtype=np.float32)
    assert out.shape == (n, max_samples) and out.dtype == np.float32 and out.flags.c_contiguous
    lengths = np.empty((n,), dtype=np.int32)

    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.decode_wav_batch(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_samples,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        expect_rate, n_threads,
    )
    return out, lengths

"""ctypes bindings for the native runtime (pmfm_native.cpp).

Builds lazily with g++ on first use (cached as ``libpmfm_native.so`` next to
this file). Every consumer has a pure-Python fallback, so a missing compiler
never breaks the framework; set ``PMFM_NATIVE=0`` to force the fallbacks.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "pmfm_native.cpp")
_LIB_PATH = os.path.join(_HERE, "libpmfm_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the shared library. Returns True on success."""
    if os.path.exists(_LIB_PATH) and not force:
        if not os.path.exists(_SRC):
            return True  # prebuilt library shipped without sources
        if os.path.getmtime(_SRC) <= os.path.getmtime(_LIB_PATH):
            return True
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("PMFM_NATIVE", "1") == "0":
            return None
        if not os.path.exists(_LIB_PATH) and not build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.pmfm_monotonic_ms.restype = ctypes.c_double
        lib.pmfm_wav_read.restype = ctypes.c_int
        lib.pmfm_wav_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pmfm_wav_write.restype = ctypes.c_int
        lib.pmfm_wav_write.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.pmfm_free.argtypes = [ctypes.c_void_p]
        lib.pmfm_csv_open.restype = ctypes.c_void_p
        lib.pmfm_csv_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.pmfm_csv_add_record.restype = ctypes.c_int
        lib.pmfm_csv_add_record.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.pmfm_csv_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def monotonic_ms() -> float:
    lib = _load()
    if lib is None:
        import time

        return time.perf_counter() * 1e3
    return lib.pmfm_monotonic_ms()


def read_wav(path: str):
    """Returns (mono float32 array, sample_rate) or None to fall back."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.pmfm_wav_read(path.encode(), ctypes.byref(out), ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        if rc in (1, 2, 3):  # unreadable/not-wav: surface as error
            raise ValueError(f"{path}: not a readable WAV file (native rc={rc})")
        return None  # unsupported encoding: let python codec try
    try:
        arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.pmfm_free(out)
    return arr, int(sr.value)


def write_wav(path: str, audio: np.ndarray, sample_rate: int, bit_depth: int) -> bool:
    lib = _load()
    if lib is None:
        return False
    audio = np.ascontiguousarray(audio, np.float32)
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    rc = lib.pmfm_wav_write(
        path.encode(),
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        audio.size,
        sample_rate,
        bit_depth,
    )
    return rc == 0


class NativeCSVLogger:
    def __init__(self, path: str, field_names):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        self._lib = lib
        self._h = lib.pmfm_csv_open(path.encode(), ",".join(field_names).encode())
        if not self._h:
            raise RuntimeError(f"cannot open {path}")

    def add_record(self, row):
        self._lib.pmfm_csv_add_record(self._h, ",".join(row).encode())

    def close(self):
        if self._h:
            self._lib.pmfm_csv_close(self._h)
            self._h = None

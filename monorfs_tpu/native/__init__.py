"""ctypes bindings for the native IO runtime (native/rfsio.cpp).

Loads librfsio.so, building it on demand with the in-tree Makefile; every
entry point has a pure-Python fallback so the package works without a
toolchain (at reduced speed). The reference keeps the analogous code in
standalone C++ tools (video2oni) bound via P/Invoke."""

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "librfsio.so"
_lib = None
_build_attempted = False


def _load():
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.png_info.restype = ctypes.c_int
    lib.png_info.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.png_decode.restype = ctypes.c_int
    lib.png_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint16),
    ]
    lib.parse_doubles.restype = ctypes.c_size_t
    lib.parse_doubles.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_double), ctypes.c_size_t,
    ]
    _lib = lib
    return lib


def available():
    return _load() is not None


def decode_png(data: bytes):
    """Decode a PNG byte string to a numpy array (native path), or None if
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    c = ctypes.c_uint32()
    b = ctypes.c_uint32()
    rc = lib.png_info(data, len(data), ctypes.byref(w), ctypes.byref(h),
                      ctypes.byref(c), ctypes.byref(b))
    if rc != 0:
        raise ValueError(f"png_info failed: {rc}")
    out = np.empty((h.value, w.value * c.value), np.uint16)
    rc = lib.png_decode(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
    )
    if rc != 0:
        raise ValueError(f"png_decode failed: {rc}")
    arr = out.reshape(h.value, w.value, c.value).squeeze()
    if b.value == 8:
        return arr.astype(np.uint8)
    return arr


def parse_doubles(text: str, max_out=1 << 20):
    """Fast whitespace-separated double parsing, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    raw = text.encode()
    out = np.empty(max_out, np.float64)
    n = lib.parse_doubles(
        raw, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_out,
    )
    return out[:n].copy()

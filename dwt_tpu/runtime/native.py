"""Build + ctypes bindings for the native (C++) runtime components.

The shared library is compiled on demand (and cached) from the package's
``dwt_tpu/native/`` sources (shipped as package data, so installed wheels
build it too); no external build system or pybind11 required — plain g++ +
ctypes, per the framework's zero-dependency policy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native"
_LIB = None


def _build_lib() -> Path:
    cache = Path(os.environ.get("DWT_NATIVE_CACHE", tempfile.gettempdir())) / "dwt_native"
    cache.mkdir(parents=True, exist_ok=True)
    sources = sorted(_SRC.glob("*.cpp"))
    out = cache / "libdwt_native.so"
    newest = max(s.stat().st_mtime for s in sources)
    if not out.exists() or out.stat().st_mtime < newest:
        tmp = out.with_suffix(".so.tmp")
        cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
               *map(str, sources), "-o", str(tmp)]
        subprocess.run(cmd, check=True, capture_output=True)
        tmp.replace(out)
    return out


def get_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(str(_build_lib()))
        lib.dwt_entropy_decode.restype = ctypes.c_int
        lib.dwt_entropy_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.POINTER(ctypes.c_int32),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.dwt_entropy_decode_batch.restype = ctypes.c_int
        lib.dwt_entropy_decode_batch.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
        lib.dwt_zero_i32.restype = None
        lib.dwt_zero_i32.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int,
        ]
        _LIB = lib
    return _LIB


def _zeroed_i32(shape) -> np.ndarray:
    """np.zeros equivalent with the pages faulted in + zeroed by all cores
    up front (native dwt_zero_i32) instead of lazily inside the parse."""
    out = np.empty(shape, np.int32)
    get_lib().dwt_zero_i32(out.reshape(-1), out.size, 0)
    return out


def entropy_decode(stream: bytes, channels: int, levels: int, levels_max: int,
                   pixels) -> tuple:
    """Run the native bit parser.

    Returns (coeffs (C, total) int32 signed, missing (C, 16), level, planes).
    Raises ValueError on hard error (unreadable root/planes — the reference
    exits with no output there).
    """
    lib = get_lib()
    total = int(pixels[levels])
    out = _zeroed_i32((channels, total))
    missing = np.zeros((channels, 16), np.int32)
    planes = np.zeros(channels, np.int32)
    level = ctypes.c_int32(-1)
    pix = (ctypes.c_int64 * (levels + 1))(*[int(p) for p in pixels[: levels + 1]])
    rc = lib.dwt_entropy_decode(
        stream, len(stream), channels, levels, levels_max, pix,
        out, missing, ctypes.byref(level), planes)
    if rc != 0:
        raise ValueError("stream too short for root band")
    return out, missing, int(level.value), planes


def entropy_decode_batch(payloads: list, channels: int, levels: int,
                         levels_max: int, pixels, nthreads: int = 0) -> tuple:
    """Thread-pooled native parse of many same-geometry tile streams.

    Returns (coeffs (N, C, total), missing (N, C, 16), level (N,),
    planes (N, C), rc (N,)); rc != 0 marks hard-failed tiles.
    """
    lib = get_lib()
    n = len(payloads)
    total = int(pixels[levels])
    blob = b"".join(payloads)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(p) for p in payloads], out=offsets[1:])
    out = _zeroed_i32((n, channels, total))
    missing = np.zeros((n, channels, 16), np.int32)
    level = np.full(n, -1, np.int32)
    planes = np.zeros((n, channels), np.int32)
    rc = np.zeros(n, np.int32)
    pix = (ctypes.c_int64 * (levels + 1))(*[int(p) for p in pixels[: levels + 1]])
    lib.dwt_entropy_decode_batch(
        blob, offsets, n, channels, levels, levels_max, pix,
        out, missing, level, planes, rc, nthreads)
    return out, missing, level, planes, rc

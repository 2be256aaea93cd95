"""ctypes binding + lazy build for the native batched PNG loader.

No pybind11 in this environment; the C++ side exposes a C ABI
(rpe_png_dims / rpe_decode_batch) consumed via ctypes. The shared library is
built on first use with g++ (cached next to the source); set
RPE_NO_NATIVE_LOADER=1 to force the PIL fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "librpe_loader.so"
_SRC = _DIR / "loader.cpp"
_lib = None


def _build():
    cmd = ["g++", "-O2", "-shared", "-fPIC", str(_SRC), "-lz", "-o", str(_SO)]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("RPE_NO_NATIVE_LOADER"):
        raise RuntimeError("native loader disabled via RPE_NO_NATIVE_LOADER")
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_SO))
    lib.rpe_png_dims.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
    lib.rpe_png_dims.restype = ctypes.c_int
    lib.rpe_image_dims.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
    lib.rpe_image_dims.restype = ctypes.c_int
    lib.rpe_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ctypes.c_int,
    ]
    lib.rpe_decode_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def decode_batch(paths, to_gray: bool = True, nthreads: int = 0) -> np.ndarray:
    """Decode same-size PNGs into one array: (N, H, W) uint8 grayscale or
    (N, H, W, 3) uint8 BGR. Raises on unreadable/mismatched files."""
    lib = _load()
    paths = [str(p) for p in paths]
    n = len(paths)
    if n == 0:
        raise ValueError("empty path list")
    # PNGs and baseline JPEGs both decode natively (the phone/salah
    # datasets ship JPEG streams under .png names); rc=2 means a JPEG
    # variant the native decoder doesn't cover (e.g. progressive) — callers
    # (io/image_loader.load_image_batch) fall back to PIL on this error.
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc0 = lib.rpe_image_dims(paths[0].encode(), ctypes.byref(w),
                             ctypes.byref(h))
    if rc0 == 2:
        raise RuntimeError(
            f"unsupported JPEG variant (native loader): {paths[0]}")
    if rc0 != 0:
        raise FileNotFoundError(f"Could not read image from: {paths[0]}")
    W, H = w.value, h.value
    ch = 1 if to_gray else 3
    out = np.empty((n, H, W, ch) if ch == 3 else (n, H, W), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.rpe_decode_batch(
        arr, n, W, H,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        1 if to_gray else 0, nthreads)
    if rc != 0:
        raise FileNotFoundError(
            f"Could not read image from: {paths[rc - 1]}")
    return out

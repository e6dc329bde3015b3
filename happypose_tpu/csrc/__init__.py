"""Native (C++) components with lazy compilation + ctypes bindings.

The reference ships one pybind11 extension (cosypose_cext, RANSAC
combinatorics — replaced here by device segment ops); our native surface
accelerates the host-side IO rim instead: `fastply` decodes binary PLY
meshes ~50x faster than the Python parser. Compiled on first use with g++,
cached next to the source; every native path has a pure-Python fallback.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[Path]:
    src = _DIR / "fastply.cpp"
    lib = _DIR / "libfastply.so"
    if lib.exists() and lib.stat().st_mtime >= src.stat().st_mtime:
        return lib
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(src), "-o", str(lib)],
            check=True, capture_output=True, timeout=120,
        )
        return lib
    except Exception:
        return None


def get_fastply() -> Optional[ctypes.CDLL]:
    """The compiled library, or None (callers fall back to Python)."""
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build()
        if path is not None:
            lib = ctypes.CDLL(str(path))
            lib.fastply_parse.restype = ctypes.c_void_p
            lib.fastply_parse.argtypes = [ctypes.c_char_p]
            lib.fastply_counts.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.fastply_copy.argtypes = [
                ctypes.c_void_p,
                np.ctypeslib.ndpointer(np.float32),
                np.ctypeslib.ndpointer(np.int32),
                ctypes.c_void_p,
            ]
            lib.fastply_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
    return _LIB


def load_ply_native(path) -> Optional[dict]:
    """Parse a binary PLY natively; None if unsupported (use fallback)."""
    lib = get_fastply()
    if lib is None:
        return None
    handle = lib.fastply_parse(str(path).encode())
    if not handle:
        return None
    try:
        nv = ctypes.c_long()
        nf = ctypes.c_long()
        hc = ctypes.c_int()
        lib.fastply_counts(handle, ctypes.byref(nv), ctypes.byref(nf),
                           ctypes.byref(hc))
        vertices = np.empty((nv.value, 3), np.float32)
        faces = np.empty((max(nf.value, 1), 3), np.int32)
        colors = np.empty((nv.value, 3), np.uint8) if hc.value else None
        lib.fastply_copy(
            handle, vertices, faces,
            colors.ctypes.data_as(ctypes.c_void_p) if hc.value else None,
        )
        return {
            "vertices": vertices,
            "faces": faces[: nf.value],
            "colors": colors,
        }
    finally:
        lib.fastply_free(handle)

"""ctypes bindings for the native host data path (points_io.cpp).

Compiled lazily with g++ on first use; ``available()`` gates callers so the
numpy pipeline (data/pipeline.py) remains the portable fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpoints_io.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


def _build() -> bool:
    src = os.path.join(_DIR, "points_io.cpp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", src, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _FAILED
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            os.path.join(_DIR, "points_io.cpp")
        ):
            if not _build():
                _FAILED = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.assemble_points.restype = ctypes.c_int
        lib.assemble_points.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            ctypes.c_uint64,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def assemble_points(
    paths: Sequence[str],
    rotations: np.ndarray,  # [N, 3, 3] sensor2lidar (identity for key)
    translations: np.ndarray,  # [N, 3]
    ts_deltas: np.ndarray,  # [N] seconds
    pcr: Sequence[float],
    max_points: int,
    load_dim: int = 5,
    shuffle: bool = False,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Native load + sweep-compose + range-filter + shuffle + pad.

    Returns (points [max_points, load_dim] float32, mask [max_points] bool,
    n_valid)."""
    lib = _load()
    assert lib is not None, "native points_io unavailable"
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    out = np.zeros((max_points, load_dim), np.float32)
    mask = np.zeros((max_points,), np.uint8)
    got = lib.assemble_points(
        c_paths,
        n,
        np.ascontiguousarray(rotations, np.float64).reshape(-1),
        np.ascontiguousarray(translations, np.float64).reshape(-1),
        np.ascontiguousarray(ts_deltas, np.float64),
        load_dim,
        np.ascontiguousarray(pcr, np.float64),
        1 if shuffle else 0,
        seed,
        out.reshape(-1),
        mask,
        max_points,
    )
    assert got >= 0, f"native read failed for {paths}"
    return out, mask.astype(bool), got

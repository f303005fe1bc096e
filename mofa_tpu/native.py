"""ctypes binding for the native host-preprocessing library.

Compiles native/mofa_host.cpp on first use (cached in
~/.cache/mofa_tpu/), falls back to the numpy implementations when no
toolchain is available. `available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "mofa_host.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[ctypes.CDLL]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    digest = hashlib.sha256(open(src, "rb").read()).hexdigest()[:16]
    cache = os.path.join(os.path.expanduser("~"), ".cache", "mofa_tpu")
    os.makedirs(cache, exist_ok=True)
    lib_path = os.path.join(cache, f"libmofa_host_{digest}.so")
    if not os.path.exists(lib_path):
        cmd = ["g++", "-O3", "-shared", "-fPIC", src, "-o", lib_path]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        return ctypes.CDLL(lib_path)
    except OSError:
        return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        if os.environ.get("MOFA_TPU_NO_NATIVE"):
            _LIB = None
        else:
            _LIB = _build()
        if _LIB is not None:
            _declare(_LIB)
    return _LIB


def available() -> bool:
    return _lib() is not None


def _declare(lib: ctypes.CDLL):
    i64 = ctypes.c_int64
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.rasterize_tracks.argtypes = [f64p, i64, i64, i64, i64, ctypes.c_int,
                                     f64p, f64p]
    lib.square_nms.argtypes = [f32p, i64, i64, i64, f32p]
    lib.neighbor_elim.argtypes = [i64p, i64p, i64, ctypes.c_double, f32p, u8p]
    lib.pchip_derivatives.argtypes = [f64p, f64p, i64, f64p]


def rasterize_tracks(tracks: np.ndarray, n_steps: int, H: int, W: int,
                     is_backward_flow: bool = False):
    """Native path of ops/rasterize.rasterize_trajectories."""
    lib = _lib()
    if lib is None:
        from mofa_tpu.ops.rasterize import rasterize_trajectories
        return rasterize_trajectories(tracks, n_steps, H, W, is_backward_flow)
    tracks = np.ascontiguousarray(tracks, np.float64)
    K = tracks.shape[0]
    flow = np.empty((n_steps, H, W, 2), np.float64)
    mask = np.empty((n_steps, H, W), np.float64)
    lib.rasterize_tracks(tracks, K, n_steps, H, W,
                         int(is_backward_flow), flow, mask)
    return flow, mask


def square_nms(score: np.ndarray, ks: int) -> np.ndarray:
    lib = _lib()
    if lib is None:
        from mofa_tpu.train.flow_sampler import square_nms as np_nms
        return np_nms(score, ks)
    score = np.ascontiguousarray(score, np.float32)
    out = np.empty_like(score)
    lib.square_nms(score, score.shape[0], score.shape[1], ks, out)
    return out


def neighbor_elim(rows: np.ndarray, cols: np.ndarray, d: float,
                  coins: np.ndarray):
    """coins: pre-drawn uniforms (so python/native agree bit-exactly)."""
    lib = _lib()
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    coins = np.ascontiguousarray(coins, np.float32)
    if lib is None:
        keep = np.ones(len(rows), bool)
        flip = 0
        for i in range(len(rows)):
            for j in range(len(rows)):
                if abs(rows[i] - rows[j]) < d and abs(cols[i] - cols[j]) < d:
                    if keep[i] and keep[j] and i != j:
                        if coins[flip] > 0.5:
                            keep[i] = False
                        else:
                            keep[j] = False
                    flip += 1
        return rows[keep], cols[keep]
    keep = np.empty(len(rows), np.uint8)
    lib.neighbor_elim(rows, cols, len(rows), float(d), coins, keep)
    mask = keep.astype(bool)
    return rows[mask], cols[mask]


def pchip_derivatives(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    lib = _lib()
    if lib is None:
        from mofa_tpu.ops.trajectory import _pchip_derivatives
        return _pchip_derivatives(np.asarray(x), np.asarray(y))
    x = np.ascontiguousarray(x, np.float64)
    y = np.ascontiguousarray(y, np.float64)
    d = np.empty_like(x)
    lib.pchip_derivatives(x, y, len(x), d)
    return d

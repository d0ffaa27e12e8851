"""Native C++ host kernels (ctypes bindings).

C++ replacement for the reference's Cython module
(``/root/reference/lib/cython_impl/tools.pyx``), compiled on first use
with the system toolchain (g++ -O3, no pybind11 needed) into a shared
library next to this package.  Every entry point has a numpy twin in
``sm_hpss_mtl_tpu.ops``; ``available()`` gates usage so environments
without a compiler silently fall back to numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kernels.cpp")
_LIB_PATH = os.path.join(_HERE, "_kernels.so")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB_PATH, _SRC]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"{type(e).__name__}: {e}"
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build_error = _build()
            if _build_error is not None:
                return
        lib = ctypes.CDLL(_LIB_PATH)
        i64, i32, f32p, f64p, i64p = (ctypes.c_int64, ctypes.c_int32,
                                      np.ctypeslib.ndpointer(np.float32),
                                      np.ctypeslib.ndpointer(np.float64),
                                      np.ctypeslib.ndpointer(np.int64))
        lib.extract_patches_f32.argtypes = [f32p, i64, i64, i64, i64, i64, f32p]
        lib.standardize_rows_f32.argtypes = [f32p, i64, i64]
        lib.scale_frames_f32.argtypes = [f32p, f32p, f32p, i64, i64, f32p]
        lib.silence_segments.restype = i64
        lib.silence_segments.argtypes = [f64p, i64, i64, ctypes.c_double,
                                         i64, i64, ctypes.c_double,
                                         ctypes.c_double, i64p, i64, i64p]
        lib.patch_statistics_f64.argtypes = [f64p, i64, i64, i64, i32, i32,
                                             f64p]
        lib.add_gaussian_noise_f32.argtypes = [f32p, i64, ctypes.c_float,
                                               ctypes.c_uint64]
        _lib = lib


def available() -> bool:
    _load()
    return _lib is not None


def build_error() -> str | None:
    _load()
    return _build_error


# ---------------------------------------------------------------------------
# Wrappers (numpy-compatible signatures)
# ---------------------------------------------------------------------------

def extract_patches(fv: np.ndarray, patch_size: int,
                    patch_shift: int) -> np.ndarray:
    """Native twin of ``ops.patches.extract_patches_np``."""
    from ..ops.patches import _start_indices, tiled_length
    _load()
    fv = np.ascontiguousarray(fv, dtype=np.float32)
    D, T = fv.shape
    full_T = tiled_length(T, patch_size)
    if full_T != T:
        reps = -(-full_T // T)
        fv = np.ascontiguousarray(np.tile(fv, (1, reps))[:, :full_T])
    n = len(_start_indices(full_T, patch_size, patch_shift))
    out = np.empty((n, D, patch_size), np.float32)
    _lib.extract_patches_f32(fv, D, full_T, patch_size, patch_shift, n, out)
    return out


def standardize_rows(fv: np.ndarray) -> np.ndarray:
    _load()
    out = np.ascontiguousarray(fv, dtype=np.float32).copy()
    _lib.standardize_rows_f32(out, out.shape[0], out.shape[1])
    return out


def scale_frames(fv: np.ndarray, mean: np.ndarray,
                 stdev: np.ndarray) -> np.ndarray:
    _load()
    fv = np.ascontiguousarray(fv, dtype=np.float32)
    out = np.empty_like(fv)
    _lib.scale_frames_f32(fv, np.ascontiguousarray(mean, np.float32),
                          np.ascontiguousarray(stdev, np.float32),
                          fv.shape[0], fv.shape[1], out)
    return out


def remove_silence(x: np.ndarray, energy: np.ndarray, fs: int,
                   Tw: int = 25, Ts: int = 10, alpha: float = 0.025,
                   beta: float = 0.075):
    """Native twin of ``ops.silence.remove_silence``."""
    _load()
    frame_size = int(Tw * fs / 1000)
    frame_shift = int(Ts * fs / 1000)
    energy = np.ascontiguousarray(energy, np.float64)
    n_frames = len(energy)
    n = len(x)
    segments = np.zeros(2 * n_frames + 2, np.int64)
    marker = np.zeros(n_frames, np.int64)
    n_seg = _lib.silence_segments(energy, n_frames, n, float(fs),
                                  frame_size, frame_shift, alpha, beta,
                                  segments, n_frames, marker)
    sample_marker = np.ones(n, np.int64)
    total = 0.0
    for s in range(n_seg):
        k, l = segments[2 * s], segments[2 * s + 1]
        sample_marker[k:l] = 0
        total += (l - k) / fs
    if n_seg > 1:
        x_out = x[sample_marker == 1]
    else:
        x_out = x
    return x_out, sample_marker, marker, total


def add_gaussian_noise(x: np.ndarray, scale: float, seed: int) -> None:
    """In-place ``x += scale * N(0,1)`` over a contiguous float32 array.

    Ziggurat sampler (~3x numpy's float32 ``standard_normal`` on this
    host, and no float64 upcast of the batch).  The stream is seeded per
    call; determinism is per (seed, shape)."""
    _load()
    assert x.dtype == np.float32 and x.flags["C_CONTIGUOUS"]
    _lib.add_gaussian_noise_f32(x.reshape(-1), x.size,
                                np.float32(scale), np.uint64(seed))


_STATS = {"mean": 0, "variance": 1, "skew": 2, "kurtosis": 3}


def patch_statistics(fv: np.ndarray, stat_type: str = "skew",
                     axis: int = 0) -> np.ndarray:
    _load()
    fv = np.ascontiguousarray(fv, np.float64)
    N, F, T = fv.shape
    out = np.empty((N, T if axis == 0 else F), np.float64)
    _lib.patch_statistics_f64(fv, N, F, T, _STATS[stat_type], axis, out)
    return out

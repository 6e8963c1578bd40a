"""ctypes bindings for the native C++ feeder (native/feeder.cc).

Builds on demand with the repo's Makefile (g++ only; no pybind11 in this
image). Falls back gracefully: :func:`available` reports whether the library
could be built/loaded, and the pipeline uses the pure-numpy path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwcfeeder.so")
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True)
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    build()
    lib = ctypes.CDLL(_LIB_PATH)
    d = ctypes.c_double
    dp = ctypes.POINTER(ctypes.c_double)
    fp = ctypes.POINTER(ctypes.c_float)
    vp = ctypes.c_void_p
    lg = ctypes.c_long

    lib.wc_feeder_create.restype = vp
    lib.wc_feeder_create.argtypes = [dp, dp, d, d, dp, dp]
    lib.wc_feeder_destroy.argtypes = [vp]
    lib.wc_feeder_add_points.restype = lg
    lib.wc_feeder_add_points.argtypes = [vp, lg, dp, fp]
    lib.wc_feeder_load_scan.restype = lg
    lib.wc_feeder_load_scan.argtypes = [vp, ctypes.c_char_p]
    lib.wc_feeder_size.restype = lg
    lib.wc_feeder_size.argtypes = [vp]
    lib.wc_feeder_front_time.restype = d
    lib.wc_feeder_front_time.argtypes = [vp]
    lib.wc_feeder_back_time.restype = d
    lib.wc_feeder_back_time.argtypes = [vp]
    lib.wc_feeder_drop_before.restype = lg
    lib.wc_feeder_drop_before.argtypes = [vp, d]
    lib.wc_feeder_count_until.restype = lg
    lib.wc_feeder_count_until.argtypes = [vp, d]
    lib.wc_feeder_pop_sweep.restype = lg
    lib.wc_feeder_pop_sweep.argtypes = [vp, d, d, lg, fp, fp]
    lib.wc_feeder_peek.restype = lg
    lib.wc_feeder_peek.argtypes = [vp, lg, dp, fp]
    lib.wc_feeder_push_filtered.argtypes = [vp, lg, dp, fp]

    lib.wc_resampler_create.restype = vp
    lib.wc_resampler_create.argtypes = [d]
    lib.wc_resampler_destroy.argtypes = [vp]
    lib.wc_resampler_add.restype = lg
    lib.wc_resampler_add.argtypes = [vp, d, dp, dp, lg, dp, dp, dp]
    lib.wc_resampler_t0.restype = d
    lib.wc_resampler_t0.argtypes = [vp]
    lib.wc_resampler_get_state.argtypes = [vp, dp]
    lib.wc_resampler_set_state.argtypes = [vp, dp]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeFeeder:
    """Point buffer with extrinsic + filters applied in C++."""

    def __init__(self, ext_rot, ext_pos, min_range, max_range, bb_min, bb_max):
        lib = _load()
        self._lib = lib
        rot = np.ascontiguousarray(ext_rot, np.float64).reshape(9)
        pos = np.ascontiguousarray(ext_pos, np.float64)
        bmin = np.ascontiguousarray(bb_min, np.float64)
        bmax = np.ascontiguousarray(bb_max, np.float64)
        self._h = lib.wc_feeder_create(_dptr(rot), _dptr(pos),
                                       float(min_range), float(max_range),
                                       _dptr(bmin), _dptr(bmax))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.wc_feeder_destroy(self._h)
            self._h = None

    def add_points(self, times: np.ndarray, pts_lidar: np.ndarray) -> int:
        t = np.ascontiguousarray(times, np.float64)
        p = np.ascontiguousarray(pts_lidar, np.float32)
        return self._lib.wc_feeder_add_points(self._h, len(t), _dptr(t), _fptr(p))

    def load_scan(self, path: str) -> int:
        n = self._lib.wc_feeder_load_scan(self._h, path.encode())
        if n < 0:
            raise IOError(f"native scan load failed ({n}) for {path}")
        return n

    def __len__(self) -> int:
        return self._lib.wc_feeder_size(self._h)

    @property
    def front_time(self) -> float:
        return self._lib.wc_feeder_front_time(self._h)

    @property
    def back_time(self) -> float:
        return self._lib.wc_feeder_back_time(self._h)

    def drop_before(self, t_cut: float) -> int:
        return self._lib.wc_feeder_drop_before(self._h, float(t_cut))

    def count_until(self, t_end: float) -> int:
        """Number of buffered points with time < t_end (non-destructive)."""
        return self._lib.wc_feeder_count_until(self._h, float(t_end))

    def pop_sweep(self, t_end: float, epoch: float, out_times: np.ndarray, out_xyz: np.ndarray) -> int:
        """Pop points with t < t_end into the padded f32 arrays (relative to
        epoch). Returns the count written (capped at the array size)."""
        assert out_times.dtype == np.float32 and out_xyz.dtype == np.float32
        return self._lib.wc_feeder_pop_sweep(
            self._h, float(t_end), float(epoch), len(out_times),
            _fptr(out_times), _fptr(out_xyz))

    def dump(self):
        """Non-destructive copy of the buffered points (checkpoint support)."""
        n = len(self)
        t = np.zeros(n, np.float64)
        xyz = np.zeros((n, 3), np.float32)
        self._lib.wc_feeder_peek(self._h, n, _dptr(t), _fptr(xyz))
        return t, xyz.astype(np.float64)

    def restore(self, t: np.ndarray, xyz: np.ndarray) -> None:
        t = np.ascontiguousarray(t, np.float64)
        x = np.ascontiguousarray(xyz, np.float32)
        self._lib.wc_feeder_push_filtered(self._h, len(t), _dptr(t), _fptr(x))


class NativeResampler:
    """Uniform-grid IMU resampler in C++ (same grid as imu.ImuResampler)."""

    def __init__(self, rate: float, max_out: int = 64):
        lib = _load()
        self._lib = lib
        self._h = lib.wc_resampler_create(float(rate))
        self._out_t = np.zeros(max_out, np.float64)
        self._out_acc = np.zeros((max_out, 3), np.float64)
        self._out_gyr = np.zeros((max_out, 3), np.float64)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.wc_resampler_destroy(self._h)
            self._h = None

    @property
    def _t0(self) -> float:  # same attribute name as the Python resampler
        return self._lib.wc_resampler_t0(self._h)

    def get_state(self) -> np.ndarray:
        out = np.zeros(11, np.float64)
        self._lib.wc_resampler_get_state(self._h, _dptr(out))
        return out

    def set_state(self, st: np.ndarray) -> None:
        st = np.ascontiguousarray(st, np.float64)
        self._lib.wc_resampler_set_state(self._h, _dptr(st))

    def add(self, t: float, acc, gyr):
        a = np.ascontiguousarray(acc, np.float64)
        g = np.ascontiguousarray(gyr, np.float64)
        n = self._lib.wc_resampler_add(
            self._h, float(t), _dptr(a), _dptr(g), len(self._out_t),
            _dptr(self._out_t), _dptr(self._out_acc), _dptr(self._out_gyr))
        return [(float(self._out_t[i]), self._out_acc[i].copy(), self._out_gyr[i].copy())
                for i in range(n)]

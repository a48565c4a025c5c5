"""ctypes bindings for the C++ host-pipeline kernels (native/src/dpn_native.cc).

Builds the shared library on first use (g++ -O3 -fopenmp) and caches it next
to the source; every entry point has a numpy fallback so the framework runs
unchanged where no compiler exists.  Use ``available()`` to check, and the
``trilinear`` / ``gather`` / ``pack_tokens`` wrappers transparently pick the
fast path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "src", "dpn_native.cc",
)
_SO = os.path.join(os.path.dirname(_SRC), "libdpn_native.so")


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    for cc in ("g++", "c++", "clang++"):
        try:
            cmd = [cc, "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
                   _SRC, "-o", _SO]
            r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
            if r.returncode == 0:
                return _SO
            # retry without openmp / march
            cmd = [cc, "-O3", "-shared", "-fPIC", _SRC, "-o", _SO]
            r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
            if r.returncode == 0:
                return _SO
        except (FileNotFoundError, subprocess.TimeoutExpired):
            continue
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        i64, f32p, f64p = ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_double)
        lib.dpn_trilinear.argtypes = [f32p] + [i64] * 4 + [ctypes.c_double] * 6 + \
            [f64p, f64p, f64p, i64, f32p]
        lib.dpn_gather.argtypes = [f32p, i64, i64,
                                   ctypes.POINTER(ctypes.c_int64),
                                   ctypes.POINTER(ctypes.c_int64), i64, f32p]
        lib.dpn_normalize.argtypes = [f32p, i64, i64, f32p, f32p]
        lib.dpn_pack_tokens.argtypes = [f32p, i64, i64, i64, f32p, f32p, f32p]
        lib.dpn_num_threads.restype = ctypes.c_int
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.dpn_lzw_decode.argtypes = [u8p, i64, u8p, i64]
        lib.dpn_lzw_decode.restype = i64
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _fp32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def trilinear(cube: np.ndarray, lon: np.ndarray, lat: np.ndarray, t: np.ndarray,
              lon0: float, dlon: float, lat0: float, dlat: float,
              t0: float = 0.0, dt: float = 6.0) -> np.ndarray:
    """[V, H, W, T] cube at N scattered points -> [N, V]."""
    lib = _load()
    cube = np.ascontiguousarray(cube, np.float32)
    V, H, W, T = cube.shape
    lon = np.ascontiguousarray(lon, np.float64)
    lat = np.ascontiguousarray(lat, np.float64)
    t = np.ascontiguousarray(t, np.float64)
    n = len(lon)
    if lib is None:  # numpy fallback
        from deepphysinet_tpu.data.dataset import _np_trilinear

        lat_g = lat0 + np.arange(H) * dlat
        lon_g = lon0 + np.arange(W) * dlon
        th = t0 + np.arange(T) * dt
        cols = [_np_trilinear(cube[v], lat_g, lon_g, th, lat, lon, t) for v in range(V)]
        return np.stack(cols, axis=-1).astype(np.float32)
    out = np.empty((n, V), np.float32)
    lib.dpn_trilinear(_fp32(cube), V, H, W, T, lon0, dlon, lat0, dlat, t0, dt,
                      lon.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                      lat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                      t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                      n, _fp32(out))
    return out


def gather(img: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    xs = np.ascontiguousarray(xs, np.int64)
    ys = np.ascontiguousarray(ys, np.int64)
    if lib is None:
        return img[np.clip(ys, 0, img.shape[0] - 1), np.clip(xs, 0, img.shape[1] - 1)]
    out = np.empty(len(xs), np.float32)
    lib.dpn_gather(_fp32(img), img.shape[0], img.shape[1],
                   xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                   ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                   len(xs), _fp32(out))
    return out


def pack_tokens(raster: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """[H, W, C] raster -> normalized [C, H*W] token rows."""
    lib = _load()
    raster = np.ascontiguousarray(raster, np.float32)
    h, w, c = raster.shape
    mean = np.ascontiguousarray(np.broadcast_to(mean, (c,)), np.float32)
    std = np.ascontiguousarray(np.broadcast_to(std, (c,)), np.float32)
    if lib is None:
        out = (raster.reshape(-1, c).T - mean[:, None]) / std[:, None]
        return out.astype(np.float32)
    out = np.empty((c, h * w), np.float32)
    lib.dpn_pack_tokens(_fp32(raster), h, w, c, _fp32(mean), _fp32(std), _fp32(out))
    return out


def lzw_decode(data: bytes, expected_size: int) -> Optional[bytes]:
    """TIFF LZW decode via the C++ kernel; None -> caller uses the Python path.

    ``expected_size`` bounds the output buffer (segment byte size is known
    from the TIFF tags); decodes shorter than the bound are valid (writers
    may truncate the final segment).
    """
    lib = _load()
    if lib is None or not hasattr(lib, "dpn_lzw_decode"):
        return None
    inp = np.frombuffer(data, np.uint8)
    out = np.empty(int(expected_size), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    n = lib.dpn_lzw_decode(inp.ctypes.data_as(u8p), len(inp),
                           out.ctypes.data_as(u8p), len(out))
    if n < 0:
        return None
    return out[:n].tobytes()

"""Native C++ host-pipeline kernels: build + parity with the numpy paths."""

import numpy as np
import pytest

from deepphysinet_tpu import native
from deepphysinet_tpu.data.dataset import _np_trilinear


def test_native_builds():
    assert native.available(), "g++ is in this image; the native lib must build"


def test_trilinear_matches_numpy(rng):
    V, H, W, T = 6, 10, 17, 5
    cube = rng.randn(V, H, W, T).astype(np.float32)
    n = 500
    lon = rng.uniform(72, 88, n)
    lat = rng.uniform(18, 27, n)
    t = rng.uniform(0, 24, n)
    got = native.trilinear(cube, lon, lat, t, 72.0, 1.0, 18.0, 1.0, 0.0, 6.0)
    lat_g, lon_g, th = 18 + np.arange(H), 72 + np.arange(W), np.arange(T) * 6.0
    for v in range(V):
        ref = _np_trilinear(cube[v], lat_g, lon_g, th, lat, lon, t)
        np.testing.assert_allclose(got[:, v], ref, rtol=1e-5, atol=1e-6)


def test_gather(rng):
    img = rng.randn(9, 13).astype(np.float32)
    xs = rng.randint(0, 13, 50)
    ys = rng.randint(0, 9, 50)
    np.testing.assert_array_equal(native.gather(img, xs, ys), img[ys, xs])


def test_pack_tokens(rng):
    raster = rng.randn(7, 9, 5).astype(np.float32)
    mean = rng.randn(5).astype(np.float32)
    std = (rng.rand(5).astype(np.float32) + 0.5)
    got = native.pack_tokens(raster, mean, std)
    ref = ((raster.reshape(-1, 5).T - mean[:, None]) / std[:, None]).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_trilinear_speedup_vs_numpy(rng):
    """The native path must not be slower than numpy on a realistic batch."""
    import time

    if not native.available():
        pytest.skip("no compiler")
    V, H, W, T = 6, 37, 65, 5
    cube = rng.randn(V, H, W, T).astype(np.float32)
    n = 20480
    lon = rng.uniform(72, 136, n)
    lat = rng.uniform(18, 54, n)
    t = rng.uniform(0, 24, n)
    native.trilinear(cube, lon, lat, t, 72.0, 1.0, 18.0, 1.0)  # warm
    t0 = time.monotonic()
    for _ in range(5):
        native.trilinear(cube, lon, lat, t, 72.0, 1.0, 18.0, 1.0)
    t_native = time.monotonic() - t0
    lat_g, lon_g, th = 18 + np.arange(H), 72 + np.arange(W), np.arange(T) * 6.0
    t0 = time.monotonic()
    for _ in range(5):
        np.stack([_np_trilinear(cube[v], lat_g, lon_g, th, lat, lon, t)
                  for v in range(V)], -1)
    t_numpy = time.monotonic() - t0
    assert t_native < t_numpy * 1.5  # typically many x faster

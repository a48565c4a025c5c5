"""Trilinear interpolation vs scipy RegularGridInterpolator (= xarray.interp linear)."""

import numpy as np
import jax.numpy as jnp
from scipy.interpolate import RegularGridInterpolator

from deepphysinet_tpu.ops.interp import trilinear_interp_cube


def test_matches_scipy_on_uniform_grid(rng):
    H, W, T = 37, 65, 5
    lat = 18.0 + np.arange(H) * 1.0
    lon = 72.0 + np.arange(W) * 1.0
    th = np.arange(T) * 6.0
    cube = rng.randn(H, W, T).astype(np.float32)

    n = 200
    lat_p = rng.uniform(18, 54, n)
    lon_p = rng.uniform(72, 136, n)
    t_p = rng.uniform(0, 24, n)

    ref = RegularGridInterpolator((lat, lon, th), cube)(np.stack([lat_p, lon_p, t_p], -1))
    got = trilinear_interp_cube(
        jnp.asarray(cube), jnp.asarray(lon_p), jnp.asarray(lat_p), jnp.asarray(t_p),
        lon0=72.0, dlon=1.0, lat0=18.0, dlat=1.0, t0=0.0, dt=6.0,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_batched_variables_and_edges(rng):
    V, H, W, T = 6, 9, 11, 5
    cube = rng.randn(V, H, W, T).astype(np.float32)
    # exact grid corners must return grid values
    got = trilinear_interp_cube(
        jnp.asarray(cube),
        jnp.array([72.0, 72.0 + (W - 1) * 0.25]),
        jnp.array([18.0, 18.0 + (H - 1) * 0.25]),
        jnp.array([0.0, 24.0]),
        lon0=72.0, dlon=0.25, lat0=18.0, dlat=0.25, t0=0.0, dt=6.0,
    )
    assert got.shape == (V, 2)
    np.testing.assert_allclose(np.asarray(got[:, 0]), cube[:, 0, 0, 0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got[:, 1]), cube[:, -1, -1, -1], rtol=1e-5)


def test_trilinear_rows_matches_channel_first():
    """trilinear_interp_rows (channel-last row gathers, the TPU layout for
    runtime-argument cubes -- docs/PERF.md round-3 (i)) must equal the
    channel-first trilinear_interp_cube on the transposed cube."""
    from deepphysinet_tpu.ops.interp import (
        trilinear_interp_cube, trilinear_interp_rows)

    rng = np.random.RandomState(5)
    N = 333
    cube_cf = rng.randn(6, 9, 13, 5).astype(np.float32)
    lon = jnp.asarray(72.0 + rng.rand(N).astype(np.float32) * 12.0)
    lat = jnp.asarray(18.0 + rng.rand(N).astype(np.float32) * 8.0)
    t = jnp.asarray(rng.rand(N).astype(np.float32) * 24.0)
    kw = dict(lon0=72.0, dlon=1.0, lat0=18.0, dlat=1.0, t0=0.0, dt=6.0)

    ref = trilinear_interp_cube(jnp.asarray(cube_cf), lon, lat, t, **kw).T
    got = trilinear_interp_rows(
        jnp.asarray(np.moveaxis(cube_cf, 0, -1)), lon, lat, t, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6,
                               atol=1e-6)


def test_trilinear_rows_batched_matches_vmap():
    """trilinear_interp_rows_batched == vmap(trilinear_interp_rows) bitwise
    (same row gathers, same lerp order; the batched form exists because
    vmapped gathers lower ~3.6x slower on TPU)."""
    import jax

    from deepphysinet_tpu.ops.interp import (
        trilinear_interp_rows, trilinear_interp_rows_batched)

    rng = np.random.RandomState(5)
    B, N = 4, 333
    cube = jnp.asarray(rng.randn(B, 9, 13, 5, 6).astype(np.float32))
    lon = jnp.asarray(72.0 + rng.rand(B, N).astype(np.float32) * 12.0)
    lat = jnp.asarray(18.0 + rng.rand(B, N).astype(np.float32) * 8.0)
    t = jnp.asarray(rng.rand(B, N).astype(np.float32) * 24.0)
    kw = dict(lon0=72.0, dlon=1.0, lat0=18.0, dlat=1.0, t0=0.0, dt=6.0)

    ref = jax.vmap(lambda c, x, y, tt: trilinear_interp_rows(c, x, y, tt, **kw))(
        cube, lon, lat, t)
    got = trilinear_interp_rows_batched(cube, lon, lat, t, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

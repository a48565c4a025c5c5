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

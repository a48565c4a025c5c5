"""On-device trilinear interpolation of coarse NWP cubes to scattered points.

The reference interpolates the 1-degree / 6-hourly NWP window cube to sampled
points with per-worker ``xarray.DataArray.interp`` on CPU
(dataset/physics_dataset.py:406-411, 477-482, 566-572).  Here the (tiny)
window cube -- [V=6 vars, H=37, W=65, T=5 steps] -- ships to the device once
per batch and the gather + lerp runs inside the jitted train step, which both
removes the CPU bottleneck and lets collocation points be resampled on-device
every step.

Grids are uniform (verified against auxiliary_data coord pickles), so
coordinate lookup is a closed-form fractional index, equivalent to xarray's
linear interpolation on these grids.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_trilinear(cube: jnp.ndarray, fy: jnp.ndarray, fx: jnp.ndarray, ft: jnp.ndarray) -> jnp.ndarray:
    """cube: [..., H, W, T]; fy/fx/ft: fractional indices [N] -> [..., N]."""
    H, W, T = cube.shape[-3:]
    fy = jnp.clip(fy, 0.0, H - 1.0)
    fx = jnp.clip(fx, 0.0, W - 1.0)
    ft = jnp.clip(ft, 0.0, T - 1.0)

    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 2) if H > 1 else jnp.zeros_like(fy, jnp.int32)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 2) if W > 1 else jnp.zeros_like(fx, jnp.int32)
    t0 = jnp.clip(jnp.floor(ft).astype(jnp.int32), 0, T - 2) if T > 1 else jnp.zeros_like(ft, jnp.int32)
    y1, x1, t1 = jnp.minimum(y0 + 1, H - 1), jnp.minimum(x0 + 1, W - 1), jnp.minimum(t0 + 1, T - 1)
    wy, wx, wt = fy - y0, fx - x0, ft - t0

    # Flatten the trailing grid for a single gather per corner: [..., H*W*T].
    flat = cube.reshape(cube.shape[:-3] + (H * W * T,))

    def take(yi, xi, ti):
        idx = (yi * W + xi) * T + ti  # [N]
        return jnp.take(flat, idx, axis=-1)  # [..., N]

    c000 = take(y0, x0, t0)
    c001 = take(y0, x0, t1)
    c010 = take(y0, x1, t0)
    c011 = take(y0, x1, t1)
    c100 = take(y1, x0, t0)
    c101 = take(y1, x0, t1)
    c110 = take(y1, x1, t0)
    c111 = take(y1, x1, t1)

    c00 = c000 * (1 - wt) + c001 * wt
    c01 = c010 * (1 - wt) + c011 * wt
    c10 = c100 * (1 - wt) + c101 * wt
    c11 = c110 * (1 - wt) + c111 * wt
    c0 = c00 * (1 - wx) + c01 * wx
    c1 = c10 * (1 - wx) + c11 * wx
    return c0 * (1 - wy) + c1 * wy


def trilinear_interp_cube(
    cube: jnp.ndarray,
    lon_pts: jnp.ndarray,
    lat_pts: jnp.ndarray,
    t_pts: jnp.ndarray,
    lon0: float,
    dlon: float,
    lat0: float,
    dlat: float,
    t0: float = 0.0,
    dt: float = 6.0,
) -> jnp.ndarray:
    """Interpolate ``cube[..., H, W, T]`` at scattered (lon, lat, t) points.

    Equivalent to the xarray.interp calls in dataset/physics_dataset.py:406-411
    for the uniform study-area grids.  ``t_pts`` in the same unit as the cube's
    time axis (hours).  Returns [..., N].
    """
    fy = (lat_pts - lat0) / dlat
    fx = (lon_pts - lon0) / dlon
    ft = (t_pts - t0) / dt
    return _gather_trilinear(cube, fy.astype(jnp.float32), fx.astype(jnp.float32), ft.astype(jnp.float32))

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


def _rows_weights(fy, fx, ft, H: int, W: int, T: int):
    """Shared corner-index/weight computation for the rows variants."""
    fy = jnp.clip(fy, 0.0, H - 1.0).astype(jnp.float32)
    fx = jnp.clip(fx, 0.0, W - 1.0).astype(jnp.float32)
    ft = jnp.clip(ft, 0.0, T - 1.0).astype(jnp.float32)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 2) if H > 1 else jnp.zeros_like(fy, jnp.int32)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 2) if W > 1 else jnp.zeros_like(fx, jnp.int32)
    t0 = jnp.clip(jnp.floor(ft).astype(jnp.int32), 0, T - 2) if T > 1 else jnp.zeros_like(ft, jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    t1 = jnp.minimum(t0 + 1, T - 1)
    return (y0, x0, t0, y1, x1, t1), (fy - y0, fx - x0, ft - t0)


def _lerp_rows(take, corners, weights):
    """Trilinear lerp over 8 row-gathered corners; weights get a trailing
    channel axis so [.., N, C] corners broadcast."""
    y0, x0, t0, y1, x1, t1 = corners
    wy, wx, wt = (w[..., None] for w in weights)
    c00 = take(y0, x0, t0) * (1 - wt) + take(y0, x0, t1) * wt
    c01 = take(y0, x1, t0) * (1 - wt) + take(y0, x1, t1) * wt
    c10 = take(y1, x0, t0) * (1 - wt) + take(y1, x0, t1) * wt
    c11 = take(y1, x1, t0) * (1 - wt) + take(y1, x1, t1) * wt
    c0 = c00 * (1 - wx) + c01 * wx
    c1 = c10 * (1 - wx) + c11 * wx
    return c0 * (1 - wy) + c1 * wy


def trilinear_interp_table(
    table: jnp.ndarray,  # [H*W*T, C] channel-last row table
    dims,  # STATIC (H, W, T)
    lon_pts: jnp.ndarray,  # [N]
    lat_pts: jnp.ndarray,  # [N]
    t_pts: jnp.ndarray,  # [N]
    lon0: float,
    dlon: float,
    lat0: float,
    dlat: float,
    t0: float = 0.0,
    dt: float = 6.0,
) -> jnp.ndarray:
    """Row-TABLE trilinear interp -> [N, C]: one row gather per corner.

    The cube arrives pre-flattened ([X, C], X = H*W*T) with the grid
    geometry passed STATICALLY.  This is the production device form: XLA
    assigns >2-D runtime parameters a tiled device layout for which the
    in-program ``reshape(-1, C)`` is a real relayout copy -- ~1 ms for the
    22 MB label cube, ~10x the gather it feeds (scripts/perf_gather_shape.py;
    docs/PERF.md round-3 (k)).  2-D row tables keep the cheap layout, so
    the gather runs at its isolated cost."""
    H, W, T = dims
    corners, weights = _rows_weights(
        (lat_pts - lat0) / dlat, (lon_pts - lon0) / dlon, (t_pts - t0) / dt,
        H, W, T)

    def take(yi, xi, ti):
        return jnp.take(table, (yi * W + xi) * T + ti, axis=0)  # [N, C]

    return _lerp_rows(take, corners, weights)


def trilinear_interp_table_batched(
    table: jnp.ndarray,  # [B*H*W*T, C] window-major row table
    dims,  # STATIC (H, W, T)
    lon_pts: jnp.ndarray,  # [B, N]
    lat_pts: jnp.ndarray,  # [B, N]
    t_pts: jnp.ndarray,  # [B, N]
    lon0: float,
    dlon: float,
    lat0: float,
    dlat: float,
    t0: float = 0.0,
    dt: float = 6.0,
) -> jnp.ndarray:
    """Batch-of-windows trilinear_interp_table -> [B, N, C], WITHOUT vmap.

    vmap lowers the corner lookups to batched gathers that XLA schedules
    ~3.6x slower on TPU (scripts/perf_vmap_sampler.py); instead the batch
    enters through the absolute row index ``b*H*W*T + flat``.
    Bitwise-identical to vmap over windows -- tested in tests/test_interp.py."""
    H, W, T = dims
    X = H * W * T
    off = (jnp.arange(lon_pts.shape[0], dtype=jnp.int32) * X)[:, None]  # [B, 1]
    corners, weights = _rows_weights(
        (lat_pts - lat0) / dlat, (lon_pts - lon0) / dlon, (t_pts - t0) / dt,
        H, W, T)
    N, C = lon_pts.shape[-1], table.shape[-1]

    def take(yi, xi, ti):
        idx = (yi * W + xi) * T + ti + off  # [B, N]
        return jnp.take(table, idx.reshape(-1), axis=0).reshape(-1, N, C)

    return _lerp_rows(take, corners, weights)


def trilinear_interp_rows(
    cube: jnp.ndarray,  # [H, W, T, C] channel-LAST
    lon_pts: jnp.ndarray,  # [N]
    lat_pts: jnp.ndarray,  # [N]
    t_pts: jnp.ndarray,  # [N]
    lon0: float,
    dlon: float,
    lat0: float,
    dlat: float,
    t0: float = 0.0,
    dt: float = 6.0,
) -> jnp.ndarray:
    """Channel-last trilinear interp -> [N, C]: one ROW gather per corner.

    With the cube stored channel-LAST, each sampled point's C variables are
    contiguous, so every corner lookup is a single row gather of [N, C]
    from the [H*W*T, C] operand -- ~8x faster than the channel-first form
    on v5e (scripts/perf_capture_vs_arg.py; docs/PERF.md round-3 (i)).
    NOTE: when the cube is a RUNTIME ARGUMENT on TPU, the in-program
    flatten below pays XLA's tiled-parameter relayout (~1 ms for a 22 MB
    cube -- round-3 (k)); hot paths should pre-flatten on the host and
    call :func:`trilinear_interp_table` instead."""
    H, W, T = cube.shape[-4:-1]
    return trilinear_interp_table(
        cube.reshape(H * W * T, cube.shape[-1]), (H, W, T),
        lon_pts, lat_pts, t_pts, lon0, dlon, lat0, dlat, t0, dt)


def trilinear_interp_rows_batched(
    cube: jnp.ndarray,  # [B, H, W, T, C] channel-LAST
    lon_pts: jnp.ndarray,  # [B, N]
    lat_pts: jnp.ndarray,  # [B, N]
    t_pts: jnp.ndarray,  # [B, N]
    lon0: float,
    dlon: float,
    lat0: float,
    dlat: float,
    t0: float = 0.0,
    dt: float = 6.0,
) -> jnp.ndarray:
    """Batch-of-windows trilinear_interp_rows -> [B, N, C], WITHOUT vmap.

    Channel-last makes the batch fold a bitcast in row-major layout
    ([B,H,W,T,C] -> [B*H*W*T, C]); see trilinear_interp_rows for the TPU
    runtime-argument relayout caveat (hot paths pre-flatten and call
    trilinear_interp_table_batched).  Bitwise-identical to
    vmap(trilinear_interp_rows) -- tested in tests/test_interp.py."""
    B = cube.shape[0]
    H, W, T = cube.shape[-4:-1]
    return trilinear_interp_table_batched(
        cube.reshape(B * H * W * T, cube.shape[-1]), (H, W, T),
        lon_pts, lat_pts, t_pts, lon0, dlon, lat0, dlat, t0, dt)

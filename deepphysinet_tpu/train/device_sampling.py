"""On-device point sampling: the TPU-native data hot path.

The reference samples label/collocation points and runs xarray trilinear
interpolation inside dataloader worker processes (dataset/physics_dataset.py:
323-499) -- the CPU bottleneck of its hot loop.  Here the host ships, per
window, just the raw cubes:

  field       [159, 2405]   token matrix (unchanged)
  nwp_cube    [H, W, T, 6]  normalized coarse NWP window (~0.3 MB)
  label_cube  [Hl, Wl, Tl, 6] normalized ERA5 window (~22 MB fp32)

(channel-LAST on device -- see CubeBatch -- so point lookups are
contiguous row gathers; the host keeps the reference's channel-first
window assembly and cube_batch_host() transposes once per window)

and the jitted train step samples FRESH points every optimizer step with
jax.random, gathers labels, interpolates conditioning values (ops/interp.py),
and computes Coriolis -- all fused into the step's XLA program.  Points are
resampled every step from the same window (the reference can only resample
when the dataloader revisits the item), which is strictly more sample-diverse
at zero host cost.

Sampling distributions match the reference exactly:
  margin: integer grid x ~ U{0..W-1}, y ~ U{0..H-1}, t ~ U{0..window_h} hours
          (physics_dataset.py:334-338)
  inter:  continuous x ~ U[0, W-1], y ~ U[0, H-1], integer t
          (physics_dataset.py:442-446)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from deepphysinet_tpu.ops.coords import OMEGA
from deepphysinet_tpu.ops.interp import (
    trilinear_interp_rows,
    trilinear_interp_table,
    trilinear_interp_table_batched,
)
from deepphysinet_tpu.train.train_step import (
    PointBatch,
    StepConfig,
    TrainState,
    _variable_metrics,
    _window_losses,
)
from deepphysinet_tpu.train.losses import build_loss


class CubeBatch(NamedTuple):
    """Per-window device cubes as channel-LAST, window-major ROW TABLES.

    The host/reference layout is channel-first ([6, H, W, T],
    dataset/physics_dataset.py window assembly); on DEVICE the cubes are
    stored channel-last so that every sampled point's 6 variables are one
    contiguous row -- each label lookup / interp corner is then a single
    row gather (isolated: ~8x faster on v5e than gathering the
    channel-first layout; docs/PERF.md round-3 (i)) -- AND pre-flattened to
    2-D ``[B*H*W*T, 6]`` row tables with the grid geometry carried
    statically (SamplerConfig + CoordSpec, see label_grid_dims /
    coarse_grid_dims): XLA assigns >2-D runtime parameters a tiled device
    layout for which an in-program ``reshape(-1, 6)`` is a ~1 ms relayout
    copy of the 22 MB label cube -- ~10x the gather it feeds
    (scripts/perf_gather_shape.py; round-3 (k)).  2-D tables keep the cheap
    layout at every window batch size, and the window fold stays exact:
    row ``b*X + flat`` is window b's grid point ``flat``.  Build instances
    with cube_batch_host()/cube_batch_from_items(), which do the one-time
    host-side transpose+flatten.

    The three trailing ``pool_*`` fields are the OPTIONAL pre-permuted point
    pool of the 'pool' sampler (see build_pool / sample_window_points_pooled):
    when present, ``label_cube`` may be None (the pool holds every label row)
    and the step's margin sampling is two contiguous slices instead of nm
    random HBM gathers.  Pool arrays keep their per-window leading axis:
    their per-step ops are dynamic-SLICES, which read tiled layouts
    directly (no relayout), and the slice offsets are per-window."""

    field: jnp.ndarray  # [B, L, enc_in]
    forecast_h: jnp.ndarray  # [B]
    nwp_cube: jnp.ndarray  # [B*Hc*Wc*Tc, 6] normalized NWP window rows
    label_cube: Optional[jnp.ndarray]  # [B*Hl*Wl*Tl, 6] normalized ERA5 rows
    pool_rows: Optional[jnp.ndarray] = None  # [B, X+pad, 6] permuted label rows
    pool_idx: Optional[jnp.ndarray] = None  # [B, X+pad] int32 flat grid indices
    pool_nwp: Optional[jnp.ndarray] = None  # [B, X+pad, 6] NWP cond at pool pts


class DeviceLRU:
    """Tiny bounded LRU for device-resident values (window cubes).

    One implementation shared by the train-loop cube cache and both
    validation cube caches (single + distributed) so capacity/eviction
    behavior cannot drift between them."""

    def __init__(self, cap: int):
        from collections import OrderedDict

        self.cap = int(cap)
        self._d: "OrderedDict" = OrderedDict()

    def get(self, key, build):
        if key in self._d:
            self._d.move_to_end(key)
            return self._d[key]
        value = build()
        self._d[key] = value
        if len(self._d) > self.cap:
            self._d.popitem(last=False)
        return value


def build_pool(label_cube_cl, pad: int, seed: int):
    """Pre-permuted label-row pool for one window (host numpy, 'pool' sampler).

    ``label_cube_cl``: [Hl, Wl, Tl, C] channel-last window.  Returns
    ``(rows [X+pad, C] float32, idx [X+pad] int32)`` where row j holds the
    label values of flat grid index ``idx[j] = (y*Wl + x)*Tl + slot`` (the
    same flat encoding the iid sampler gathers with) and ``idx`` is a
    uniform random permutation of all X = Hl*Wl*Tl grid points, padded with
    its own first ``pad`` entries so any slice ``[off : off+pad)`` with
    ``off < X`` stays in bounds.

    Why: per-step random row-gathers from the 22 MB device-resident label
    cube sit on the HBM gather-latency floor (~1 ms / 20480 points,
    docs/PERF.md round-3 (i)).  Shuffling ONCE per window on the host (off
    the critical path, amortized over the hundreds of steps a cached window
    is resampled) turns every step's label lookup into one contiguous
    dynamic-slice at a random offset -- sequential HBM traffic at
    bandwidth, not latency.  Distribution: each step's points are a
    contiguous chunk of a fixed uniform permutation -- marginally uniform
    over the grid like the reference's iid draw (physics_dataset.py:
    334-338), but without-replacement within a step (no duplicate points)
    and negatively correlated across steps (the window's grid is covered
    evenly every X/nm steps).  Documented divergence; the default 'iid'
    sampler keeps the reference distribution exactly."""
    import numpy as np

    lab = np.asarray(label_cube_cl, np.float32)
    Hl, Wl, Tl, C = lab.shape
    X = Hl * Wl * Tl
    perm = np.random.RandomState(seed).permutation(X).astype(np.int32)
    rows = lab.reshape(X, C)[perm]
    rows = np.concatenate([rows, rows[:pad]], axis=0)
    idx = np.concatenate([perm, perm[:pad]], axis=0)
    return np.ascontiguousarray(rows), np.ascontiguousarray(idx)


def expected_cube_dims(scfg, coord_spec):
    """((Hl, Wl, Tl), (Hc, Wc, Tc)) the samplers will assume for this config
    (label_grid_dims / coarse_grid_dims) -- pass as ``expect_dims`` to the
    cube builders so a geometry mismatch fails loudly at window-assembly
    time.  The 2-D row tables carry no grid structure, so a total-row-count
    coincidence (e.g. a transposed lat_size/lon_size) would otherwise pass
    the samplers' shape check and silently corrupt every sample."""
    return (label_grid_dims(scfg, coord_spec), coarse_grid_dims(scfg, coord_spec))


def cube_batch_host(field, forecast_h, nwp_cube_cf, label_cube_cf,
                    pool_pad: Optional[int] = None, pool_seeds=None,
                    keep_label_cube: bool = True,
                    expect_dims=None) -> CubeBatch:
    """Host numpy CubeBatch from REFERENCE channel-first cubes [B, 6, ...].

    The single place the channel-first -> channel-last layout decision is
    applied (one ~40 ms numpy transpose per window, amortized across the
    hundreds of steps a cached window is resampled).  Caller device_puts.

    With ``pool_pad`` set, also builds the per-window pre-permuted label
    pool (``build_pool``; pad must cover the largest n_margin any consumer
    slices) using per-window ``pool_seeds``; ``keep_label_cube=False`` then
    drops the raw label cube (the pool holds every row, halving the
    window's device footprint).  ``pool_nwp`` is left None -- it is
    computed ON DEVICE once per window (``attach_pool_nwp``) so the
    conditioning values match the per-step interpolator exactly."""
    import numpy as np

    label_cl = np.ascontiguousarray(
        np.moveaxis(np.asarray(label_cube_cf, np.float32), 1, -1))
    B, C = label_cl.shape[0], label_cl.shape[-1]
    if expect_dims is not None:
        # (expected_cube_dims) structural guard while the grid shape is
        # still visible -- the flattened tables can't check it themselves
        ldims, cdims = expect_dims
        got_l = tuple(label_cl.shape[1:4])
        got_c = tuple(np.asarray(nwp_cube_cf).shape[2:5])
        if got_l != tuple(ldims) or got_c != tuple(cdims):
            raise ValueError(
                f"window cube dims label={got_l} coarse={got_c} do not match "
                f"the sampler geometry label={tuple(ldims)} coarse={tuple(cdims)} "
                "derived from SamplerConfig + CoordSpec")
    pool_rows = pool_idx = None
    if pool_pad is not None:
        if pool_seeds is None:
            pool_seeds = list(range(B))
        pools = [build_pool(label_cl[b], pool_pad, int(pool_seeds[b]))
                 for b in range(B)]
        pool_rows = np.stack([p[0] for p in pools])
        pool_idx = np.stack([p[1] for p in pools])
    nwp_cl = np.ascontiguousarray(
        np.moveaxis(np.asarray(nwp_cube_cf, np.float32), 1, -1))
    return CubeBatch(
        field=np.asarray(field, np.float32),
        forecast_h=np.asarray(forecast_h, np.float32).reshape(-1),
        # 2-D window-major row tables: free on the host (the channel-last
        # arrays are already row-major), avoids the TPU tiled-parameter
        # relayout on device (see CubeBatch)
        nwp_cube=nwp_cl.reshape(-1, nwp_cl.shape[-1]),
        label_cube=(label_cl.reshape(-1, C)
                    if (keep_label_cube or pool_pad is None) else None),
        pool_rows=pool_rows,
        pool_idx=pool_idx,
    )


def _pool_seed_of(key) -> int:
    """Deterministic 31-bit pool seed from a window identity (e.g. its
    input_file tuple) -- every process builds the SAME pool for the same
    window, so multi-host runs stay layout-invariant."""
    import zlib

    return zlib.crc32(repr(key).encode()) & 0x7FFFFFFF


def cube_batch_from_items(items, pool_pad: Optional[int] = None,
                          keep_label_cube: bool = True,
                          expect_dims=None) -> CubeBatch:
    """Host numpy CubeBatch from a list of ``get_cube_item`` dicts."""
    import numpy as np

    return cube_batch_host(
        np.stack([np.asarray(it["field_data"], np.float32) for it in items]),
        np.asarray([np.float32(it["forecast_h"]) for it in items], np.float32),
        np.stack([np.asarray(it["nwp_cube"], np.float32) for it in items]),
        np.stack([np.asarray(it["label_cube"], np.float32) for it in items]),
        pool_pad=pool_pad,
        pool_seeds=[_pool_seed_of(it.get("input_file", i))
                    for i, it in enumerate(items)],
        keep_label_cube=keep_label_cube,
        expect_dims=expect_dims,
    )


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    n_margin: int  # label_batch_size
    n_inter: int  # inter_batch_size
    window_h: int = 24  # input_time_step * input_time_step_nums
    input_time_step: int = 6
    label_time_step: int = 1  # hours between label-cube slices
    begin_lat: float = 18.0
    begin_lon: float = 72.0
    fine_step: float = 0.25
    coarse_step: float = 1.0


def label_grid_dims(scfg: SamplerConfig, coord_spec) -> Tuple[int, int, int]:
    """STATIC (Hl, Wl, Tl) of the label/fine grid.

    The label grid is the output grid (coord_spec.lat_size x lon_size) with
    one slice every label_time_step hours over the window, exactly the
    reference's label sampling domain (physics_dataset.py:334-338) and the
    same derivation the pool sampler's _decode_pool_idx already uses.  Row
    tables (CubeBatch) carry no grid shape; this is the single source."""
    return (coord_spec.lat_size, coord_spec.lon_size,
            scfg.window_h // scfg.label_time_step + 1)


def coarse_grid_dims(scfg: SamplerConfig, coord_spec) -> Tuple[int, int, int]:
    """STATIC (Hc, Wc, Tc) of the coarse NWP grid.

    The coarse grid covers the same bbox at coarse_step spacing
    (1 deg vs 0.25 deg -> 37x65 for the 145x257 study area) with one slice
    every input_time_step hours (tools/cvt_grib_to_nc.py grid; SURVEY 2.2)."""
    r = scfg.fine_step / scfg.coarse_step
    return (int(round((coord_spec.lat_size - 1) * r)) + 1,
            int(round((coord_spec.lon_size - 1) * r)) + 1,
            scfg.window_h // scfg.input_time_step + 1)


def _as_row_table(cube: jnp.ndarray, dims: Tuple[int, int, int], B: int,
                  name: str) -> jnp.ndarray:
    """Normalize a cube argument to the 2-D ``[B*H*W*T, C]`` row table.

    Accepts the production table form (returned as-is) or the legacy
    5-D ``[B, H, W, T, C]`` form (shape-checked against the STATIC dims,
    then flattened in-program -- correct everywhere, but on TPU a runtime
    5-D argument pays the tiled-layout relayout; docs/PERF.md round-3 (k))."""
    if cube.ndim == 2:
        X = dims[0] * dims[1] * dims[2]
        if cube.shape[0] != B * X:
            raise ValueError(
                f"{name} row table has {cube.shape[0]} rows, expected "
                f"B*H*W*T = {B}*{X} for static dims {dims}")
        return cube
    if tuple(cube.shape[1:4]) != tuple(dims):
        raise ValueError(
            f"{name} grid dims {tuple(cube.shape[1:4])} do not match the "
            f"config-derived static dims {dims}")
    return cube.reshape(-1, cube.shape[-1])


def _coriolis_from_lat(lat_deg: jnp.ndarray) -> jnp.ndarray:
    return (2.0 * OMEGA * jnp.sin(lat_deg / 180.0 * jnp.pi))[:, None]


def _inter_points(k4, k5, k6, nwp_cube, Hl: int, Wl: int,
                  scfg: SamplerConfig, coord_spec) -> PointBatch:
    """Continuous collocation points for one window (shared by the iid and
    pool samplers -- identical draws, so switching the margin sampler never
    changes the PDE collocation stream)."""
    ni = scfg.n_inter
    ix = jax.random.uniform(k4, (ni,)) * (Wl - 1)
    iy = jax.random.uniform(k5, (ni,)) * (Hl - 1)
    it = jax.random.randint(k6, (ni,), 0, scfg.window_h + 1)
    i_lon = scfg.begin_lon + ix * scfg.fine_step
    i_lat = scfg.begin_lat + iy * scfg.fine_step
    i_nwp = trilinear_interp_rows(
        nwp_cube, i_lon, i_lat, it.astype(jnp.float32),
        lon0=scfg.begin_lon, dlon=scfg.coarse_step,
        lat0=scfg.begin_lat, dlat=scfg.coarse_step,
        t0=0.0, dt=float(scfg.input_time_step),
    )
    return PointBatch(
        x=(ix * coord_spec.dx).astype(jnp.float32),
        y=(iy * coord_spec.dy).astype(jnp.float32),
        t=(it * 3600.0).astype(jnp.float32),
        f=_coriolis_from_lat(i_lat),
        nwp=i_nwp.astype(jnp.float32),
        labels=jnp.zeros((ni, 6), jnp.float32),
    )


def _inter_points_batched(k4, k5, k6, nwp_tab,
                          scfg: SamplerConfig, coord_spec) -> PointBatch:
    """Batched no-vmap form of :func:`_inter_points` (flat row gathers).

    ``nwp_tab`` is the 2-D ``[B*Hc*Wc*Tc, 6]`` row table (CubeBatch); the
    fine/coarse grid geometry is static (label_grid_dims/coarse_grid_dims)."""
    B = k4.shape[0]
    Hl, Wl, _ = label_grid_dims(scfg, coord_spec)
    ni = scfg.n_inter
    ix = jax.vmap(lambda k: jax.random.uniform(k, (ni,)))(k4) * (Wl - 1)
    iy = jax.vmap(lambda k: jax.random.uniform(k, (ni,)))(k5) * (Hl - 1)
    it = jax.vmap(lambda k: jax.random.randint(k, (ni,), 0, scfg.window_h + 1))(k6)
    i_lon = scfg.begin_lon + ix * scfg.fine_step
    i_lat = scfg.begin_lat + iy * scfg.fine_step
    i_nwp = trilinear_interp_table_batched(
        nwp_tab, coarse_grid_dims(scfg, coord_spec),
        i_lon, i_lat, it.astype(jnp.float32),
        lon0=scfg.begin_lon, dlon=scfg.coarse_step,
        lat0=scfg.begin_lat, dlat=scfg.coarse_step,
        t0=0.0, dt=float(scfg.input_time_step),
    )
    return PointBatch(
        x=(ix * coord_spec.dx).astype(jnp.float32),
        y=(iy * coord_spec.dy).astype(jnp.float32),
        t=(it * 3600.0).astype(jnp.float32),
        f=(2.0 * OMEGA * jnp.sin(i_lat / 180.0 * jnp.pi))[..., None],
        nwp=i_nwp.astype(jnp.float32),
        labels=jnp.zeros((B, ni, 6), jnp.float32),
    )


def sample_window_points(
    key: jax.Array,
    nwp_cube: jnp.ndarray,  # [H, W, T, 6] channel-LAST
    label_cube: jnp.ndarray,  # [Hl, Wl, Tl, 6] channel-LAST
    scfg: SamplerConfig,
    coord_spec,
) -> Tuple[PointBatch, PointBatch]:
    """Sample one window's margin + inter PointBatches on-device.

    Cubes are channel-last (see CubeBatch): the label lookup is one row
    gather and the conditioning interp gathers [N, 6] rows per corner."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    Hl, Wl, Tl = label_cube.shape[0], label_cube.shape[1], label_cube.shape[2]
    nm, ni = scfg.n_margin, scfg.n_inter

    # ---- margin: integer fine-grid points with exact label gather ----
    mx = jax.random.randint(k1, (nm,), 0, Wl)
    my = jax.random.randint(k2, (nm,), 0, Hl)
    # labels exist every label_time_step hours; sample those slots
    # (physics_dataset.py:338 samples integer hours; label_time_step=1 default)
    n_slots = scfg.window_h // scfg.label_time_step + 1
    slot = jax.random.randint(k3, (nm,), 0, n_slots)
    mt = slot * scfg.label_time_step
    flat = (my * Wl + mx) * Tl + slot
    labels = jnp.take(label_cube.reshape(-1, 6), flat, axis=0)  # [nm, 6]

    m_lon = scfg.begin_lon + mx * scfg.fine_step
    m_lat = scfg.begin_lat + my * scfg.fine_step
    m_nwp = trilinear_interp_rows(
        nwp_cube, m_lon.astype(jnp.float32), m_lat.astype(jnp.float32),
        mt.astype(jnp.float32),
        lon0=scfg.begin_lon, dlon=scfg.coarse_step,
        lat0=scfg.begin_lat, dlat=scfg.coarse_step,
        t0=0.0, dt=float(scfg.input_time_step),
    )  # [nm, 6]
    margin = PointBatch(
        x=(mx * coord_spec.dx).astype(jnp.float32),
        y=(my * coord_spec.dy).astype(jnp.float32),
        t=(mt * 3600.0).astype(jnp.float32),
        f=_coriolis_from_lat(m_lat.astype(jnp.float32)),
        nwp=m_nwp.astype(jnp.float32),
        labels=labels.astype(jnp.float32),
    )

    # ---- inter: continuous collocation points ----
    inter = _inter_points(k4, k5, k6, nwp_cube, Hl, Wl, scfg, coord_spec)
    return margin, inter


def sample_window_points_batched(
    keys: jax.Array,  # [B] per-window keys
    nwp_cube: jnp.ndarray,  # [B*Hc*Wc*Tc, 6] row table (or legacy 5-D)
    label_cube: jnp.ndarray,  # [B*Hl*Wl*Tl, 6] row table (or legacy 5-D)
    scfg: SamplerConfig,
    coord_spec,
) -> Tuple[PointBatch, PointBatch]:
    """Batch of windows WITHOUT vmap -> PointBatches with leading [B].

    ``jax.vmap(sample_window_points)`` lowers the gathers ~3.6x slower on
    v5e (scripts/perf_vmap_sampler.py).  This version draws the SAME
    per-window random points (RNG ops vmap elementwise, penalty-free) but
    runs every lookup as a flat ROW gather from the 2-D window-major row
    tables (CubeBatch: batch enters via the absolute row index; the 2-D
    form also avoids the ~1 ms tiled-parameter relayout a runtime 5-D cube
    pays on TPU -- docs/PERF.md round-3 (k)).  Bitwise-equal outputs to
    vmap(sample_window_points) on the 5-D cubes -- tested in
    tests/test_device_sampling.py."""
    B = keys.shape[0]
    ldims = label_grid_dims(scfg, coord_spec)
    label_tab = _as_row_table(label_cube, ldims, B, "label_cube")
    nwp_tab = _as_row_table(nwp_cube, coarse_grid_dims(scfg, coord_spec), B,
                            "nwp_cube")
    Hl, Wl, Tl = ldims
    nm = scfg.n_margin
    ks = jax.vmap(lambda k: jax.random.split(k, 6))(keys)  # [B, 6, key]
    k1, k2, k3 = ks[:, 0], ks[:, 1], ks[:, 2]
    k4, k5, k6 = ks[:, 3], ks[:, 4], ks[:, 5]

    # ---- margin: integer fine-grid points with exact label gather ----
    mx = jax.vmap(lambda k: jax.random.randint(k, (nm,), 0, Wl))(k1)  # [B, nm]
    my = jax.vmap(lambda k: jax.random.randint(k, (nm,), 0, Hl))(k2)
    slot = jax.vmap(lambda k: jax.random.randint(k, (nm,), 0, Tl))(k3)
    mt = slot * scfg.label_time_step
    X = Hl * Wl * Tl
    flat = (my * Wl + mx) * Tl + slot + (jnp.arange(B, dtype=jnp.int32) * X)[:, None]
    labels = jnp.take(label_tab, flat.reshape(-1), axis=0).reshape(B, nm, 6)

    m_lon = scfg.begin_lon + mx * scfg.fine_step
    m_lat = scfg.begin_lat + my * scfg.fine_step
    m_nwp = trilinear_interp_table_batched(
        nwp_tab, coarse_grid_dims(scfg, coord_spec),
        m_lon.astype(jnp.float32), m_lat.astype(jnp.float32),
        mt.astype(jnp.float32),
        lon0=scfg.begin_lon, dlon=scfg.coarse_step,
        lat0=scfg.begin_lat, dlat=scfg.coarse_step,
        t0=0.0, dt=float(scfg.input_time_step),
    )  # [B, nm, 6]
    m_lat_f = m_lat.astype(jnp.float32)
    margin = PointBatch(
        x=(mx * coord_spec.dx).astype(jnp.float32),
        y=(my * coord_spec.dy).astype(jnp.float32),
        t=(mt * 3600.0).astype(jnp.float32),
        f=(2.0 * OMEGA * jnp.sin(m_lat_f / 180.0 * jnp.pi))[..., None],
        nwp=m_nwp.astype(jnp.float32),
        labels=labels.astype(jnp.float32),
    )

    # ---- inter: continuous collocation points ----
    inter = _inter_points_batched(k4, k5, k6, nwp_tab, scfg, coord_spec)
    return margin, inter


def _decode_pool_idx(idx: jnp.ndarray, scfg: SamplerConfig, coord_spec):
    """Flat pool index -> (x, y, slot) on the fine label grid.

    Inverse of the iid sampler's flat encoding ``(y*Wl + x)*Tl + slot``
    (sample_window_points above); the label grid is the output/fine grid
    (coord_spec.lon_size x lat_size) with Tl = window_h/label_time_step + 1
    slots, as in the reference's label sampling (physics_dataset.py:334-338).
    """
    _, Wl, Tl = label_grid_dims(scfg, coord_spec)
    slot = idx % Tl
    rest = idx // Tl
    return rest % Wl, rest // Wl, slot


def _pooled_margin(k1, pool_rows, pool_idx, pool_nwp, scfg: SamplerConfig,
                   coord_spec) -> PointBatch:
    """One window's margin PointBatch from the pre-permuted pool.

    Three contiguous dynamic-slices at one random offset replace the iid
    sampler's nm random HBM row-gathers (sequential bandwidth vs gather
    latency -- the round-3 (i) floor).  ``pool_nwp`` was precomputed once
    per window by attach_pool_nwp with the SAME interpolator the iid
    sampler runs per step."""
    nm = scfg.n_margin
    C = pool_rows.shape[-1]
    X = pool_rows.shape[0] - nm  # un-padded pool length
    off = jax.random.randint(k1, (), 0, X)
    rows = jax.lax.dynamic_slice(pool_rows, (off, 0), (nm, C))
    idx = jax.lax.dynamic_slice(pool_idx, (off,), (nm,))
    cond = jax.lax.dynamic_slice(pool_nwp, (off, 0), (nm, C))
    mx, my, slot = _decode_pool_idx(idx, scfg, coord_spec)
    mt = slot * scfg.label_time_step
    m_lat = (scfg.begin_lat + my * scfg.fine_step).astype(jnp.float32)
    return PointBatch(
        x=(mx * coord_spec.dx).astype(jnp.float32),
        y=(my * coord_spec.dy).astype(jnp.float32),
        t=(mt * 3600.0).astype(jnp.float32),
        f=_coriolis_from_lat(m_lat),
        nwp=cond.astype(jnp.float32),
        labels=rows.astype(jnp.float32),
    )


def sample_window_points_pooled(
    key: jax.Array,
    nwp_cube: jnp.ndarray,  # [H, W, T, 6] channel-LAST coarse cube
    pool_rows: jnp.ndarray,  # [X+nm, 6]
    pool_idx: jnp.ndarray,  # [X+nm] int32
    pool_nwp: jnp.ndarray,  # [X+nm, 6]
    scfg: SamplerConfig,
    coord_spec,
) -> Tuple[PointBatch, PointBatch]:
    """'pool'-sampler counterpart of :func:`sample_window_points`.

    Margin points come from one contiguous chunk of the window's fixed
    uniform permutation (build_pool); inter collocation points are drawn
    EXACTLY as in the iid sampler (same key splits k4..k6), so the PDE
    collocation stream is bitwise-unchanged by the sampler switch."""
    k1, _, _, k4, k5, k6 = jax.random.split(key, 6)
    margin = _pooled_margin(k1, pool_rows, pool_idx, pool_nwp, scfg, coord_spec)
    inter = _inter_points(k4, k5, k6, nwp_cube,
                          coord_spec.lat_size, coord_spec.lon_size,
                          scfg, coord_spec)
    return margin, inter


def sample_window_points_pooled_batched(
    keys: jax.Array,  # [B]
    nwp_cube: jnp.ndarray,  # [B*Hc*Wc*Tc, 6] row table (or legacy 5-D)
    pool_rows: jnp.ndarray,  # [B, X+nm, 6]
    pool_idx: jnp.ndarray,  # [B, X+nm]
    pool_nwp: jnp.ndarray,  # [B, X+nm, 6]
    scfg: SamplerConfig,
    coord_spec,
) -> Tuple[PointBatch, PointBatch]:
    """Batched pooled sampler (leading [B]), same draws as the single form.

    The margin side vmaps cheaply -- vmapped dynamic_slice lowers to B
    contiguous slice-gathers, nothing like the random-row gathers that made
    vmap expensive for the iid sampler; the inter side reuses the shared
    no-vmap batched gathers."""
    nwp_tab = _as_row_table(nwp_cube, coarse_grid_dims(scfg, coord_spec),
                            keys.shape[0], "nwp_cube")
    ks = jax.vmap(lambda k: jax.random.split(k, 6))(keys)  # [B, 6, key]
    margin = jax.vmap(
        lambda k, pr, pi, pn: _pooled_margin(k, pr, pi, pn, scfg, coord_spec)
    )(ks[:, 0], pool_rows, pool_idx, pool_nwp)
    inter = _inter_points_batched(ks[:, 3], ks[:, 4], ks[:, 5], nwp_tab,
                                  scfg, coord_spec)
    return margin, inter


def attach_pool_nwp(cube: CubeBatch, scfg: SamplerConfig, coord_spec,
                    chunk: int = 65536) -> CubeBatch:
    """Fill ``cube.pool_nwp``: NWP conditioning at every pool point, ON DEVICE.

    One chunked pass of the SAME trilinear interpolator the per-step
    sampler uses (ops/interp.py), run once per window when the cube enters
    the device cache (~tens of ms, amortized over the hundreds of steps the
    window is resampled) -- the per-step margin interpolation then
    disappears from the hot program.  Computing on device from the tiny
    coarse cube costs zero extra host->device transfer, unlike shipping a
    host-precomputed [X, 6] array."""
    if cube.pool_rows is None or cube.pool_nwp is not None:
        return cube
    fn = _pool_nwp_fn(scfg, coord_spec, chunk)
    return cube._replace(pool_nwp=fn(cube.nwp_cube, cube.pool_idx))


@functools.lru_cache(maxsize=None)
def _pool_nwp_fn(scfg: SamplerConfig, coord_spec, chunk: int):
    """Cached jitted pool-conditioning program (one compile per geometry,
    reused across every window build)."""

    @jax.jit
    def compute(nwp_cube, pool_idx):
        B, Xpad = pool_idx.shape
        cdims = coarse_grid_dims(scfg, coord_spec)
        nwp_tab = _as_row_table(nwp_cube, cdims, B, "nwp_cube")
        Xc = cdims[0] * cdims[1] * cdims[2]
        npad = (-Xpad) % chunk
        idx_p = jnp.pad(pool_idx, ((0, 0), (0, npad)))
        nchunks = idx_p.shape[1] // chunk

        def one_window(b, idx_b):
            tab_b = jax.lax.dynamic_slice(
                nwp_tab, (b * Xc, 0), (Xc, nwp_tab.shape[-1]))

            def body(carry, ix):
                mx, my, slot = _decode_pool_idx(ix, scfg, coord_spec)
                mt = slot * scfg.label_time_step
                lon = (scfg.begin_lon + mx * scfg.fine_step).astype(jnp.float32)
                lat = (scfg.begin_lat + my * scfg.fine_step).astype(jnp.float32)
                out = trilinear_interp_table(
                    tab_b, cdims, lon, lat, mt.astype(jnp.float32),
                    lon0=scfg.begin_lon, dlon=scfg.coarse_step,
                    lat0=scfg.begin_lat, dlat=scfg.coarse_step,
                    t0=0.0, dt=float(scfg.input_time_step),
                ).astype(jnp.float32)
                return carry, out

            _, outs = jax.lax.scan(body, 0, idx_b.reshape(nchunks, chunk))
            return outs.reshape(nchunks * chunk, -1)[:Xpad]

        return jax.vmap(one_window)(jnp.arange(B, dtype=jnp.int32), idx_p)

    return compute


def make_ds_loss_fn(model, cfg: StepConfig, scfg: SamplerConfig,
                    point_slicer=None):
    """``loss_fn(params, cube_batch, keys [B,...], with_pde)`` with on-device
    sampling; ``keys`` are the per-window PRNG keys (caller splits them, so
    the shard_mapped step can hand each data shard its slice of the SAME
    global key sequence the single-controller step would draw).

    ``point_slicer(point_batch) -> point_batch`` is an optional hook applied
    to the sampled margin/inter sets before the loss: the shard_mapped step
    on a 2-D {data, points} mesh passes a slicer that takes this points
    shard's contiguous chunk, so the decode work splits across the points
    axis while every shard draws the identical global sample (the cube and
    keys are replicated along ``points``)."""
    from deepphysinet_tpu.models.physics_net import PhysicsNet

    pred_loss_fn = build_loss(cfg.prediction_loss, beta=cfg.prediction_beta)

    def loss_fn(params, batch: CubeBatch, keys, with_pde: bool):
        fh_norm = (batch.forecast_h / cfg.forecast_time_period)[:, None]
        tokens = model.apply(params, batch.field, fh_norm, method=PhysicsNet.encode)
        # Sampling runs BATCHED OUTSIDE the vmap: vmapping the gathers costs
        # ~1.3 ms/step on v5e (docs/PERF.md round-3 (i)); the points drawn
        # are bitwise-identical to the per-window form.  Batches carrying a
        # pre-permuted pool (train_cfg.tpu.ds_sampler='pool') use the
        # contiguous-slice sampler instead of the random gathers.
        if batch.pool_rows is not None:
            margin, inter = sample_window_points_pooled_batched(
                keys, batch.nwp_cube, batch.pool_rows, batch.pool_idx,
                batch.pool_nwp, scfg, cfg.coord_spec
            )
        else:
            margin, inter = sample_window_points_batched(
                keys, batch.nwp_cube, batch.label_cube, scfg, cfg.coord_spec
            )
        if point_slicer is not None:
            margin, inter = point_slicer(margin), point_slicer(inter)

        def one_window(tokens_b, fh_b, margin_b, inter_b):
            return _window_losses(
                model, params, tokens_b, fh_b, margin_b, inter_b, cfg, with_pde, pred_loss_fn
            )

        per_window = jax.vmap(one_window)(tokens, fh_norm, margin, inter)
        pred_norm = per_window.pop("_pred_norm")
        labels = margin.labels
        metrics = {k: jnp.mean(v) for k, v in per_window.items()}
        total = metrics["margin_loss"]
        if with_pde:
            total = total + metrics["inter_total"] + metrics["margin_total"]
        metrics["total_loss"] = total
        return total, (metrics, pred_norm, labels)

    return loss_fn


def make_device_sampling_train_step(model, tx, cfg: StepConfig, scfg: SamplerConfig):
    """train_step(state, cube_batch, key, with_pde) with on-device sampling."""
    from deepphysinet_tpu.train.train_step import apply_gradient_update

    loss_fn = make_ds_loss_fn(model, cfg, scfg)

    @functools.partial(jax.jit, static_argnames=("with_pde",), donate_argnums=(0,))
    def train_step(state: TrainState, batch: CubeBatch, key, with_pde: bool):
        keys = jax.random.split(key, batch.field.shape[0])
        (_, (metrics, pred_norm, labels)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch, keys, with_pde)
        new_state, metrics = apply_gradient_update(tx, cfg, state, grads, metrics)
        metrics.update(_variable_metrics(pred_norm, labels, cfg))
        return new_state, metrics

    return train_step


def make_device_sampling_eval_step(model, cfg: StepConfig, scfg: SamplerConfig):
    """``eval_step(params, cube_batch, key, with_pde) -> metrics`` (no update).

    Validation for the device-sampling loop: points are drawn ON-DEVICE from
    the (cached) window cubes with a caller-FIXED key, so repeated
    validations score the same points -- deterministic valid curves at zero
    recurring host cost.  The previous design routed validation through the
    host-sampled ``__getitem__`` path (the reference's dataloader work,
    ~1 s per call), which the device loop paid every log_step and which
    capped e2e fps well below the step rate (docs/PERF.md round-3 (h))."""
    loss_fn = make_ds_loss_fn(model, cfg, scfg)

    @functools.partial(jax.jit, static_argnames=("with_pde",))
    def eval_step(params, batch: CubeBatch, key, with_pde: bool):
        keys = jax.random.split(key, batch.field.shape[0])
        _, (metrics, pred_norm, labels) = loss_fn(params, batch, keys, with_pde)
        metrics.update(_variable_metrics(pred_norm, labels, cfg))
        return metrics

    return eval_step

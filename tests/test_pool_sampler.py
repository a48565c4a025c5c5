"""'pool' device sampler: per-window pre-permuted label pools.

The pool sampler (train_cfg.tpu.ds_sampler='pool') replaces the iid margin
sampler's per-step random HBM row-gathers with contiguous slices of a fixed
per-window permutation (docs/PERF.md round-3: the gather-latency floor).
These tests pin its contract:
  - pool rows/indices are a uniform permutation of the label grid and
    slicing them yields EXACT label values at the decoded coordinates;
  - the inter (PDE collocation) stream is bitwise-identical to the iid
    sampler's for the same key;
  - the device-precomputed pool NWP conditioning equals the per-step
    interpolator at the same points;
  - batched == vmap(single); sharded == single (mesh parity);
  - the train/eval steps run on pooled batches (label_cube=None).
"""

import numpy as np
import jax
import jax.numpy as jnp

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.ops.coords import CoordSpec
from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
from deepphysinet_tpu.train.device_sampling import (
    CubeBatch,
    SamplerConfig,
    attach_pool_nwp,
    build_pool,
    cube_batch_host,
    make_device_sampling_eval_step,
    make_device_sampling_train_step,
    sample_window_points,
    sample_window_points_pooled,
    sample_window_points_pooled_batched,
)
from deepphysinet_tpu.train.optim import build_optimizer
from deepphysinet_tpu.train.train_step import (
    Batch,
    PointBatch,
    StepConfig,
    create_train_state,
)

from tests.test_train_step import FACTORS, META, NET, OBS_CFG

COORD = CoordSpec(lon_size=65, lat_size=37, dx=27000.0, dy=27000.0,
                  pred_t_span=86400.0)
SCFG = SamplerConfig(n_margin=256, n_inter=128, window_h=24, input_time_step=6,
                     begin_lat=18.0, begin_lon=72.0)
Hl, Wl, Tl = 37, 65, 25  # label grid == COORD fine grid, window_h+1 slots


def _window(rng):
    nwp = jnp.asarray(rng.randn(10, 17, 5, 6).astype(np.float32) * 0.1)
    label = jnp.asarray(rng.randn(Hl, Wl, Tl, 6).astype(np.float32) * 0.1)
    return nwp, label


def _pool(label, nm=SCFG.n_margin, seed=7):
    rows, idx = build_pool(np.asarray(label), nm, seed)
    return jnp.asarray(rows), jnp.asarray(idx)


def _pooled_cube(rows, idx, nwp, scfg=SCFG):
    cube = CubeBatch(field=None, forecast_h=None, nwp_cube=nwp[None],
                     label_cube=None, pool_rows=rows[None],
                     pool_idx=idx[None])
    return attach_pool_nwp(cube, scfg, COORD)


def test_build_pool_permutation_and_rows(rng):
    _, label = _window(rng)
    nm = 64
    rows, idx = build_pool(np.asarray(label), nm, seed=3)
    X = Hl * Wl * Tl
    assert rows.shape == (X + nm, 6) and idx.shape == (X + nm,)
    # a permutation of every flat grid index, padded with its own head
    assert sorted(idx[:X].tolist()) == list(range(X))
    np.testing.assert_array_equal(idx[X:], idx[:nm])
    np.testing.assert_array_equal(rows[X:], rows[:nm])
    # row j holds the label values of flat index idx[j]
    flat = np.asarray(label).reshape(X, 6)
    np.testing.assert_array_equal(rows[:X], flat[idx[:X]])


def test_pooled_margin_labels_exact(rng):
    nwp, label = _window(rng)
    rows, idx = _pool(label)
    cube = _pooled_cube(rows, idx, nwp)
    margin, _ = sample_window_points_pooled(
        jax.random.PRNGKey(5), nwp, rows, idx, cube.pool_nwp[0], SCFG, COORD)
    mx = (np.asarray(margin.x) / COORD.dx).astype(int)
    my = (np.asarray(margin.y) / COORD.dy).astype(int)
    mt = (np.asarray(margin.t) / 3600.0).astype(int)
    assert mx.min() >= 0 and mx.max() < Wl
    assert my.min() >= 0 and my.max() < Hl
    assert mt.min() >= 0 and mt.max() < Tl
    # labels are EXACT values at the decoded grid points
    np.testing.assert_array_equal(
        np.asarray(margin.labels), np.asarray(label)[my, mx, mt, :])
    # without-replacement within one draw: all points distinct
    assert len({(a, b, c) for a, b, c in zip(mx, my, mt)}) == SCFG.n_margin
    # Coriolis matches 2*Omega*sin(lat)
    lat = 18.0 + my * 0.25
    f_expect = (2 * 7.292e-5 * np.sin(np.deg2rad(lat))).astype(np.float32)
    np.testing.assert_allclose(np.asarray(margin.f)[:, 0], f_expect,
                               rtol=1e-3)


def test_pooled_sampler_deterministic_and_fresh(rng):
    nwp, label = _window(rng)
    rows, idx = _pool(label)
    cube = _pooled_cube(rows, idx, nwp)
    pn = cube.pool_nwp[0]
    m1, _ = sample_window_points_pooled(
        jax.random.PRNGKey(1), nwp, rows, idx, pn, SCFG, COORD)
    m2, _ = sample_window_points_pooled(
        jax.random.PRNGKey(1), nwp, rows, idx, pn, SCFG, COORD)
    m3, _ = sample_window_points_pooled(
        jax.random.PRNGKey(2), nwp, rows, idx, pn, SCFG, COORD)
    np.testing.assert_array_equal(np.asarray(m1.labels), np.asarray(m2.labels))
    assert not np.array_equal(np.asarray(m1.x), np.asarray(m3.x))


def test_pooled_inter_stream_matches_iid(rng):
    """Switching the margin sampler must not change the PDE collocation
    points: the pooled sampler draws inter points with the iid sampler's
    exact key splits."""
    nwp, label = _window(rng)
    rows, idx = _pool(label)
    cube = _pooled_cube(rows, idx, nwp)
    key = jax.random.PRNGKey(99)
    _, inter_iid = sample_window_points(key, nwp, label, SCFG, COORD)
    _, inter_pool = sample_window_points_pooled(
        key, nwp, rows, idx, cube.pool_nwp[0], SCFG, COORD)
    for name in PointBatch._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(inter_pool, name)),
            np.asarray(getattr(inter_iid, name)), err_msg=f"inter.{name}")


def test_pool_nwp_matches_per_step_interp(rng):
    """attach_pool_nwp's once-per-window conditioning == the interpolator
    the iid sampler runs per step, at the same points."""
    from deepphysinet_tpu.ops.interp import trilinear_interp_rows

    nwp, label = _window(rng)
    rows, idx = _pool(label, nm=32)
    scfg = SamplerConfig(n_margin=32, n_inter=16, window_h=24)
    cube = _pooled_cube(rows, idx, nwp, scfg)
    ix = np.asarray(idx)
    slot = ix % Tl
    rest = ix // Tl
    mx, my = rest % Wl, rest // Wl
    lon = (72.0 + mx * 0.25).astype(np.float32)
    lat = (18.0 + my * 0.25).astype(np.float32)
    expect = trilinear_interp_rows(
        nwp, jnp.asarray(lon), jnp.asarray(lat),
        jnp.asarray(slot.astype(np.float32)),
        lon0=72.0, dlon=1.0, lat0=18.0, dlat=1.0, t0=0.0, dt=6.0)
    # identical math via the same interpolator; the chunked scan program may
    # fuse FMAs differently from the straight-line one -> f32-ulp slack
    np.testing.assert_allclose(np.asarray(cube.pool_nwp[0]),
                               np.asarray(expect), rtol=1e-5, atol=5e-7)


def test_pooled_batched_matches_vmap_single(rng):
    B = 3
    nwps, labels, pools = [], [], []
    for b in range(B):
        nwp, label = _window(rng)
        rows, idx = _pool(label, seed=100 + b)
        nwps.append(nwp)
        labels.append(label)
        pools.append((rows, idx))
    nwp_b = jnp.stack(nwps)
    rows_b = jnp.stack([p[0] for p in pools])
    idx_b = jnp.stack([p[1] for p in pools])
    cube = attach_pool_nwp(
        CubeBatch(field=None, forecast_h=None, nwp_cube=nwp_b,
                  label_cube=None, pool_rows=rows_b, pool_idx=idx_b),
        SCFG, COORD)
    keys = jax.random.split(jax.random.PRNGKey(321), B)
    ref_m, ref_i = jax.vmap(
        lambda n, r, i, pn, k: sample_window_points_pooled(
            k, n, r, i, pn, SCFG, COORD)
    )(nwp_b, rows_b, idx_b, cube.pool_nwp, keys)
    got_m, got_i = sample_window_points_pooled_batched(
        keys, nwp_b, rows_b, idx_b, cube.pool_nwp, SCFG, COORD)
    for name in PointBatch._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(got_m, name)), np.asarray(getattr(ref_m, name)),
            err_msg=f"margin.{name}")
        np.testing.assert_array_equal(
            np.asarray(getattr(got_i, name)), np.asarray(getattr(ref_i, name)),
            err_msg=f"inter.{name}")


def _train_fixtures(rng, B=2):
    model = PhysicsNet(meta_cfg=META, net_cfg=NET)
    specs = norm_specs_from_cfg(OBS_CFG)
    cfg = StepConfig(coord_spec=COORD,
                     obs_specs=tuple(specs[k] for k in OBS_NAME_ORDER),
                     loss_factor=FACTORS)
    scfg = SamplerConfig(n_margin=64, n_inter=32, window_h=24)
    field = jnp.asarray(rng.randn(B, 12, 65).astype(np.float32))
    fh = jnp.asarray(np.linspace(24.0, 48.0, B), jnp.float32)
    nwp = jnp.asarray(rng.randn(B, 10, 17, 5, 6).astype(np.float32) * 0.1)
    label_cf = rng.randn(B, 6, Hl, Wl, Tl).astype(np.float32) * 0.1
    cube = cube_batch_host(field, fh, nwp.transpose(0, 4, 1, 2, 3), label_cf,
                           pool_pad=scfg.n_margin, pool_seeds=[11, 22][:B],
                           keep_label_cube=False)
    assert cube.label_cube is None
    cube = jax.tree.map(jnp.asarray, cube)
    cube = attach_pool_nwp(cube, scfg, COORD)
    dummy = Batch(
        field=cube.field, forecast_h=cube.forecast_h,
        margin=PointBatch(
            x=jnp.zeros((B, 8)), y=jnp.zeros((B, 8)), t=jnp.zeros((B, 8)),
            f=jnp.zeros((B, 8, 1)), nwp=jnp.zeros((B, 8, 6)),
            labels=jnp.zeros((B, 8, 6))),
        inter=PointBatch(
            x=jnp.zeros((B, 4)), y=jnp.zeros((B, 4)), t=jnp.zeros((B, 4)),
            f=jnp.zeros((B, 4, 1)), nwp=jnp.zeros((B, 4, 6)),
            labels=jnp.zeros((B, 4, 6))),
    )
    return model, cfg, scfg, cube, dummy


def test_pooled_train_and_eval_step(rng):
    model, cfg, scfg, cube, dummy = _train_fixtures(rng)
    tx = build_optimizer("Adam", lr=1e-3)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), dummy)
    step = make_device_sampling_train_step(model, tx, cfg, scfg)
    key = jax.random.PRNGKey(42)
    hist = []
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, m = step(state, cube, sub, True)
        hist.append(float(m["total_loss"]))
    assert all(np.isfinite(v) for v in hist)
    assert len({round(v, 6) for v in hist}) > 1  # fresh offsets each step

    eval_step = make_device_sampling_eval_step(model, cfg, scfg)
    k = jax.random.PRNGKey(7919)
    m1 = {k2: float(v) for k2, v in
          eval_step(state.params, cube, k, True).items()}
    m2 = {k2: float(v) for k2, v in
          eval_step(state.params, cube, k, True).items()}
    assert m1 == m2  # fixed key -> deterministic valid metrics


def test_sharded_pooled_step_matches_single(rng):
    """Mesh-sharded pooled step == single-controller pooled step (the same
    global key slicing parity the iid sharded tests pin)."""
    from deepphysinet_tpu.parallel.mesh import MeshConfig, make_mesh
    from deepphysinet_tpu.parallel.sharding import (
        make_sharded_device_sampling_step)
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, cfg, scfg, _, _ = _train_fixtures(rng, B=2)
    B = 8
    rng2 = np.random.RandomState(5)
    field = jnp.asarray(rng2.randn(B, 12, 65).astype(np.float32))
    fh = jnp.asarray(np.full(B, 24.0), jnp.float32)
    nwp = jnp.asarray(rng2.randn(B, 10, 17, 5, 6).astype(np.float32) * 0.1)
    label_cf = rng2.randn(B, 6, Hl, Wl, Tl).astype(np.float32) * 0.1
    cube = cube_batch_host(field, fh, nwp.transpose(0, 4, 1, 2, 3), label_cf,
                           pool_pad=scfg.n_margin,
                           pool_seeds=list(range(B)), keep_label_cube=False)
    cube = jax.tree.map(jnp.asarray, cube)
    cube = attach_pool_nwp(cube, scfg, COORD)
    dummy = Batch(
        field=cube.field, forecast_h=cube.forecast_h,
        margin=PointBatch(
            x=jnp.zeros((B, 8)), y=jnp.zeros((B, 8)), t=jnp.zeros((B, 8)),
            f=jnp.zeros((B, 8, 1)), nwp=jnp.zeros((B, 8, 6)),
            labels=jnp.zeros((B, 8, 6))),
        inter=PointBatch(
            x=jnp.zeros((B, 4)), y=jnp.zeros((B, 4)), t=jnp.zeros((B, 4)),
            f=jnp.zeros((B, 4, 1)), nwp=jnp.zeros((B, 4, 6)),
            labels=jnp.zeros((B, 4, 6))),
    )
    tx = build_optimizer("Adam", lr=1e-3)
    state_a = create_train_state(model, tx, jax.random.PRNGKey(0), dummy)
    state_b = jax.tree.map(lambda x: x.copy(), state_a)

    single = make_device_sampling_train_step(model, tx, cfg, scfg)
    mesh = make_mesh(MeshConfig(data=8, points=1))
    sharded = make_sharded_device_sampling_step(model, tx, cfg, mesh, scfg)
    scube = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), cube)

    key = jax.random.PRNGKey(7)
    losses_a, losses_b = [], []
    for i in range(2):
        key, sub = jax.random.split(key)
        state_a, ma = single(state_a, cube, sub, True)
        state_b, mb = sharded(state_b, scube, sub, True)
        losses_a.append(float(ma["total_loss"]))
        losses_b.append(float(mb["total_loss"]))
    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-5)


def test_sharded_pooled_step_2d_mesh_matches_single(rng):
    """{data:4, points:2} mesh: the points axis splits each window's sampled
    set across 2 shards (parallel/sharding.py::_ds_point_slicer); losses and
    the resulting trajectory match the single-controller pooled step."""
    from deepphysinet_tpu.parallel.mesh import MeshConfig, make_mesh
    from deepphysinet_tpu.parallel.sharding import (
        make_sharded_device_sampling_step)
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, cfg, scfg, _, _ = _train_fixtures(rng, B=2)
    B = 4
    rng2 = np.random.RandomState(9)
    field = jnp.asarray(rng2.randn(B, 12, 65).astype(np.float32))
    fh = jnp.asarray(np.full(B, 24.0), jnp.float32)
    nwp = jnp.asarray(rng2.randn(B, 10, 17, 5, 6).astype(np.float32) * 0.1)
    label_cf = rng2.randn(B, 6, Hl, Wl, Tl).astype(np.float32) * 0.1
    cube = cube_batch_host(field, fh, nwp.transpose(0, 4, 1, 2, 3), label_cf,
                           pool_pad=scfg.n_margin,
                           pool_seeds=list(range(B)), keep_label_cube=False)
    cube = jax.tree.map(jnp.asarray, cube)
    cube = attach_pool_nwp(cube, scfg, COORD)
    dummy = Batch(
        field=cube.field, forecast_h=cube.forecast_h,
        margin=PointBatch(
            x=jnp.zeros((B, 8)), y=jnp.zeros((B, 8)), t=jnp.zeros((B, 8)),
            f=jnp.zeros((B, 8, 1)), nwp=jnp.zeros((B, 8, 6)),
            labels=jnp.zeros((B, 8, 6))),
        inter=PointBatch(
            x=jnp.zeros((B, 4)), y=jnp.zeros((B, 4)), t=jnp.zeros((B, 4)),
            f=jnp.zeros((B, 4, 1)), nwp=jnp.zeros((B, 4, 6)),
            labels=jnp.zeros((B, 4, 6))),
    )
    tx = build_optimizer("Adam", lr=1e-3)
    state_a = create_train_state(model, tx, jax.random.PRNGKey(0), dummy)
    state_b = jax.tree.map(lambda x: x.copy(), state_a)

    single = make_device_sampling_train_step(model, tx, cfg, scfg)
    mesh = make_mesh(MeshConfig(data=4, points=2))
    sharded = make_sharded_device_sampling_step(model, tx, cfg, mesh, scfg)
    scube = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), cube)

    key = jax.random.PRNGKey(17)
    for _ in range(2):
        key, sub = jax.random.split(key)
        state_a, ma = single(state_a, cube, sub, True)
        state_b, mb = sharded(state_b, scube, sub, True)
        for k in ma:
            np.testing.assert_allclose(
                float(ma[k]), float(mb[k]), rtol=2e-4, atol=1e-9, err_msg=k)


def test_2d_mesh_rejects_indivisible_point_counts(rng):
    """n_margin/n_inter not divisible by the points axis -> explicit error."""
    import pytest as _pytest

    from deepphysinet_tpu.parallel.mesh import MeshConfig, make_mesh
    from deepphysinet_tpu.parallel.sharding import (
        make_sharded_device_sampling_step)

    model, cfg, _, _, _ = _train_fixtures(rng, B=2)
    scfg_bad = SamplerConfig(n_margin=63, n_inter=32, window_h=24)
    tx = build_optimizer("Adam", lr=1e-3)
    mesh = make_mesh(MeshConfig(data=4, points=2))
    with _pytest.raises(ValueError, match="not divisible"):
        make_sharded_device_sampling_step(model, tx, cfg, mesh, scfg_bad)

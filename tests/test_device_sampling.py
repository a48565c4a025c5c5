"""On-device sampling path: distribution parity with the host sampler and a
full device-sampled training step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.ops.coords import CoordSpec
from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
from deepphysinet_tpu.train.device_sampling import (
    CubeBatch,
    SamplerConfig,
    make_device_sampling_train_step,
    sample_window_points,
)
from deepphysinet_tpu.train.optim import build_optimizer
from deepphysinet_tpu.train.train_step import StepConfig, create_train_state, Batch, PointBatch

from tests.test_train_step import FACTORS, META, NET, OBS_CFG


COORD = CoordSpec(lon_size=65, lat_size=37, dx=27000.0, dy=27000.0, pred_t_span=86400.0)
SCFG = SamplerConfig(n_margin=256, n_inter=128, window_h=24, input_time_step=6,
                     begin_lat=18.0, begin_lon=72.0)


def _cubes(rng, Hc=10, Wc=17, Hl=37, Wl=65):
    # device cubes are channel-LAST (see CubeBatch)
    nwp = rng.randn(Hc, Wc, 5, 6).astype(np.float32) * 0.1
    label = rng.randn(Hl, Wl, 25, 6).astype(np.float32) * 0.1
    return jnp.asarray(nwp), jnp.asarray(label)


def test_sample_distributions(rng):
    nwp, label = _cubes(rng)
    # coarse grid 10x17 at 1 deg spans the same bbox scaled; use matching geometry
    scfg = SamplerConfig(n_margin=4096, n_inter=2048, window_h=24)
    margin, inter = sample_window_points(jax.random.PRNGKey(0), nwp, label, scfg, COORD)
    mx = np.asarray(margin.x) / COORD.dx
    assert mx.min() >= 0 and mx.max() <= 64
    assert np.all(mx == np.round(mx))  # integer grid points
    mt = np.asarray(margin.t) / 3600.0
    assert set(np.unique(mt)).issubset(set(range(25)))
    ix = np.asarray(inter.x) / COORD.dx
    assert not np.all(ix == np.round(ix))  # continuous
    assert ix.max() <= 64.0

    # Coriolis matches 2*Omega*sin(lat)
    lat = 18.0 + np.asarray(margin.y) / COORD.dy * 0.25
    f_expect = 2 * 7.29e-5 * np.sin(np.deg2rad(lat))
    np.testing.assert_allclose(np.asarray(margin.f)[:, 0], f_expect, rtol=1e-5)


def test_label_gather_exact(rng):
    nwp, label = _cubes(rng)
    margin, _ = sample_window_points(jax.random.PRNGKey(1), nwp, label, SCFG, COORD)
    mx = (np.asarray(margin.x) / COORD.dx).astype(int)
    my = (np.asarray(margin.y) / COORD.dy).astype(int)
    mt = (np.asarray(margin.t) / 3600.0).astype(int)
    lab = np.asarray(label)
    expect = lab[my, mx, mt, :]
    np.testing.assert_allclose(np.asarray(margin.labels), expect, rtol=1e-6)


def test_nwp_interp_matches_host(rng):
    """Device trilinear conditioning values == the host dataset interpolator."""
    from deepphysinet_tpu.data.dataset import _np_trilinear

    nwp, label = _cubes(rng)
    margin, _ = sample_window_points(jax.random.PRNGKey(2), nwp, label, SCFG, COORD)
    lon = 72.0 + np.asarray(margin.x) / COORD.dx * 0.25
    lat = 18.0 + np.asarray(margin.y) / COORD.dy * 0.25
    th = np.arange(5) * 6.0
    lat_grid = 18.0 + np.arange(10) * 1.0
    lon_grid = 72.0 + np.arange(17) * 1.0
    got = np.asarray(margin.nwp)
    for v in range(6):
        host = _np_trilinear(np.asarray(nwp)[..., v], lat_grid, lon_grid, th,
                             lat, lon, np.asarray(margin.t) / 3600.0)
        np.testing.assert_allclose(got[:, v], host, rtol=2e-4, atol=2e-5)


def test_device_sampled_train_step(rng):
    model = PhysicsNet(meta_cfg=META, net_cfg=NET)
    specs = norm_specs_from_cfg(OBS_CFG)
    cfg = StepConfig(coord_spec=COORD,
                     obs_specs=tuple(specs[k] for k in OBS_NAME_ORDER),
                     loss_factor=FACTORS)
    tx = build_optimizer("Adam", lr=1e-3)
    B = 2
    nwp = jnp.asarray(rng.randn(B, 10, 17, 5, 6).astype(np.float32) * 0.1)
    label = jnp.asarray(rng.randn(B, 37, 65, 25, 6).astype(np.float32) * 0.1)
    cube = CubeBatch(
        field=jnp.asarray(rng.randn(B, 12, 65).astype(np.float32)),
        forecast_h=jnp.asarray([24.0, 48.0]),
        # production form: 2-D window-major row tables (see CubeBatch)
        nwp_cube=nwp.reshape(-1, 6), label_cube=label.reshape(-1, 6),
    )
    # init via an equivalent point batch
    dummy = Batch(
        field=cube.field, forecast_h=cube.forecast_h,
        margin=PointBatch(
            x=jnp.zeros((B, 8)), y=jnp.zeros((B, 8)), t=jnp.zeros((B, 8)),
            f=jnp.zeros((B, 8, 1)), nwp=jnp.zeros((B, 8, 6)), labels=jnp.zeros((B, 8, 6))),
        inter=PointBatch(
            x=jnp.zeros((B, 4)), y=jnp.zeros((B, 4)), t=jnp.zeros((B, 4)),
            f=jnp.zeros((B, 4, 1)), nwp=jnp.zeros((B, 4, 6)), labels=jnp.zeros((B, 4, 6))),
    )
    state = create_train_state(model, tx, jax.random.PRNGKey(0), dummy)
    step = make_device_sampling_train_step(model, tx, cfg, SCFG)
    key = jax.random.PRNGKey(42)
    m_hist = []
    for i in range(3):
        key, sub = jax.random.split(key)
        state, m = step(state, cube, sub, True)
        m_hist.append(float(m["total_loss"]))
    assert all(np.isfinite(v) for v in m_hist)
    # fresh randomness each step -> different sampled losses
    assert len({round(v, 6) for v in m_hist}) > 1


def test_device_sampling_eval_step(rng):
    """Validation eval step: deterministic under a fixed key (repeated
    validations score the same on-device-sampled points), fresh points under
    a different key, and no state mutation (pure metrics)."""
    from deepphysinet_tpu.train.device_sampling import make_device_sampling_eval_step

    model = PhysicsNet(meta_cfg=META, net_cfg=NET)
    specs = norm_specs_from_cfg(OBS_CFG)
    cfg = StepConfig(coord_spec=COORD,
                     obs_specs=tuple(specs[k] for k in OBS_NAME_ORDER),
                     loss_factor=FACTORS)
    B = 2
    cube = CubeBatch(
        field=jnp.asarray(rng.randn(B, 12, 65).astype(np.float32)),
        forecast_h=jnp.asarray([24.0, 48.0]),
        nwp_cube=jnp.asarray(
            rng.randn(B * 10 * 17 * 5, 6).astype(np.float32) * 0.1),
        label_cube=jnp.asarray(
            rng.randn(B * 37 * 65 * 25, 6).astype(np.float32) * 0.1),
    )
    dummy = Batch(
        field=cube.field, forecast_h=cube.forecast_h,
        margin=PointBatch(
            x=jnp.zeros((B, 8)), y=jnp.zeros((B, 8)), t=jnp.zeros((B, 8)),
            f=jnp.zeros((B, 8, 1)), nwp=jnp.zeros((B, 8, 6)), labels=jnp.zeros((B, 8, 6))),
        inter=PointBatch(
            x=jnp.zeros((B, 4)), y=jnp.zeros((B, 4)), t=jnp.zeros((B, 4)),
            f=jnp.zeros((B, 4, 1)), nwp=jnp.zeros((B, 4, 6)), labels=jnp.zeros((B, 4, 6))),
    )
    tx = build_optimizer("Adam", lr=1e-3)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), dummy)
    eval_step = make_device_sampling_eval_step(model, cfg, SCFG)

    key = jax.random.PRNGKey(7919)
    m1 = {k: float(v) for k, v in eval_step(state.params, cube, key, True).items()}
    m2 = {k: float(v) for k, v in eval_step(state.params, cube, key, True).items()}
    assert m1 == m2  # fixed key -> identical sampled points -> identical metrics
    assert all(np.isfinite(v) for v in m1.values())
    assert "total_loss" in m1 and "margin_loss" in m1
    m3 = eval_step(state.params, cube, jax.random.PRNGKey(1), True)
    assert float(m3["margin_loss"]) != m1["margin_loss"]


def test_cube_dims_guards(rng):
    """Geometry mismatches fail loudly, not silently.

    The 2-D row tables carry no grid structure, so (a) the samplers reject
    row counts that don't match the config-derived dims, (b) legacy 5-D
    cubes are shape-checked against those dims, and (c) the host cube
    builder's ``expect_dims`` guard catches transposed geometry (equal
    total row count) while the grid shape is still visible."""
    from deepphysinet_tpu.train.device_sampling import (
        cube_batch_host, expected_cube_dims, sample_window_points_batched)

    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    nwp_tab = jnp.zeros((10 * 17 * 5, 6), jnp.float32)
    # (a) wrong row count
    with pytest.raises(ValueError, match="row table"):
        sample_window_points_batched(
            keys, nwp_tab, jnp.zeros((999, 6), jnp.float32), SCFG, COORD)
    # (b) legacy 5-D with mismatched dims
    with pytest.raises(ValueError, match="static dims"):
        sample_window_points_batched(
            keys, nwp_tab, jnp.zeros((1, 65, 37, 25, 6), jnp.float32),
            SCFG, COORD)
    # (c) transposed lat/lon has the SAME total row count -- only the host
    # builder's expect_dims guard can catch it
    with pytest.raises(ValueError, match="sampler geometry"):
        cube_batch_host(
            np.zeros((1, 12, 65), np.float32), np.asarray([24.0], np.float32),
            np.zeros((1, 6, 17, 10, 5), np.float32),
            np.zeros((1, 6, 65, 37, 25), np.float32),
            expect_dims=expected_cube_dims(SCFG, COORD))


def test_pool_config_env_isolation(tmp_path, monkeypatch):
    """The pool soak config must not share or poison the iid config's data
    root through the DPN_FULLSYNTH_DATA env var (review finding): it pins
    its own root during the base-config exec and restores the variable."""
    import os

    import deepphysinet_tpu.data.synthetic as synth
    from deepphysinet_tpu.config import Config

    # config files call ensure_synthetic_tree at exec time; the test only
    # checks path resolution, so skip the (slow) tree generation
    monkeypatch.setattr(synth, "ensure_synthetic_tree",
                        lambda *a, **k: None)
    monkeypatch.setenv("DPN_FULLSYNTH_DATA", str(tmp_path / "iid_root"))
    monkeypatch.setenv("DPN_FULLSYNTH_POOL_DATA", str(tmp_path / "pool_root"))
    import os.path as osp

    cfg_file = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                        "configs", "synthetic_fullscale_pool_cfg.py")
    c = Config.fromfile(cfg_file).config
    assert c["train_cfg"]["tpu"]["ds_sampler"] == "pool"
    assert str(tmp_path / "pool_root") in c["train_cfg"]["train_data"]["input_path"]
    # the override did not leak back into the process env
    assert os.environ["DPN_FULLSYNTH_DATA"] == str(tmp_path / "iid_root")


def test_batched_sampler_matches_vmap(rng):
    """sample_window_points_batched (flat-index gathers, no vmap -- the 3.6x
    TPU fix, docs/PERF.md round-3 (i)) must reproduce
    vmap(sample_window_points) EXACTLY: same per-window RNG draws, same
    gathered elements, same lerp order."""
    from deepphysinet_tpu.train.device_sampling import sample_window_points_batched

    B = 3
    nwp = jnp.asarray(rng.randn(B, 10, 17, 5, 6).astype(np.float32) * 0.1)
    label = jnp.asarray(rng.randn(B, 37, 65, 25, 6).astype(np.float32) * 0.1)
    keys = jax.random.split(jax.random.PRNGKey(123), B)

    ref_m, ref_i = jax.vmap(
        lambda n, l, k: sample_window_points(k, n, l, SCFG, COORD)
    )(nwp, label, keys)
    got_m, got_i = sample_window_points_batched(keys, nwp, label, SCFG, COORD)
    # ...and the production 2-D row-table form must match the legacy 5-D
    # form bitwise (same gathers, batch folded through the absolute row
    # index -- CubeBatch / docs/PERF.md round-3 (k))
    tab_m, tab_i = sample_window_points_batched(
        keys, nwp.reshape(-1, 6), label.reshape(-1, 6), SCFG, COORD)

    for name in PointBatch._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(got_m, name)), np.asarray(getattr(ref_m, name)),
            err_msg=f"margin.{name}")
        np.testing.assert_array_equal(
            np.asarray(getattr(got_i, name)), np.asarray(getattr(ref_i, name)),
            err_msg=f"inter.{name}")
        np.testing.assert_array_equal(
            np.asarray(getattr(tab_m, name)), np.asarray(getattr(ref_m, name)),
            err_msg=f"table margin.{name}")
        np.testing.assert_array_equal(
            np.asarray(getattr(tab_i, name)), np.asarray(getattr(ref_i, name)),
            err_msg=f"table inter.{name}")

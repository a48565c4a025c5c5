"""Trainable kernel path: gradient parity of pde_engine='kernel' (XLA twin on
CPU) against the jax.linearize engine."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.ops.coords import CoordSpec
from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
from deepphysinet_tpu.train.optim import build_optimizer
from deepphysinet_tpu.train.train_step import (
    StepConfig, create_train_state, make_train_step)

from tests.test_train_step import FACTORS, META, NET, OBS_CFG, _make_batch


def _cfg(engine):
    specs = norm_specs_from_cfg(OBS_CFG)
    return StepConfig(
        coord_spec=CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0,
                             pred_t_span=86400.0),
        obs_specs=tuple(specs[k] for k in OBS_NAME_ORDER),
        loss_factor=FACTORS,
        pde_engine=engine,
    )


@pytest.mark.parametrize("engine", ["kernel", "jvp"])
def test_engine_matches_linearize_losses_and_grads(engine):
    model = PhysicsNet(meta_cfg=META, net_cfg=NET)  # f32 compute
    tx = build_optimizer("Adam", lr=1e-3)
    batch = _make_batch(np.random.RandomState(11), B=1, Nm=32, Ni=16)

    results = {}
    for eng in ("linearize", engine):
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
        step = make_train_step(model, tx, _cfg(eng))
        _, m = step(state, batch, with_pde=True)
        results[eng] = {k: float(v) for k, v in m.items()}

    a, b = results["linearize"], results[engine]
    for k in ("total_loss", "inter_total", "margin_total", "grad_norm",
              "margin_loss",
              "inter_montion_u_loss", "inter_gas_loss", "margin_vapor_loss"):
        np.testing.assert_allclose(a[k], b[k], rtol=2e-3, err_msg=k)


@pytest.mark.parametrize("engine", ["kernel", "jvp"])
def test_engine_under_vmap_batch(engine):
    """B > 1 exercises the vmap batching of the kernel/twin/jvp paths."""
    model = PhysicsNet(meta_cfg=META, net_cfg=NET)
    tx = build_optimizer("Adam", lr=1e-3)
    batch = _make_batch(np.random.RandomState(5), B=3, Nm=16, Ni=8)
    state = create_train_state(model, tx, jax.random.PRNGKey(1), batch)
    step = make_train_step(model, tx, _cfg(engine))
    state, m = step(state, batch, with_pde=True)
    assert np.isfinite(float(m["total_loss"]))


def test_nondefault_pe_dims_init_and_step():
    """in_channels != 192 must init and step (pe_dim derived from net_cfg,
    round-1 VERDICT weak item 8: it was hardcoded to 2*3*32)."""
    net = dict(NET, in_channels=96)
    model = PhysicsNet(meta_cfg=META, net_cfg=net)
    tx = build_optimizer("Adam", lr=1e-3)
    batch = _make_batch(np.random.RandomState(7), B=1, Nm=16, Ni=8)
    state = create_train_state(model, tx, jax.random.PRNGKey(2), batch)
    specs = norm_specs_from_cfg(OBS_CFG)
    cfg = StepConfig(
        coord_spec=CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0,
                             pred_t_span=86400.0, n_freqs=96 // 6),
        obs_specs=tuple(specs[k] for k in OBS_NAME_ORDER),
        loss_factor=FACTORS, pde_engine="jvp",
    )
    step = make_train_step(model, tx, cfg)
    state, m = step(state, batch, with_pde=True)
    assert np.isfinite(float(m["total_loss"]))


def test_jvp_engine_rejects_non_mean_norm():
    """The jvp/kernel chain rule supports mean_norm only; other schemes must
    fail loudly at step-build time, not silently produce wrong residuals
    (the trainer also auto-falls-back to linearize for such configs)."""
    bad_obs = {k: dict(v) for k, v in OBS_CFG.items()}
    bad_obs["t2"]["norm_type"] = "min_max"
    specs = norm_specs_from_cfg(bad_obs)
    cfg = StepConfig(
        coord_spec=CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0,
                             pred_t_span=86400.0),
        obs_specs=tuple(specs[k] for k in OBS_NAME_ORDER),
        loss_factor=FACTORS, pde_engine="jvp",
    )
    model = PhysicsNet(meta_cfg=META, net_cfg=NET)
    tx = build_optimizer("Adam", lr=1e-3)
    batch = _make_batch(np.random.RandomState(3), B=1, Nm=16, Ni=8)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, tx, cfg)
    with pytest.raises(NotImplementedError, match="mean_norm"):
        step(state, batch, with_pde=True)

"""End-to-end train-step tests on tiny shapes (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.ops.coords import CoordSpec
from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
from deepphysinet_tpu.train.optim import build_optimizer, set_learning_rate
from deepphysinet_tpu.train.train_step import (
    Batch,
    PointBatch,
    StepConfig,
    create_train_state,
    make_eval_step,
    make_train_step,
)

META = dict(enc_in=65, c_out=32, d_model=32, n_heads=4, e_layers=1, d_ff=32,
            activation="gelu", learnable_token_num=8)
NET = dict(in_channels=192, hidden_channels=32, learnable_token_num=16)

OBS_CFG = {
    "u10": dict(name="u10", norm_factor=[0.1, 3.0], bound=[-500, 500]),
    "v10": dict(name="v10", norm_factor=[-0.1, 3.0], bound=[-500, 500]),
    "pres": dict(name="PSFC", norm_factor=[89741.0, 13296.0], bound=[10000, 500000]),
    "t2": dict(name="t2", norm_factor=[283.5, 15.5], bound=[50, 500]),
    "q2": dict(name="q2", norm_factor=[0.0079, 0.0063], bound=[1e-6, 10]),
    "rio": dict(name="rio", norm_factor=[1.09, 0.15], bound=[1e-6, 10]),
}
FACTORS = dict(sample_factor=1e6, margin_factor=1e6, motion_u_factor=1e3,
               motion_v_factor=1e3, continuous_factor=1e10, energy_factor=1e1,
               vapor_factor=1e14, gas_factor=1e-7)


def _make_batch(rng, B=1, L=12, Nm=32, Ni=16):
    def pts(n, labels=True):
        return PointBatch(
            x=jnp.array(rng.rand(B, n) * 27000 * 256, jnp.float32),
            y=jnp.array(rng.rand(B, n) * 27000 * 144, jnp.float32),
            t=jnp.array(rng.randint(0, 25, (B, n)) * 3600.0, jnp.float32),
            f=jnp.array(rng.rand(B, n, 1) * 1e-4, jnp.float32),
            nwp=jnp.array(rng.randn(B, n, 6) * 0.1, jnp.float32),
            labels=jnp.array(rng.randn(B, n, 6) * 0.1, jnp.float32) if labels else None,
        )

    return Batch(
        field=jnp.array(rng.randn(B, L, 65), jnp.float32),
        forecast_h=jnp.array([24.0] * B),
        margin=pts(Nm),
        inter=pts(Ni),
    )


@pytest.fixture(scope="module")
def setup(rng):
    model = PhysicsNet(meta_cfg=META, net_cfg=NET)
    specs = norm_specs_from_cfg(OBS_CFG)
    obs_specs = tuple(specs[k] for k in OBS_NAME_ORDER)
    coord_spec = CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0,
                           pred_t_span=86400.0)
    cfg = StepConfig(coord_spec=coord_spec, obs_specs=obs_specs, loss_factor=FACTORS)
    tx = build_optimizer("Adam", lr=1e-3, weight_decay=1e-4)
    batch = _make_batch(np.random.RandomState(0))

    # the train step donates its input state, so each test gets a fresh copy
    def make_state():
        return create_train_state(model, tx, jax.random.PRNGKey(0), batch)

    return model, cfg, tx, make_state, batch


def test_data_only_loss_decreases(setup):
    model, cfg, tx, make_state, batch = setup
    state = make_state()
    step = make_train_step(model, tx, cfg)
    state, m0 = step(state, batch, with_pde=False)
    for _ in range(20):
        state, m = step(state, batch, with_pde=False)
    assert float(m["margin_loss"]) < float(m0["margin_loss"])


def test_pde_step_finite(setup):
    model, cfg, tx, make_state, batch = setup
    state = make_state()
    step = make_train_step(model, tx, cfg)
    state, m = step(state, batch, with_pde=True)
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    for k in ("inter_montion_u_loss", "inter_gas_loss", "margin_vapor_loss",
              "inter_total", "margin_total"):
        assert k in m


def test_eval_step_no_update(setup):
    model, cfg, tx, make_state, batch = setup
    state = make_state()
    eval_step = make_eval_step(model, cfg)
    m = eval_step(state.params, batch, with_pde=True)
    assert np.isfinite(float(m["total_loss"]))


def test_grad_clip_applied(setup):
    """Global grad-norm clip at 2.5e7 (interface_physics.py:514)."""
    model, cfg, tx, make_state, batch = setup
    state = make_state()
    step = make_train_step(model, tx, cfg)
    _, m = step(state, batch, with_pde=False)
    assert float(m["grad_norm"]) >= 0.0


def test_lr_injection(setup):
    model, cfg, tx, make_state, batch = setup
    state = make_state()
    opt_state = set_learning_rate(state.opt_state, 5e-4)
    assert float(opt_state.hyperparams["learning_rate"]) == pytest.approx(5e-4)


def test_nonfinite_gradient_guard(setup):
    """A poisoned batch (NaN labels) must not update the parameters."""
    model, cfg, tx, make_state, batch = setup
    state = make_state()
    step = make_train_step(model, tx, cfg)
    bad = batch._replace(
        margin=batch.margin._replace(
            labels=batch.margin.labels.at[0, 0, 0].set(jnp.nan)))
    params_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    state, m = step(state, bad, with_pde=False)
    assert float(m["skipped_nonfinite"]) == 1.0
    for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and a clean batch afterwards trains normally
    state, m = step(state, batch, with_pde=False)
    assert float(m["skipped_nonfinite"]) == 0.0
    assert np.isfinite(float(m["total_loss"]))


def test_configured_pde_loss_is_used(setup):
    """losses.pde_loss.name must change the PDE losses (was silently MSE)."""
    import dataclasses

    model, cfg, tx, make_state, batch = setup
    out = {}
    for name in ("MSELoss", "L1Loss"):
        state = make_state()
        step = make_train_step(model, tx, dataclasses.replace(cfg, pde_loss=name))
        _, m = step(state, batch, with_pde=True)
        out[name] = float(m["inter_gas_loss"])
    assert out["MSELoss"] != out["L1Loss"]


def test_forecast_h_snapping_dist_semantics(setup):
    """forecast_h_snap floors the lead to the window grid before
    normalization (reference dist path, interface_physics.py:996-997):
    identical losses for leads inside one window, different across."""
    import dataclasses

    model, cfg, tx, make_state, batch = setup
    snap_cfg = dataclasses.replace(cfg, forecast_h_snap=24.0)
    state = make_state()
    step = make_eval_step(model, snap_cfg)

    def with_fh(fh):
        return batch._replace(forecast_h=jnp.array([fh], jnp.float32))

    m30 = step(state.params, with_fh(30.0), False)
    m47 = step(state.params, with_fh(47.0), False)  # same 24h window
    m48 = step(state.params, with_fh(48.0), False)  # next window
    assert float(m30["margin_loss"]) == float(m47["margin_loss"])
    assert float(m48["margin_loss"]) != float(m30["margin_loss"])

    # unsnapped: every lead differs
    step_raw = make_eval_step(model, cfg)
    r30 = step_raw(state.params, with_fh(30.0), False)
    r47 = step_raw(state.params, with_fh(47.0), False)
    assert float(r30["margin_loss"]) != float(r47["margin_loss"])


def test_jvp_engine_v6_matches_v4(setup):
    """kernel_version=6 on the 'jvp' engine reproduces v4's losses (same math)."""
    import dataclasses

    model, cfg, tx, make_state, batch = setup
    metrics = {}
    for version in (4, 6):
        vcfg = dataclasses.replace(cfg, pde_engine="jvp", kernel_version=version)
        state = make_state()
        step = make_train_step(model, tx, vcfg)
        state, m = step(state, batch, with_pde=True)
        state, m = step(state, batch, with_pde=True)  # second step: grads flowed
        metrics[version] = {k: float(v) for k, v in m.items()}
    for k, v4 in metrics[4].items():
        v6 = metrics[6][k]
        assert np.isfinite(v6), k
        assert v6 == pytest.approx(v4, rel=2e-4, abs=1e-8), k

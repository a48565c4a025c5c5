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


def test_kernel_engine_matches_linearize_losses_and_grads():
    model = PhysicsNet(meta_cfg=META, net_cfg=NET)  # f32 compute
    tx = build_optimizer("Adam", lr=1e-3)
    batch = _make_batch(np.random.RandomState(11), B=1, Nm=32, Ni=16)

    results = {}
    for engine in ("linearize", "kernel"):
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
        step = make_train_step(model, tx, _cfg(engine))
        _, m = step(state, batch, with_pde=True)
        results[engine] = {k: float(v) for k, v in m.items()}

    a, b = results["linearize"], results["kernel"]
    for k in ("total_loss", "inter_total", "margin_total", "grad_norm",
              "inter_montion_u_loss", "inter_gas_loss", "margin_vapor_loss"):
        np.testing.assert_allclose(a[k], b[k], rtol=2e-3, err_msg=k)


def test_kernel_engine_under_vmap_batch():
    """B > 1 exercises the vmap batching of the kernel/twin path."""
    model = PhysicsNet(meta_cfg=META, net_cfg=NET)
    tx = build_optimizer("Adam", lr=1e-3)
    batch = _make_batch(np.random.RandomState(5), B=3, Nm=16, Ni=8)
    state = create_train_state(model, tx, jax.random.PRNGKey(1), batch)
    step = make_train_step(model, tx, _cfg("kernel"))
    state, m = step(state, batch, with_pde=True)
    assert np.isfinite(float(m["total_loss"]))

"""In-kernel residual assembly: parity with the engine's XLA assembly path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.ops.coords import CoordSpec
from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
from deepphysinet_tpu.ops.residual_kernel import kernel_residual_losses
from deepphysinet_tpu.physics.engine import (
    fused_kernel_fields,
    pde_residual_losses,
    residual_losses_from_fields,
)
from deepphysinet_tpu.train.point_fn import make_phys_fn

from tests.test_train_step import FACTORS, OBS_CFG

META = dict(enc_in=65, c_out=256, d_model=256, n_heads=4, e_layers=1, d_ff=64,
            activation="gelu", learnable_token_num=8)
NET = dict(in_channels=192, hidden_channels=256, learnable_token_num=16)
COORD = CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0,
                  pred_t_span=86400.0)


@pytest.fixture(scope="module")
def setup(rng):
    model = PhysicsNet(meta_cfg=META, net_cfg=NET)
    field = jnp.asarray(rng.randn(1, 12, 65), jnp.float32)
    fh = jnp.array([[0.1]])
    params = model.init(jax.random.PRNGKey(0), field, jnp.ones((4, 192)),
                        jnp.ones((4, 6)), fh)
    tokens = model.apply(params, field, fh, method=PhysicsNet.encode)[0]
    specs = norm_specs_from_cfg(OBS_CFG)
    obs_specs = tuple(specs[k] for k in OBS_NAME_ORDER)
    return model, params, tokens, obs_specs


def _points(rng, n):
    coords = jnp.asarray(
        np.stack([rng.rand(n) * 27000 * 256, rng.rand(n) * 27000 * 144,
                  rng.randint(0, 25, n) * 3600.0], -1), jnp.float32)
    coord_data = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
    f = jnp.asarray(1e-4 * rng.rand(n, 1), jnp.float32)
    return coords, coord_data, f


@pytest.mark.parametrize("n,block_n", [(64, 32), (50, 32)])
def test_matches_xla_assembly(setup, rng, n, block_n):
    """Same decode + same equations, assembled in-kernel vs in XLA.

    n=50 with block_n=32 exercises the padded-tail row masking."""
    model, params, tokens, obs_specs = setup
    coords, coord_data, f = _points(rng, n)
    fore_h = jnp.array([0.1], jnp.float32)

    _, fd = fused_kernel_fields(model, params, tokens, coords, coord_data,
                                fore_h, COORD, obs_specs, with_clip=True,
                                interpret=True)
    ref = residual_losses_from_fields(fd, f, FACTORS)

    got = kernel_residual_losses(model, params, tokens, coords, coord_data,
                                 fore_h, f, COORD, obs_specs, FACTORS,
                                 with_clip=True, interpret=True,
                                 block_n=block_n)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(float(got[k]), float(ref[k]), rtol=1e-4,
                                   err_msg=k)


def test_matches_linearize_engine(setup, rng):
    """End-to-end: in-kernel losses == jax.linearize-path losses."""
    model, params, tokens, obs_specs = setup
    coords, coord_data, f = _points(rng, 64)
    fore_h = jnp.array([0.1], jnp.float32)

    phys_fn = make_phys_fn(model, params, tokens, coord_data, fore_h, COORD,
                           obs_specs, with_clip=True)
    ref = pde_residual_losses(phys_fn, coords, f, FACTORS)
    got = kernel_residual_losses(model, params, tokens, coords, coord_data,
                                 fore_h, f, COORD, obs_specs, FACTORS,
                                 with_clip=True, interpret=True, block_n=32)
    for k in ref:
        np.testing.assert_allclose(float(got[k]), float(ref[k]), rtol=5e-3,
                                   err_msg=k)


def test_engine_dispatch_branches_agree(setup, rng, monkeypatch):
    """engine.fused_residual_losses: every branch agrees.

    v4 always takes the var-major split path (the round-4 re-sweep retired
    its in-kernel-assembly crossover -- scripts/perf_assembly_crossover_v4t);
    it must match a direct in-kernel assembly call.  Non-v4 versions keep the
    crossover dispatch, pinned here with version=6 under a monkeypatched
    threshold.
    """
    from deepphysinet_tpu.physics import engine

    model, params, tokens, obs_specs = setup
    coords, coord_data, f = _points(rng, 64)
    fore_h = jnp.array([0.1], jnp.float32)
    args = (model, params, tokens, coords, coord_data, fore_h, f, COORD,
            obs_specs, FACTORS)
    split = engine.fused_residual_losses(*args, interpret=True)
    fused = kernel_residual_losses(model, params, tokens, coords, coord_data,
                                   fore_h, f, COORD, obs_specs, FACTORS,
                                   interpret=True, block_n=32)
    for k in split:
        np.testing.assert_allclose(float(fused[k]), float(split[k]), rtol=1e-4,
                                   err_msg=k)

    monkeypatch.setattr(engine, "FUSED_ASSEMBLY_MIN_N", 10**9)
    split6 = engine.fused_residual_losses(*args, interpret=True, version=6)
    monkeypatch.setattr(engine, "FUSED_ASSEMBLY_MIN_N", 1)
    fused6 = engine.fused_residual_losses(*args, interpret=True, version=6)
    for k in split6:
        np.testing.assert_allclose(float(fused6[k]), float(split6[k]),
                                   rtol=1e-4, err_msg=k)


def test_no_clip_mode_matches(setup, rng):
    model, params, tokens, obs_specs = setup
    coords, coord_data, f = _points(rng, 32)
    fore_h = jnp.array([0.1], jnp.float32)
    _, fd = fused_kernel_fields(model, params, tokens, coords, coord_data,
                                fore_h, COORD, obs_specs, with_clip=False,
                                interpret=True)
    ref = residual_losses_from_fields(fd, f, FACTORS)
    got = kernel_residual_losses(model, params, tokens, coords, coord_data,
                                 fore_h, f, COORD, obs_specs, FACTORS,
                                 with_clip=False, interpret=True, block_n=32)
    for k in ref:
        np.testing.assert_allclose(float(got[k]), float(ref[k]), rtol=1e-4,
                                   err_msg=k)

"""Packed (vectorized) residual assembly == the [N,1]-column dict assembly.

The packed form exists purely for TPU performance (the dict form's XLA
reverse-AD cost ~1.0 ms of the production step, docs/PERF.md round 4 (c));
these tests pin value and gradient equivalence so the two paths stay
interchangeable.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.ops.coords import CoordSpec
from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
from deepphysinet_tpu.physics.engine import (
    FIELD_KEYS,
    fields_from_primal_tangents,
    packed_physical_from_primal_tangents,
    packed_residual_losses_from_primal_tangents,
    residual_losses_from_fields,
)
from deepphysinet_tpu.train.optim import build_optimizer
from deepphysinet_tpu.train.train_step import (
    Batch,
    PointBatch,
    StepConfig,
    create_train_state,
    make_loss_fn,
)

from tests.test_train_step import FACTORS, META, NET, OBS_CFG, _make_batch


@pytest.fixture(scope="module")
def specs():
    d = norm_specs_from_cfg(OBS_CFG)
    return tuple(d[k] for k in OBS_NAME_ORDER)


def _rand_inputs(n=64, seed=0, wild=True):
    """Random (primal, tang, f); `wild` pushes some rows past the clip bounds."""
    rng = np.random.RandomState(seed)
    primal = rng.randn(n, 6).astype(np.float32) * 0.5
    if wild:
        # guaranteed outside every bound after inverse_norm (|norm| = 1e6)
        primal[:3] = 1e6
        primal[3:5] = -1e6
    tang = rng.randn(3, n, 6).astype(np.float32) * 0.2
    f = (rng.rand(n, 1) * 1e-4).astype(np.float32)
    return jnp.asarray(primal), jnp.asarray(tang), jnp.asarray(f)


def _dict_losses(primal, tang, f, specs, with_clip=True):
    fd = fields_from_primal_tangents(primal, tang, specs, with_clip)
    return residual_losses_from_fields(fd, f, FACTORS)


def test_packed_fields_match_dict(specs):
    primal, tang, _ = _rand_inputs()
    fd = fields_from_primal_tangents(primal, tang, specs, True)
    P, D = packed_physical_from_primal_tangents(primal, tang, specs, True)
    for i, k in enumerate(FIELD_KEYS):
        np.testing.assert_allclose(np.asarray(P[i]), np.asarray(fd.fields[k][:, 0]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)
        for j, ax in enumerate(("x", "y", "t")):
            np.testing.assert_allclose(
                np.asarray(D[j, i]), np.asarray(fd.derivs[k][ax][:, 0]),
                rtol=1e-6, atol=1e-6, err_msg=f"{k}/{ax}")


def test_clip_zeroes_packed_derivs(specs):
    """Where the clip is active the packed derivative is exactly zero."""
    primal, tang, _ = _rand_inputs()
    P, D = packed_physical_from_primal_tangents(primal, tang, specs, True)
    # rows 0..4 of the clipped columns (2..5) are far outside their bounds
    assert np.all(np.asarray(D[:, 2:, :5]) == 0.0)
    # u, v (columns 0, 1) never clip
    assert np.all(np.asarray(D[:, :2, :5]) != 0.0)


@pytest.mark.parametrize("with_clip", [True, False])
def test_packed_losses_match_dict(specs, with_clip):
    primal, tang, f = _rand_inputs(seed=3)
    want = _dict_losses(primal, tang, f, specs, with_clip)
    got = packed_residual_losses_from_primal_tangents(
        primal, tang, f, specs, FACTORS, with_clip=with_clip)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(float(got[k]), float(want[k]),
                                   rtol=1e-5, err_msg=k)


def test_packed_grads_match_dict(specs):
    primal, tang, f = _rand_inputs(seed=7)

    def tot_dict(pt):
        return _dict_losses(pt[0], pt[1], f, specs)["total"]

    def tot_packed(pt):
        return packed_residual_losses_from_primal_tangents(
            pt[0], pt[1], f, specs, FACTORS)["total"]

    gd = jax.grad(tot_dict)((primal, tang))
    gp = jax.grad(tot_packed)((primal, tang))
    for a, b, name in ((gd[0], gp[0], "d/dprimal"), (gd[1], gp[1], "d/dtang")):
        scale = float(jnp.max(jnp.abs(a))) + 1e-30
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5 * scale, err_msg=name)


@pytest.mark.parametrize("engine,interpret", [("jvp", False), ("kernel", True)])
def test_step_losses_and_grads_match(specs, engine, interpret):
    """Full loss_fn with packed_assembly on vs off: same losses, same grads."""
    model = PhysicsNet(meta_cfg=META, net_cfg=NET)
    coord_spec = CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0,
                           pred_t_span=86400.0)
    batch = _make_batch(np.random.RandomState(11))
    tx = build_optimizer("Adam", lr=1e-3)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)

    def run(packed):
        # kernel_version pinned to 4: this test isolates the ASSEMBLY paths,
        # so both runs must use bit-identical kernel arithmetic (v4 unpacked
        # vs v4t packed).  At the v4s default (7) the fold's ~1e-7 value
        # re-association decorrelates near-cancellation gradient leaves
        # (e.g. attention key-projection bias, whose true gradient is ~0 by
        # softmax shift invariance, leaving f32 noise amplified by the 1e14
        # loss factors); kv=7 vs kv=4 parity lives in
        # tests/test_decode_kernel_v4s.py with fold-aware tolerances.
        cfg = StepConfig(coord_spec=coord_spec, obs_specs=specs,
                         loss_factor=FACTORS, pde_engine=engine,
                         kernel_interpret=interpret, packed_assembly=packed,
                         kernel_version=4)
        loss_fn = make_loss_fn(model, cfg)
        (tot, (metrics, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, True)
        return tot, metrics, grads

    t0, m0, g0 = run(False)
    t1, m1, g1 = run(True)
    np.testing.assert_allclose(float(t1), float(t0), rtol=1e-4)
    assert set(m0) == set(m1)
    for k in m0:
        np.testing.assert_allclose(float(m1[k]), float(m0[k]), rtol=1e-4,
                                   atol=1e-8, err_msg=k)
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    for a, b in zip(flat0, flat1):
        scale = float(jnp.max(jnp.abs(a))) + 1e-30
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4 * scale)

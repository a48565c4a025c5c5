"""v4s (kernel_version=7) dpe-free decode kernels: fold + parity coverage.

v4s keeps v6's folded tangent weights (fuse_v6_from_v4: the PE derivative
d/dcn sin(f cn) = f cos(f cn) absorbed into per-window weights) but restores
v4's single wide-K primal matmul: the per-point operand is the channel-major
trig row (trig_cm_inputs) and direction-k tangents consume its contiguous
2F-lane block k.  Values therefore agree with v4/v4t up to float rounding of
the fold (scale folded into weights vs into the dpe operand), NOT bitwise --
tests pin tolerance parity against the v4t kernel, exact-math parity between
the v4s kernel and its own XLA twin, and gradient parity of the custom-vjp
Pallas pair against autodiff of the twin.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepphysinet_tpu.ops.coords import CoordSpec
from deepphysinet_tpu.ops.decode_kernel import (
    DecodeWeights,
    FusedDecodeWeightsV6,
    decode_bwd_kernel_v4s,
    fuse_decode_weights,
    fuse_v6_from_v4,
    fused_decode_jvp_v4s,
    fused_decode_jvp_v4s_kbwd,
    fused_decode_jvp_v4t,
    decode_jvp_xla_v4s,
    pe_and_tangents,
    trig_cm_inputs,
)

N, F, HID, NV = 400, 8, 32, 6  # non-multiple of block_n: tests padding
IN_CH = 6 * F  # 48
TWO_F = 2 * F
BLOCK = 128

SPEC = CoordSpec(lon_size=17, lat_size=9, dx=27000.0, dy=27000.0,
                 pred_t_span=86400.0, n_freqs=F)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(7)

    def r(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)

    w = DecodeWeights(
        w1=r(NV, IN_CH, HID), b1=r(NV, HID), w2=r(NV, HID, HID), b2=r(NV, HID),
        wd=r(NV, IN_CH, HID), bd=r(NV, HID), fh_add=r(NV, HID),
        f1=r(NV, HID, HID), g1=r(NV, HID), f2=r(NV, HID, HID), g2=r(NV, HID),
        wo=r(NV, HID), bo=r(NV))
    fw4 = fuse_decode_weights(w)
    fw6 = fuse_v6_from_v4(fw4, SPEC)

    coords = jnp.asarray(np.stack(
        [rng.rand(N) * 27000 * (SPEC.lon_size - 1),
         rng.rand(N) * 27000 * (SPEC.lat_size - 1),
         rng.randint(0, 25, N) * 3600.0], -1), jnp.float32)
    cd_pe = r(N, IN_CH)
    ref = r(N, NV)
    return fw4, fw6, coords, cd_pe, ref


def test_trig_cm_layout_matches_channel_major_perm(inputs):
    """pe_cm block c == [sin(fb cn_c) | cos(fb cn_c)] and equals the
    channel-major permutation of pe_and_tangents' pe."""
    from deepphysinet_tpu.ops.decode_kernel import channel_major_perm

    _, _, coords, _, _ = inputs
    pe_cm = trig_cm_inputs(coords, SPEC)
    pe, _dpe = pe_and_tangents(coords, SPEC)
    perm = channel_major_perm(IN_CH, 3)
    np.testing.assert_allclose(np.asarray(pe_cm), np.asarray(pe[:, perm]),
                               rtol=1e-6, atol=1e-7)


def test_fold_matches_v4t_kernel(inputs):
    """v4s kernel == v4t kernel up to the fold's float re-association
    (f32 compute dtype so only the scale-fold rounding differs)."""
    fw4, fw6, coords, cd_pe, ref = inputs
    pe, dpe = pe_and_tangents(coords, SPEC)
    pe_cm = trig_cm_inputs(coords, SPEC)
    p4, t4 = fused_decode_jvp_v4t(fw4, pe, dpe, cd_pe, ref.T, block_n=BLOCK,
                                  interpret=True, compute_dtype=jnp.float32)
    ps, ts = fused_decode_jvp_v4s(fw6, pe_cm, cd_pe, ref.T, block_n=BLOCK,
                                  interpret=True, compute_dtype=jnp.float32)
    assert ps.shape == (NV, N) and ts.shape == (3, NV, N)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(p4),
                               rtol=2e-4, atol=2e-5)
    # tangents carry the tiny folded scales (1/(dx*(lon-1)) etc.); compare
    # with an absolute floor scaled to their magnitude
    tmag = float(jnp.max(jnp.abs(t4)))
    np.testing.assert_allclose(np.asarray(ts), np.asarray(t4),
                               rtol=2e-4, atol=2e-4 * tmag)


def test_kernel_matches_xla_twin(inputs):
    """v4s kernel (interpret) == decode_jvp_xla_v4s (same fold, same dtype)."""
    _, fw6, coords, cd_pe, ref = inputs
    pe_cm = trig_cm_inputs(coords, SPEC)
    p_k, t_k = fused_decode_jvp_v4s(fw6, pe_cm, cd_pe, ref.T, block_n=BLOCK,
                                    interpret=True)
    p_x, t_x = decode_jvp_xla_v4s(fw6, pe_cm, cd_pe, ref.T)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_x),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_x),
                               rtol=2e-2, atol=2e-2 * float(jnp.max(jnp.abs(t_x))))


def test_bwd_kernel_matches_twin_grads(inputs):
    """decode_bwd_kernel_v4s == jax.grad of the XLA twin (f32 compute)."""
    _, fw6, coords, cd_pe, ref = inputs
    pe_cm = trig_cm_inputs(coords, SPEC)
    rng = np.random.RandomState(11)
    g_p = jnp.asarray(rng.randn(NV, N).astype(np.float32))
    g_t = jnp.asarray(rng.randn(3, NV, N).astype(np.float32))

    gk = decode_bwd_kernel_v4s(fw6, pe_cm, cd_pe, g_p, g_t, block_n=BLOCK,
                               interpret=True, compute_dtype=jnp.float32)

    def scalar(w):
        p, t = decode_jvp_xla_v4s(w, pe_cm, cd_pe, jnp.zeros_like(g_p),
                                  jnp.float32)
        return jnp.sum(p * g_p) + jnp.sum(t * g_t)

    gx = jax.grad(scalar)(fw6)
    for name in FusedDecodeWeightsV6._fields:
        a, b = np.asarray(getattr(gk, name)), np.asarray(getattr(gx, name))
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4 * scale,
                                   err_msg=name)


def test_custom_vjp_matches_twin_autodiff(inputs):
    """jax.grad through the Pallas custom-vjp pair (interpret) == jax.grad
    through the plain XLA twin (f32 compute to avoid bf16 slack)."""
    _, fw6, coords, cd_pe, ref = inputs
    pe_cm = trig_cm_inputs(coords, SPEC)

    def loss_k(fw):
        p, t = fused_decode_jvp_v4s_kbwd(fw, pe_cm, cd_pe, ref.T,
                                         BLOCK, jnp.float32, True)
        return jnp.sum(jnp.sin(p)) + jnp.sum(t * t)

    def loss_x(fw):
        p, t = decode_jvp_xla_v4s(fw, pe_cm, cd_pe, ref.T, jnp.float32)
        return jnp.sum(jnp.sin(p)) + jnp.sum(t * t)

    gk = jax.grad(loss_k)(fw6)
    gx = jax.grad(loss_x)(fw6)
    for name in FusedDecodeWeightsV6._fields:
        a, b = np.asarray(getattr(gk, name)), np.asarray(getattr(gx, name))
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4 * scale,
                                   err_msg=name)


def test_ref_cotangent_identity(inputs):
    """d o / d ref_t is the identity: the ref_t cotangent is g_primal_t."""
    _, fw6, coords, cd_pe, ref = inputs
    pe_cm = trig_cm_inputs(coords, SPEC)

    def f(ref_t):
        p, _ = fused_decode_jvp_v4s_kbwd(fw6, pe_cm, cd_pe, ref_t,
                                         BLOCK, jnp.bfloat16, True)
        return jnp.sum(p * jnp.arange(p.size).reshape(p.shape))

    g = jax.grad(f)(ref.T)
    expect = jnp.arange(NV * N, dtype=jnp.float32).reshape(NV, N)
    assert jnp.array_equal(g, expect)


def test_cpu_fallback_matches_interpret(inputs):
    """Off-TPU non-interpret path (XLA twin) agrees with the kernels."""
    _, fw6, coords, cd_pe, ref = inputs
    pe_cm = trig_cm_inputs(coords, SPEC)
    p_k, t_k = fused_decode_jvp_v4s(fw6, pe_cm, cd_pe, ref.T,
                                    block_n=BLOCK, interpret=True)
    p_x, t_x = fused_decode_jvp_v4s_kbwd(fw6, pe_cm, cd_pe, ref.T,
                                         BLOCK, jnp.bfloat16, False)
    assert jnp.allclose(p_k, p_x, atol=5e-2, rtol=5e-2)
    assert jnp.allclose(t_k, t_x, atol=5e-2 * float(jnp.max(jnp.abs(t_x)) + 1e-6),
                        rtol=5e-2)


# ---------------------------------------------------------------------------
# Engine / training-step level
# ---------------------------------------------------------------------------

def test_fused_residual_losses_v7_matches_v4():
    """fused_residual_losses(version=7) == version=4 within fold tolerance."""
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import coriolis
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.physics.engine import fused_residual_losses
    from tests.test_train_step import FACTORS, META, NET, OBS_CFG

    rng = np.random.RandomState(3)
    specs = norm_specs_from_cfg(OBS_CFG)
    obs_specs = tuple(specs[k] for k in OBS_NAME_ORDER)
    coord = CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0,
                      pred_t_span=86400.0)
    model = PhysicsNet(meta_cfg=META, net_cfg=NET)
    field = jnp.asarray(rng.randn(1, 12, META["enc_in"]), jnp.float32)
    fh = jnp.array([[0.1]])
    n = 200
    params = model.init(jax.random.PRNGKey(0), field,
                        jnp.ones((4, NET["in_channels"])), jnp.ones((4, 6)), fh)
    tokens = model.apply(params, field, fh, method=PhysicsNet.encode)[0]
    coords = jnp.asarray(np.stack(
        [rng.rand(n) * 27000 * 256, rng.rand(n) * 27000 * 144,
         rng.randint(0, 25, n) * 3600.0], -1), jnp.float32)
    coord_data = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
    cor = coriolis(jnp.asarray(rng.rand(n) * 50 + 10, jnp.float32))
    fore_h = jnp.array([0.1], jnp.float32)

    out = {}
    for version in (4, 7):
        out[version] = fused_residual_losses(
            model, params, tokens, coords, coord_data, fore_h, cor,
            coord, obs_specs, FACTORS, interpret=True, version=version)
    for k, v4 in out[4].items():
        np.testing.assert_allclose(float(out[7][k]), float(v4), rtol=5e-3,
                                   err_msg=k)


def test_train_step_v7_matches_v4():
    """Full kernel-engine training step with kernel_version=7 (interpret):
    losses/metrics match kernel_version=4 within fold tolerance."""
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import (
        StepConfig, create_train_state, make_train_step)
    from tests.test_train_step import FACTORS, META, NET, OBS_CFG, _make_batch

    specs = norm_specs_from_cfg(OBS_CFG)
    model = PhysicsNet(meta_cfg=META, net_cfg=NET)
    tx = build_optimizer("Adam", lr=1e-3)
    batch = _make_batch(np.random.RandomState(11), B=1, Nm=32, Ni=16)

    results = {}
    for kv in (4, 7):
        cfg = StepConfig(
            coord_spec=CoordSpec(lon_size=257, lat_size=145, dx=27000.0,
                                 dy=27000.0, pred_t_span=86400.0),
            obs_specs=tuple(specs[k] for k in OBS_NAME_ORDER),
            loss_factor=FACTORS, pde_engine="kernel", kernel_interpret=True,
            kernel_version=kv)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
        step = make_train_step(model, tx, cfg)
        _, m = step(state, batch, with_pde=True)
        results[kv] = {k: float(v) for k, v in m.items()}

    for k in ("total_loss", "inter_total", "margin_total", "grad_norm",
              "margin_loss", "inter_montion_u_loss", "inter_gas_loss",
              "margin_vapor_loss"):
        np.testing.assert_allclose(results[7][k], results[4][k], rtol=5e-3,
                                   err_msg=k)

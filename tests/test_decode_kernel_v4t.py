"""Var-major ([6, N]-output) v4 decode kernels: parity with the [N, 6] form.

v4t is a pure LAYOUT variant of the v4 collapsed-algebra kernels
(ops/decode_kernel.py): identical traced math per variable, but each
variable's lane-major row is written to a sublane slot of ``[6, N]`` /
``[3, 6, N]`` outputs instead of being relayout-stacked into ``[N, 6]``
columns, and the backward kernel accepts var-major cotangents (transposing
the tiny [6, Nb] blocks in VMEM).  Parity must therefore be BITWISE in
interpret mode.  The engine-level test pins the var-major training path
(train_step var_major flag) against the jvp engine.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepphysinet_tpu.ops.decode_kernel import (
    FusedDecodeWeights,
    decode_bwd_kernel_v4,
    decode_bwd_kernel_v4t,
    fused_decode_jvp_v4,
    fused_decode_jvp_v4t,
    fused_decode_jvp_v4_kbwd,
    fused_decode_jvp_v4t_kbwd,
)

N, IN_CH, HID, NV = 400, 48, 32, 6  # non-multiple of block_n: tests padding
CH = IN_CH // 3
BLOCK = 128


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(7)

    def r(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)

    fw = FusedDecodeWeights(
        w1=r(NV, IN_CH, HID), w1c=r(NV, 3, CH, HID), b1=r(NV, HID),
        w2f1=r(NV, HID, HID), wdf1=r(NV, IN_CH, HID), rbias=r(NV, HID),
        fw2=r(NV, HID), w2wo=r(NV, HID), wdwo=r(NV, IN_CH), obias=r(NV))
    return fw, r(N, IN_CH), r(3, N, CH), r(N, IN_CH), r(N, 6)


def test_forward_bitwise_parity(inputs):
    fw, pe, dpe, cd_pe, ref = inputs
    p4, t4 = fused_decode_jvp_v4(fw, pe, dpe, cd_pe, ref,
                                 block_n=BLOCK, interpret=True)
    p4t, t4t = fused_decode_jvp_v4t(fw, pe, dpe, cd_pe, ref.T,
                                    block_n=BLOCK, interpret=True)
    assert p4t.shape == (NV, N) and t4t.shape == (3, NV, N)
    assert jnp.array_equal(p4.T, p4t)
    assert jnp.array_equal(t4.transpose(0, 2, 1), t4t)


def test_bwd_kernel_bitwise_parity(inputs):
    fw, pe, dpe, cd_pe, ref = inputs
    rng = np.random.RandomState(11)
    g_p = jnp.asarray(rng.randn(N, NV).astype(np.float32))
    g_t = jnp.asarray(rng.randn(3, N, NV).astype(np.float32))
    g4 = decode_bwd_kernel_v4(fw, pe, dpe, cd_pe, g_p, g_t,
                              block_n=BLOCK, interpret=True)
    g4t = decode_bwd_kernel_v4t(fw, pe, dpe, cd_pe, g_p.T,
                                g_t.transpose(0, 2, 1),
                                block_n=BLOCK, interpret=True)
    for name in FusedDecodeWeights._fields:
        a, b = getattr(g4, name), getattr(g4t, name)
        assert jnp.array_equal(a, b), name


def test_custom_vjp_gradient_parity(inputs):
    fw, pe, dpe, cd_pe, ref = inputs

    def loss4(fw):
        p, t = fused_decode_jvp_v4_kbwd(fw, pe, dpe, cd_pe, ref,
                                        BLOCK, jnp.bfloat16, True)
        return jnp.sum(jnp.sin(p)) + jnp.sum(t * t)

    def loss4t(fw):
        p, t = fused_decode_jvp_v4t_kbwd(fw, pe, dpe, cd_pe, ref.T,
                                         BLOCK, jnp.bfloat16, True)
        return jnp.sum(jnp.sin(p)) + jnp.sum(t * t)

    g4 = jax.grad(loss4)(fw)
    g4t = jax.grad(loss4t)(fw)
    for name in FusedDecodeWeights._fields:
        a, b = getattr(g4, name), getattr(g4t, name)
        assert jnp.array_equal(a, b), name


def test_ref_cotangent_identity(inputs):
    """d o / d ref is the identity: the ref_t cotangent is g_primal_t."""
    fw, pe, dpe, cd_pe, ref = inputs

    def f(ref_t):
        p, _ = fused_decode_jvp_v4t_kbwd(fw, pe, dpe, cd_pe, ref_t,
                                         BLOCK, jnp.bfloat16, True)
        return jnp.sum(p * jnp.arange(p.size).reshape(p.shape))

    g = jax.grad(f)(ref.T)
    expect = jnp.arange(NV * N, dtype=jnp.float32).reshape(NV, N)
    assert jnp.array_equal(g, expect)


def test_cpu_fallback_matches_interpret(inputs):
    """Off-TPU non-interpret path (XLA twin) agrees with the kernels."""
    fw, pe, dpe, cd_pe, ref = inputs
    p_k, t_k = fused_decode_jvp_v4t(fw, pe, dpe, cd_pe, ref.T,
                                    block_n=BLOCK, interpret=True)
    p_x, t_x = fused_decode_jvp_v4t_kbwd(fw, pe, dpe, cd_pe, ref.T,
                                         BLOCK, jnp.bfloat16, False)
    assert jnp.allclose(p_k, p_x, atol=5e-2, rtol=5e-2)
    assert jnp.allclose(t_k, t_x, atol=5e-2, rtol=5e-2)


# ---------------------------------------------------------------------------
# Primal-only var-major decode (the forward inference/eval hot op)
# ---------------------------------------------------------------------------

def test_primal_kernel_matches_xla_twin(inputs):
    """decode_primal_v4t (interpret) == decode_xla_v4t_primal == v4 primal.T."""
    from deepphysinet_tpu.ops.decode_kernel import (
        decode_primal_v4t, decode_xla_v4_primal, decode_xla_v4t_primal)

    fw, pe, _dpe, cd_pe, ref = inputs
    p_k = decode_primal_v4t(fw, pe, cd_pe, ref.T, block_n=BLOCK,
                            interpret=True, compute_dtype=jnp.float32)
    p_t = decode_xla_v4t_primal(fw, pe, cd_pe, ref.T, jnp.float32)
    p_4 = decode_xla_v4_primal(fw, pe, cd_pe, ref, jnp.float32)
    assert p_k.shape == (NV, N)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_t),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_4).T,
                               rtol=2e-5, atol=2e-6)


def test_primal_kernel_is_jvp_primal(inputs):
    """The primal-only kernel reproduces the training kernel's primal rows."""
    from deepphysinet_tpu.ops.decode_kernel import decode_primal_v4t

    fw, pe, dpe, cd_pe, ref = inputs
    p_jvp, _t = fused_decode_jvp_v4t(fw, pe, dpe, cd_pe, ref.T,
                                     block_n=BLOCK, interpret=True)
    p_prim = decode_primal_v4t(fw, pe, cd_pe, ref.T, block_n=BLOCK,
                               interpret=True)
    assert jnp.array_equal(p_prim, p_jvp)


def test_collapsed_decode_t_matches_collapsed_decode():
    """Engine level: collapsed_decode_t == collapsed_decode.T (both backends)."""
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.physics.engine import (
        collapsed_decode, collapsed_decode_t)

    rng = np.random.RandomState(3)
    meta = dict(enc_in=65, c_out=256, d_model=256, n_heads=4, e_layers=1,
                d_ff=64, activation="gelu", learnable_token_num=8)
    net = dict(in_channels=192, hidden_channels=256, learnable_token_num=16)
    coord = CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0,
                      pred_t_span=86400.0)
    model = PhysicsNet(meta_cfg=meta, net_cfg=net)
    field = jnp.asarray(rng.randn(1, 12, 65), jnp.float32)
    fh = jnp.array([[0.1]])
    params = model.init(jax.random.PRNGKey(0), field, jnp.ones((4, 192)),
                        jnp.ones((4, 6)), fh)
    tokens = model.apply(params, field, fh, method=PhysicsNet.encode)[0]

    n = 200  # non-multiple of the kernel block: tests padding + trim
    coords = jnp.asarray(
        np.stack([rng.rand(n) * 27000 * 256, rng.rand(n) * 27000 * 144,
                  rng.randint(0, 25, n) * 3600.0], -1), jnp.float32)
    coord_data = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
    fore_h = jnp.array([0.1], jnp.float32)

    ref = collapsed_decode(model, params, tokens, coords, coord_data,
                           fore_h, coord)
    got_x = collapsed_decode_t(model, params, tokens, coords, coord_data,
                               fore_h, coord, use_kernel=False)
    got_k = collapsed_decode_t(model, params, tokens, coords, coord_data,
                               fore_h, coord, use_kernel=True, interpret=True)
    assert got_x.shape == (6, n) and got_k.shape == (6, n)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(ref).T,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(ref).T,
                               rtol=2e-4, atol=2e-5)


def test_inverse_norm_stack_t_matches():
    """inverse_norm_stack_t([6,N]) == inverse_norm_stack([N,6]).T exactly."""
    from deepphysinet_tpu.ops.normalization import (
        OBS_NAME_ORDER, norm_specs_from_cfg)
    from deepphysinet_tpu.train.point_fn import (
        inverse_norm_stack, inverse_norm_stack_t)
    from tests.test_train_step import OBS_CFG

    specs = norm_specs_from_cfg(OBS_CFG)
    obs_specs = tuple(specs[k] for k in OBS_NAME_ORDER)
    rng = np.random.RandomState(5)
    # large magnitudes so the clip bounds actually engage for pres/t2/q2/rio
    out = jnp.asarray(rng.randn(6, 97) * 40.0, jnp.float32)
    for with_clip in (False, True):
        a = inverse_norm_stack_t(out, obs_specs, with_clip=with_clip)
        b = inverse_norm_stack(out.T, obs_specs, with_clip=with_clip)
        assert a.shape == (6, 97)
        assert jnp.array_equal(a, b.T), f"with_clip={with_clip}"

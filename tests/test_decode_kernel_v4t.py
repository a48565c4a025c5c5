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

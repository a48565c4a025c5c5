"""Fused decode kernel: parity with the jax.linearize engine (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.ops.coords import CoordSpec, encode_coord
from deepphysinet_tpu.ops.decode_kernel import (
    extract_decode_weights,
    fused_decode_jvp,
    pe_and_tangents,
)
from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
from deepphysinet_tpu.physics.engine import (
    fused_kernel_fields,
    linearized_fields,
    pde_residual_losses,
    residual_losses_from_fields,
)
from deepphysinet_tpu.train.point_fn import make_phys_fn

from tests.test_train_step import FACTORS, OBS_CFG

META = dict(enc_in=65, c_out=256, d_model=256, n_heads=4, e_layers=1, d_ff=64,
            activation="gelu", learnable_token_num=8)
NET = dict(in_channels=192, hidden_channels=256, learnable_token_num=16)
COORD = CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0, pred_t_span=86400.0)


@pytest.fixture(scope="module")
def setup(rng):
    model = PhysicsNet(meta_cfg=META, net_cfg=NET)
    field = jnp.asarray(rng.randn(1, 12, 65), jnp.float32)
    fh = jnp.array([[0.1]])
    pe = jnp.ones((4, 192))
    cd = jnp.ones((4, 6))
    params = model.init(jax.random.PRNGKey(0), field, pe, cd, fh)
    tokens = model.apply(params, field, fh, method=PhysicsNet.encode)[0]
    return model, params, tokens


def test_pe_and_tangents_match_autodiff(rng):
    coords = jnp.asarray(rng.rand(16, 3) * np.array([27000 * 200, 27000 * 100, 80000]),
                         jnp.float32)
    pe, dpe = pe_and_tangents(coords, COORD)
    ref_pe = encode_coord(coords[:, 0], coords[:, 1], coords[:, 2], COORD)
    np.testing.assert_allclose(np.asarray(pe), np.asarray(ref_pe), rtol=1e-5, atol=1e-5)

    def f(c):
        return encode_coord(c[:, 0], c[:, 1], c[:, 2], COORD)

    for k in range(3):
        tangent = jnp.zeros_like(coords).at[:, k].set(1.0)
        _, jv = jax.jvp(f, (coords,), (tangent,))
        jv = np.asarray(jv)
        # direction-k derivative is nonzero only on channel-k features
        # (dense index = (f*2 + s)*3 + c); dpe is the compact [N, 2F] form
        np.testing.assert_allclose(np.asarray(dpe[k]), jv[:, k::3], rtol=1e-4, atol=1e-6)
        mask = np.ones(jv.shape[1], bool)
        mask[k::3] = False
        np.testing.assert_allclose(jv[:, mask], 0.0, atol=1e-7)


def test_fused_decode_matches_linearize(setup, rng):
    """Kernel primal+tangents == jax.linearize through the real decode (f32)."""
    model, params, tokens = setup
    n = 64
    coords = jnp.asarray(
        np.stack([rng.rand(n) * 27000 * 256, rng.rand(n) * 27000 * 144,
                  rng.randint(0, 25, n) * 3600.0], -1), jnp.float32)
    coord_data = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
    fore_h = jnp.array([0.1], jnp.float32)

    # reference: linearize through the decode in *normalized* units
    def norm_fn(c):
        pe = encode_coord(c[:, 0], c[:, 1], c[:, 2], COORD)
        return model.apply(params, tokens, pe, coord_data, fore_h,
                           method=PhysicsNet.decode)

    primal_ref, lin = jax.linearize(norm_fn, coords)
    tang_ref = [lin(jnp.zeros_like(coords).at[:, k].set(1.0)) for k in range(3)]

    weights = extract_decode_weights(model, params, tokens, fore_h)
    pe, dpe = pe_and_tangents(coords, COORD)
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe

    cd_pe = sinecos_pe(coord_data, make_freq_bands(16, 4.0), include_input=False)
    primal, tang = fused_decode_jvp(weights, pe, dpe, cd_pe, coord_data,
                                    block_n=32, interpret=True,
                                    compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(primal), np.asarray(primal_ref),
                               rtol=2e-4, atol=2e-5)
    for k in range(3):
        np.testing.assert_allclose(np.asarray(tang[k]), np.asarray(tang_ref[k]),
                                   rtol=2e-3, atol=1e-7)


def test_fused_residual_losses_match_engine(setup, rng):
    """End-to-end: kernel-path residual losses == linearize-path losses."""
    model, params, tokens = setup
    specs = norm_specs_from_cfg(OBS_CFG)
    obs_specs = tuple(specs[k] for k in OBS_NAME_ORDER)
    n = 64
    coords = jnp.asarray(
        np.stack([rng.rand(n) * 27000 * 256, rng.rand(n) * 27000 * 144,
                  rng.randint(0, 25, n) * 3600.0], -1), jnp.float32)
    coord_data = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
    fore_h = jnp.array([0.1], jnp.float32)
    f = jnp.asarray(1e-4 * rng.rand(n, 1), jnp.float32)

    phys_fn = make_phys_fn(model, params, tokens, coord_data, fore_h, COORD,
                           obs_specs, with_clip=True)
    ref_losses = pde_residual_losses(phys_fn, coords, f, FACTORS)

    _, fd = fused_kernel_fields(model, params, tokens, coords, coord_data,
                                fore_h, COORD, obs_specs, with_clip=True,
                                interpret=True)
    got_losses = residual_losses_from_fields(fd, f, FACTORS)
    for k in ref_losses:
        np.testing.assert_allclose(float(got_losses[k]), float(ref_losses[k]),
                                   rtol=5e-3, err_msg=k)


def test_fused_decode_v3_matches_linearize(setup, rng):
    """Kernel v3 (in-kernel PE, channel-major weights) == jax.linearize."""
    from deepphysinet_tpu.ops.decode_kernel import fused_decode_jvp_v3

    model, params, tokens = setup
    n = 64
    coords = jnp.asarray(
        np.stack([rng.rand(n) * 27000 * 256, rng.rand(n) * 27000 * 144,
                  rng.randint(0, 25, n) * 3600.0], -1), jnp.float32)
    coord_data = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
    fore_h = jnp.array([0.1], jnp.float32)

    def norm_fn(c):
        pe = encode_coord(c[:, 0], c[:, 1], c[:, 2], COORD)
        return model.apply(params, tokens, pe, coord_data, fore_h,
                           method=PhysicsNet.decode)

    primal_ref, lin = jax.linearize(norm_fn, coords)
    tang_ref = [lin(jnp.zeros_like(coords).at[:, k].set(1.0)) for k in range(3)]

    weights = extract_decode_weights(model, params, tokens, fore_h)
    primal, tang = fused_decode_jvp_v3(weights, coords, coord_data, COORD,
                                       block_n=32, interpret=True,
                                       compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(primal), np.asarray(primal_ref),
                               rtol=2e-4, atol=2e-5)
    for k in range(3):
        np.testing.assert_allclose(np.asarray(tang[k]), np.asarray(tang_ref[k]),
                                   rtol=2e-3, atol=1e-7)


def _rand_points(rng, n):
    coords = jnp.asarray(
        np.stack([rng.rand(n) * 27000 * 256, rng.rand(n) * 27000 * 144,
                  rng.randint(0, 25, n) * 3600.0], -1), jnp.float32)
    coord_data = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
    return coords, coord_data


def test_fused_decode_v4_matches_linearize(setup, rng):
    """Kernel v4 (collapsed algebra) == jax.linearize through the real decode."""
    from deepphysinet_tpu.ops.decode_kernel import (
        fuse_decode_weights, fused_decode_jvp_v4)

    model, params, tokens = setup
    coords, coord_data = _rand_points(rng, 64)
    fore_h = jnp.array([0.1], jnp.float32)

    def norm_fn(c):
        pe = encode_coord(c[:, 0], c[:, 1], c[:, 2], COORD)
        return model.apply(params, tokens, pe, coord_data, fore_h,
                           method=PhysicsNet.decode)

    primal_ref, lin = jax.linearize(norm_fn, coords)
    tang_ref = [lin(jnp.zeros_like(coords).at[:, k].set(1.0)) for k in range(3)]

    weights = extract_decode_weights(model, params, tokens, fore_h)
    fw = fuse_decode_weights(weights)
    pe, dpe = pe_and_tangents(coords, COORD)
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe

    cd_pe = sinecos_pe(coord_data, make_freq_bands(16, 4.0), include_input=False)
    primal, tang = fused_decode_jvp_v4(fw, pe, dpe, cd_pe, coord_data,
                                       block_n=32, interpret=True,
                                       compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(primal), np.asarray(primal_ref),
                               rtol=2e-4, atol=2e-5)
    for k in range(3):
        np.testing.assert_allclose(np.asarray(tang[k]), np.asarray(tang_ref[k]),
                                   rtol=2e-3, atol=1e-7)


def test_xla_twin_v4_matches_v2_twin(setup, rng):
    """decode_jvp_xla_v4 (collapsed) == decode_jvp_xla (two-step) in f32."""
    from deepphysinet_tpu.ops.decode_kernel import (
        decode_jvp_xla, decode_jvp_xla_v4, fuse_decode_weights)
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe

    model, params, tokens = setup
    coords, coord_data = _rand_points(rng, 48)
    fore_h = jnp.array([0.1], jnp.float32)
    weights = extract_decode_weights(model, params, tokens, fore_h)
    pe, dpe = pe_and_tangents(coords, COORD)
    cd_pe = sinecos_pe(coord_data, make_freq_bands(16, 4.0), include_input=False)

    p2, t2 = decode_jvp_xla(weights, pe, dpe, cd_pe, coord_data, jnp.float32)
    p4, t4 = decode_jvp_xla_v4(fuse_decode_weights(weights), pe, dpe, cd_pe,
                               coord_data, jnp.float32)
    np.testing.assert_allclose(np.asarray(p4), np.asarray(p2), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t4), np.asarray(t2), rtol=2e-3, atol=1e-6)


def test_jvp_engine_gradients_match_linearize(setup, rng):
    """d(pde loss)/d(params) via pde_engine='jvp' == via the linearize engine."""
    from deepphysinet_tpu.physics.engine import jvp_fields
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg

    model, params, tokens_unused = setup
    specs = norm_specs_from_cfg(OBS_CFG)
    obs_specs = tuple(specs[k] for k in OBS_NAME_ORDER)
    coords, coord_data = _rand_points(rng, 32)
    fore_h = jnp.array([0.1], jnp.float32)
    f = jnp.asarray(1e-4 * rng.rand(32, 1), jnp.float32)
    field = jnp.asarray(rng.randn(1, 12, 65), jnp.float32)
    fh_enc = jnp.array([[0.1]])

    def loss_linearize(p):
        tokens = model.apply(p, field, fh_enc, method=PhysicsNet.encode)[0]
        phys_fn = make_phys_fn(model, p, tokens, coord_data, fore_h, COORD,
                               obs_specs, with_clip=True)
        return pde_residual_losses(phys_fn, coords, f, FACTORS)["total"]

    def loss_jvp(p):
        tokens = model.apply(p, field, fh_enc, method=PhysicsNet.encode)[0]
        _, fd = jvp_fields(model, p, tokens, coords, coord_data, fore_h, COORD,
                           obs_specs, with_clip=True)
        return residual_losses_from_fields(fd, f, FACTORS)["total"]

    l_ref, g_ref = jax.value_and_grad(loss_linearize)(params)
    l_got, g_got = jax.value_and_grad(loss_jvp)(params)
    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=5e-3)
    flat_ref, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_got, _ = jax.flatten_util.ravel_pytree(g_got)
    # cosine similarity + norm ratio: elementwise rtol is too brittle for
    # deep-chain f32 gradients, direction + magnitude is what training needs.
    # (In float64 cos = 1 - 1e-13: the collapsed algebra is exact; the f32
    # slack below is matmul-reassociation noise.)
    cos = float(jnp.vdot(flat_ref, flat_got)
                / (jnp.linalg.norm(flat_ref) * jnp.linalg.norm(flat_got) + 1e-30))
    ratio = float(jnp.linalg.norm(flat_got) / (jnp.linalg.norm(flat_ref) + 1e-30))
    assert cos > 0.999, cos
    assert 0.99 < ratio < 1.01, ratio


def test_bwd_kernel_v4_matches_twin_vjp(setup, rng):
    """decode_bwd_kernel_v4 (interpret, f32) == jax.vjp of the XLA twin for
    every fused-weight cotangent."""
    from deepphysinet_tpu.ops.decode_kernel import (
        decode_bwd_kernel_v4, decode_jvp_xla_v4, fuse_decode_weights)
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe

    model, params, tokens = setup
    n = 64
    coords, coord_data = _rand_points(rng, n)
    fore_h = jnp.array([0.1], jnp.float32)
    weights = extract_decode_weights(model, params, tokens, fore_h)
    fw = fuse_decode_weights(weights)
    pe, dpe = pe_and_tangents(coords, COORD)
    cd_pe = sinecos_pe(coord_data, make_freq_bands(16, 4.0), include_input=False)

    g_primal = jnp.asarray(rng.randn(n, 6), jnp.float32)
    g_tang = jnp.asarray(rng.randn(3, n, 6), jnp.float32)

    _, vjp = jax.vjp(
        lambda w: decode_jvp_xla_v4(w, pe, dpe, cd_pe, coord_data, jnp.float32),
        fw)
    (g_ref,) = vjp((g_primal, g_tang))

    g_got = decode_bwd_kernel_v4(fw, pe, dpe, cd_pe, g_primal, g_tang,
                                 block_n=32, interpret=True,
                                 compute_dtype=jnp.float32)
    for name in g_ref._fields:
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_got, name))
        np.testing.assert_allclose(
            b, a, rtol=2e-3, atol=1e-4 * max(1.0, np.abs(a).max()),
            err_msg=name)


def test_kbwd_op_end_to_end_gradients(setup, rng):
    """fused_decode_jvp_v4_kbwd inside a differentiated loss produces the
    same weight gradients as the plain twin path (CPU fallback route)."""
    from deepphysinet_tpu.ops.decode_kernel import (
        decode_jvp_xla_v4, fuse_decode_weights, fused_decode_jvp_v4_kbwd)
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe

    model, params, tokens = setup
    n = 32
    coords, coord_data = _rand_points(rng, n)
    fore_h = jnp.array([0.1], jnp.float32)
    weights = extract_decode_weights(model, params, tokens, fore_h)
    fw = fuse_decode_weights(weights)
    pe, dpe = pe_and_tangents(coords, COORD)
    cd_pe = sinecos_pe(coord_data, make_freq_bands(16, 4.0), include_input=False)
    tgt_p = jnp.asarray(rng.randn(n, 6), jnp.float32)
    tgt_t = jnp.asarray(rng.randn(3, n, 6), jnp.float32)

    def loss_kbwd(w):
        p, t = fused_decode_jvp_v4_kbwd(w, pe, dpe, cd_pe, coord_data,
                                        32, jnp.float32)
        return jnp.mean((p - tgt_p) ** 2) + jnp.mean((t - tgt_t) ** 2)

    def loss_twin(w):
        p, t = decode_jvp_xla_v4(w, pe, dpe, cd_pe, coord_data, jnp.float32)
        return jnp.mean((p - tgt_p) ** 2) + jnp.mean((t - tgt_t) ** 2)

    la, ga = jax.value_and_grad(loss_kbwd)(fw)
    lb, gb = jax.value_and_grad(loss_twin)(fw)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for name in ga._fields:
        np.testing.assert_allclose(np.asarray(getattr(ga, name)),
                                   np.asarray(getattr(gb, name)),
                                   rtol=1e-4, atol=1e-6, err_msg=name)


def test_fused_decode_v5_matches_twin(setup, rng):
    """Kernel v5 (stacked layer-1) == the v4 XLA twin (f32 interpret)."""
    from deepphysinet_tpu.ops.decode_kernel import (
        decode_jvp_xla_v4, fuse_decode_weights, fused_decode_jvp_v5)
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe

    model, params, tokens = setup
    coords, coord_data = _rand_points(rng, 64)
    fore_h = jnp.array([0.1], jnp.float32)
    fw = fuse_decode_weights(extract_decode_weights(model, params, tokens, fore_h))
    pe, dpe = pe_and_tangents(coords, COORD)
    cd_pe = sinecos_pe(coord_data, make_freq_bands(16, 4.0), include_input=False)

    p_ref, t_ref = decode_jvp_xla_v4(fw, pe, dpe, cd_pe, coord_data, jnp.float32)
    p5, t5 = fused_decode_jvp_v5(fw, pe, dpe, cd_pe, coord_data, block_n=32,
                                 interpret=True, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(p5), np.asarray(p_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t5), np.asarray(t_ref), rtol=2e-3, atol=1e-6)


class TestCollapsedPrimalDecode:
    """collapsed_decode == PhysicsNet.decode (function AND gradients)."""

    def _inputs(self, rng, n=48):
        coords = jnp.asarray(
            np.stack([rng.rand(n) * 27000 * 256, rng.rand(n) * 27000 * 144,
                      rng.randint(0, 25, n) * 3600.0], -1), jnp.float32)
        coord_data = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
        return coords, coord_data

    def test_matches_model_decode(self, setup, rng):
        from deepphysinet_tpu.physics.engine import collapsed_decode

        model, params, tokens = setup
        coords, coord_data = self._inputs(rng)
        fore_h = jnp.array([0.1], jnp.float32)

        pe = encode_coord(coords[:, 0], coords[:, 1], coords[:, 2], COORD)
        ref = model.apply(params, tokens, pe, coord_data, fore_h,
                          method=PhysicsNet.decode)
        got = collapsed_decode(model, params, tokens, coords, coord_data,
                               fore_h, COORD)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_gradients_match_model_decode(self, setup, rng):
        from deepphysinet_tpu.physics.engine import collapsed_decode

        model, params, tokens = setup
        coords, coord_data = self._inputs(rng)
        fore_h = jnp.array([0.1], jnp.float32)
        labels = jnp.asarray(rng.randn(48, 6) * 0.1, jnp.float32)

        def loss_ref(p):
            pe = encode_coord(coords[:, 0], coords[:, 1], coords[:, 2], COORD)
            out = model.apply(p, tokens, pe, coord_data, fore_h,
                              method=PhysicsNet.decode)
            return jnp.mean((out - labels) ** 2)

        def loss_got(p):
            out = collapsed_decode(model, p, tokens, coords, coord_data,
                                   fore_h, COORD)
            return jnp.mean((out - labels) ** 2)

        g_ref = jax.grad(loss_ref)(params)
        g_got = jax.grad(loss_got)(params)
        fr = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_ref)])
        fg = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_got)])
        # f32 matmul-reassociation noise bounds this (same standard as
        # test_jvp_engine_gradients_match_linearize); exact in float64
        cos = float(jnp.vdot(fr, fg) / (jnp.linalg.norm(fr) * jnp.linalg.norm(fg)))
        assert cos > 0.999, cos
        np.testing.assert_allclose(float(jnp.linalg.norm(fg)),
                                   float(jnp.linalg.norm(fr)), rtol=1e-2)


def test_fused_decode_v4pe_matches_linearize(setup, rng):
    """Kernel v4pe (collapsed algebra + in-kernel PE) == jax.linearize."""
    from deepphysinet_tpu.ops.decode_kernel import (
        fuse_decode_weights, fused_decode_jvp_v4pe)

    model, params, tokens = setup
    coords, coord_data = _rand_points(rng, 64)
    fore_h = jnp.array([0.1], jnp.float32)

    def norm_fn(c):
        pe = encode_coord(c[:, 0], c[:, 1], c[:, 2], COORD)
        return model.apply(params, tokens, pe, coord_data, fore_h,
                           method=PhysicsNet.decode)

    primal_ref, lin = jax.linearize(norm_fn, coords)
    tang_ref = [lin(jnp.zeros_like(coords).at[:, k].set(1.0)) for k in range(3)]

    fw = fuse_decode_weights(extract_decode_weights(model, params, tokens, fore_h))
    primal, tang = fused_decode_jvp_v4pe(fw, coords, coord_data, COORD,
                                         block_n=32, interpret=True,
                                         compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(primal), np.asarray(primal_ref),
                               rtol=2e-4, atol=2e-5)
    for k in range(3):
        np.testing.assert_allclose(np.asarray(tang[k]), np.asarray(tang_ref[k]),
                                   rtol=2e-3, atol=1e-7)

"""v6 (trig-input) decode kernel: parity with v4 and gradient correctness.

v6 folds the PE derivative into the per-window weight prep
(ops/decode_kernel.py fuse_v6_from_v4), so the kernel's only per-point input
is the trig blocks.  Same math as v4 (reference semantics
interface_physics.py:285-299); these tests pin primal/tangent/gradient parity
in f32 where the two formulations agree to float rounding.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.ops.coords import CoordSpec
from deepphysinet_tpu.ops.decode_kernel import (
    decode_jvp_xla_v4,
    decode_jvp_xla_v6,
    extract_decode_weights,
    fuse_decode_weights,
    fuse_v6_from_v4,
    fused_decode_jvp_v6,
    fused_decode_jvp_v6_kbwd,
    pe_and_tangents,
    trig3_inputs,
)
from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe
from deepphysinet_tpu.physics.engine import fused_kernel_fields

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


def _inputs(rng, n):
    coords = jnp.asarray(
        np.stack([rng.rand(n) * 27000 * 256, rng.rand(n) * 27000 * 144,
                  rng.randint(0, 25, n) * 3600.0], -1), jnp.float32)
    coord_data = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
    cd_freqs = make_freq_bands(192 // 2 // 6, max_freq=4.0)
    cd_pe = sinecos_pe(coord_data, cd_freqs, include_input=False)
    return coords, coord_data, cd_pe


def test_v6_twin_matches_v4_twin(setup, rng):
    """decode_jvp_xla_v6 == decode_jvp_xla_v4 (f32, same collapsed algebra)."""
    model, params, tokens = setup
    coords, coord_data, cd_pe = _inputs(rng, 48)
    w = extract_decode_weights(model, params, tokens, jnp.array([0.1]))
    fw = fuse_decode_weights(w)
    pe, dpe = pe_and_tangents(coords, COORD)
    p4, t4 = decode_jvp_xla_v4(fw, pe, dpe, cd_pe, coord_data, jnp.float32)

    fw6 = fuse_v6_from_v4(fw, COORD)
    trig = trig3_inputs(coords, COORD)
    p6, t6 = decode_jvp_xla_v6(fw6, trig, cd_pe, coord_data, jnp.float32)
    np.testing.assert_allclose(np.asarray(p6), np.asarray(p4), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t6), np.asarray(t4), rtol=2e-4, atol=2e-4)


def test_v6_kernel_matches_twin_interpret(setup, rng):
    model, params, tokens = setup
    coords, coord_data, cd_pe = _inputs(rng, 80)  # pads 80 -> 256
    w = extract_decode_weights(model, params, tokens, jnp.array([0.1]))
    fw6 = fuse_v6_from_v4(fuse_decode_weights(w), COORD)
    trig = trig3_inputs(coords, COORD)
    p_t, t_t = decode_jvp_xla_v6(fw6, trig, cd_pe, coord_data, jnp.float32)
    p_k, t_k = fused_decode_jvp_v6(fw6, trig, cd_pe, coord_data,
                                   interpret=True, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_t), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_t), rtol=2e-4, atol=2e-4)


def test_fused_kernel_fields_v6_matches_v4(setup, rng):
    """engine path: version=6 fields == version=4 fields (interpret, f32)."""
    model, params, tokens = setup
    coords, coord_data, _ = _inputs(rng, 64)
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from tests.test_train_step import OBS_CFG

    specs = tuple(norm_specs_from_cfg(OBS_CFG)[k] for k in OBS_NAME_ORDER)
    fh = jnp.array([0.1], jnp.float32)
    p4, fd4 = fused_kernel_fields(model, params, tokens, coords, coord_data,
                                  fh, COORD, specs, interpret=True, version=4)
    p6, fd6 = fused_kernel_fields(model, params, tokens, coords, coord_data,
                                  fh, COORD, specs, interpret=True, version=6)
    np.testing.assert_allclose(np.asarray(p6), np.asarray(p4), rtol=2e-5, atol=2e-5)
    for k, v4 in fd4.fields.items():
        np.testing.assert_allclose(np.asarray(fd6.fields[k]), np.asarray(v4),
                                   rtol=3e-4, atol=3e-4, err_msg=k)
    for k, dv4 in fd4.derivs.items():
        for ax, a4 in dv4.items():
            a6 = np.asarray(fd6.derivs[k][ax])
            scale = max(1e-8, np.abs(np.asarray(a4)).max())
            np.testing.assert_allclose(a6 / scale, np.asarray(a4) / scale,
                                       rtol=3e-4, atol=3e-4,
                                       err_msg=f"{k}/{ax}")


def test_v6_kbwd_gradients_match_twin(setup, rng):
    """Pallas bwd kernel (interpret) == twin VJP for the fused-weight grads."""
    model, params, tokens = setup
    coords, coord_data, cd_pe = _inputs(rng, 64)
    w = extract_decode_weights(model, params, tokens, jnp.array([0.1]))
    fw6 = fuse_v6_from_v4(fuse_decode_weights(w), COORD)
    trig = trig3_inputs(coords, COORD)

    def loss_kernel(fw6):
        p, t = fused_decode_jvp_v6_kbwd(fw6, trig, cd_pe, coord_data,
                                        64, jnp.float32, True)
        return jnp.sum(p**2) + jnp.sum(jnp.sin(t))

    def loss_twin(fw6):
        p, t = decode_jvp_xla_v6(fw6, trig, cd_pe, coord_data, jnp.float32)
        return jnp.sum(p**2) + jnp.sum(jnp.sin(t))

    gk = jax.grad(loss_kernel)(fw6)
    gt = jax.grad(loss_twin)(fw6)
    for name in fw6._fields:
        a, b = np.asarray(getattr(gk, name)), np.asarray(getattr(gt, name))
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a / scale, b / scale, rtol=2e-4, atol=2e-4,
                                   err_msg=name)


def test_v6_trainable_param_grads_match_v4(setup, rng):
    """End-to-end param gradients through fused_kernel_fields: v6 == v4."""
    model, params, tokens = setup
    coords, coord_data, _ = _inputs(rng, 64)
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from tests.test_train_step import OBS_CFG

    specs = tuple(norm_specs_from_cfg(OBS_CFG)[k] for k in OBS_NAME_ORDER)
    fh = jnp.array([0.1], jnp.float32)

    def loss(params, version):
        p, fd = fused_kernel_fields(model, params, tokens, coords, coord_data,
                                    fh, COORD, specs, interpret=True,
                                    trainable=True, version=version)
        return jnp.mean(p**2) + 1e-6 * jnp.mean(fd.derivs["T"]["x"] ** 2)

    g4 = jax.grad(lambda p: loss(p, 4))(params)
    g6 = jax.grad(lambda p: loss(p, 6))(params)
    flat4 = jax.tree_util.tree_leaves(g4)
    flat6 = jax.tree_util.tree_leaves(g6)
    for a, b in zip(flat6, flat4):
        an, bn = np.asarray(a), np.asarray(b)
        scale = max(1e-8, np.abs(bn).max())
        np.testing.assert_allclose(an / scale, bn / scale, rtol=5e-4, atol=5e-4)


def test_residual_kernel_v6_matches_v4(setup, rng):
    """In-kernel residual assembly: version=6 sums == version=4 (interpret)."""
    model, params, tokens = setup
    coords, coord_data, _ = _inputs(rng, 96)
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.ops.residual_kernel import kernel_residual_losses
    from tests.test_train_step import FACTORS, OBS_CFG

    specs = tuple(norm_specs_from_cfg(OBS_CFG)[k] for k in OBS_NAME_ORDER)
    fh = jnp.array([0.1], jnp.float32)
    f = jnp.asarray(rng.rand(96, 1) * 1e-4, jnp.float32)
    l4 = kernel_residual_losses(model, params, tokens, coords, coord_data, fh,
                                f, COORD, specs, FACTORS, interpret=True,
                                block_n=32, version=4)
    l6 = kernel_residual_losses(model, params, tokens, coords, coord_data, fh,
                                f, COORD, specs, FACTORS, interpret=True,
                                block_n=32, version=6)
    for k, v in l4.items():
        a, b = float(l6[k]), float(v)
        assert a == pytest.approx(b, rel=3e-4, abs=1e-8), k

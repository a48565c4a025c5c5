"""Fused whole-encoder kernel: parity with the XLA encoder (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.ops.encoder_kernel import encode_fused

NET = dict(in_channels=192, hidden_channels=64, learnable_token_num=16)


def _build(rng, compute_dtype, e_layers=2, token_num=12, ltn=8):
    meta = dict(enc_in=65, c_out=64, d_model=64, n_heads=4, e_layers=e_layers,
                activation="gelu", d_ff=96, learnable_token_num=ltn)
    net = dict(NET, token_num=token_num, learnable_token_num=2 * ltn)
    model = PhysicsNet(meta_cfg=meta, net_cfg=net, compute_dtype=compute_dtype)
    field = jnp.asarray(rng.randn(1, token_num, 65) * 0.5, jnp.float32)
    fh = jnp.asarray([[0.1]], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), field,
                        jnp.zeros((4, 192), jnp.float32),
                        jnp.zeros((4, 6), jnp.float32), fh)
    return model, params, field, fh


def test_matches_xla_encode_f32(rng):
    """f32 compute: the kernel is the same op chain, tight tolerance."""
    model, params, field, fh = _build(rng, jnp.float32)
    ref = model.apply(params, field, fh, method=PhysicsNet.encode)
    got = encode_fused(model, params, field, fh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_matches_xla_encode_bf16(rng):
    """bf16 compute: identical matmul dtypes; bias-add rounding differs only
    in summation order, so tokens agree to bf16 resolution."""
    model, params, field, fh = _build(rng, jnp.bfloat16)
    ref = np.asarray(model.apply(params, field, fh, method=PhysicsNet.encode),
                     np.float32)
    got = np.asarray(encode_fused(model, params, field, fh, interpret=True),
                     np.float32)
    sc = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2 * sc)


def test_unpadded_seq_multiple_of_16(rng):
    """Sequence length already tile-aligned: no padding branch."""
    model, params, field, fh = _build(rng, jnp.float32, e_layers=1,
                                      token_num=24, ltn=8)  # L = 32
    ref = model.apply(params, field, fh, method=PhysicsNet.encode)
    got = encode_fused(model, params, field, fh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_relu_activation(rng):
    meta = dict(enc_in=65, c_out=64, d_model=64, n_heads=4, e_layers=1,
                activation="relu", d_ff=96, learnable_token_num=8)
    net = dict(NET, token_num=12, learnable_token_num=16)
    model = PhysicsNet(meta_cfg=meta, net_cfg=net, compute_dtype=jnp.float32)
    field = jnp.asarray(rng.randn(1, 12, 65) * 0.5, jnp.float32)
    fh = jnp.asarray([[0.1]], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), field,
                        jnp.zeros((4, 192), jnp.float32),
                        jnp.zeros((4, 6), jnp.float32), fh)
    ref = model.apply(params, field, fh, method=PhysicsNet.encode)
    got = encode_fused(model, params, field, fh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

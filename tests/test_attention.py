"""Fused attention: numerical parity with a straightforward numpy reference
and gradient parity of the custom VJP against direct autodiff."""

import numpy as np
import jax
import jax.numpy as jnp

from deepphysinet_tpu.ops.attention import attention_xla, fused_attention


def _np_attention(q, k, v, scale):
    scores = np.einsum("blhe,bshe->bhls", q, k)
    a = np.exp(scale * scores - np.max(scale * scores, -1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    return np.einsum("bhls,bshd->blhd", a, v)


def test_xla_matches_numpy(rng):
    B, L, H, E = 2, 17, 4, 8
    q, k, v = (rng.randn(B, L, H, E).astype(np.float32) for _ in range(3))
    scale = 1.0 / np.sqrt(E)
    out = attention_xla(jnp.array(q), jnp.array(k), jnp.array(v), scale)
    np.testing.assert_allclose(np.asarray(out), _np_attention(q, k, v, scale), rtol=2e-5, atol=2e-5)


def test_fused_forward_matches_xla(rng):
    B, L, H, E = 1, 23, 2, 16
    q, k, v = (jnp.array(rng.randn(B, L, H, E), jnp.float32) for _ in range(3))
    scale = 0.25
    ref = attention_xla(q, k, v, scale)
    out = fused_attention(q, k, v, scale, "xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_autodiff(rng):
    B, L, H, E = 1, 9, 2, 4
    q, k, v = (jnp.array(rng.randn(B, L, H, E), jnp.float32) for _ in range(3))
    scale = 1.0 / np.sqrt(E)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, scale, "xla") ** 2)

    def loss_direct(q, k, v):
        return jnp.sum(attention_xla(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_direct, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_flash_attention_matches_xla_interpret(rng):
    """Blockwise online-softmax kernel vs the dense reference (interpret mode
    exercises the same kernel code path on CPU)."""
    import functools
    from unittest import mock
    from deepphysinet_tpu.ops import attention as attn_mod

    B, L, H, E = 1, 300, 2, 16
    q, k, v = (jnp.array(rng.randn(B, L, H, E), jnp.float32) for _ in range(3))
    scale = 1.0 / np.sqrt(E)
    ref = attention_xla(q, k, v, scale)

    orig = attn_mod.pl.pallas_call
    with mock.patch.object(attn_mod.pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        out = attn_mod._attention_flash(q, k, v, scale, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pallas_impl_routes_long_sequences_to_flash(monkeypatch):
    """impl='pallas' must route L > threshold to the blockwise flash kernel
    (the single-tile kernel's L x L scores would not fit VMEM)."""
    from deepphysinet_tpu.ops import attention as attn_mod

    calls = {}
    monkeypatch.setattr(attn_mod, "_attention_flash",
                        lambda q, k, v, s: calls.setdefault("flash", True) or q)
    monkeypatch.setattr(attn_mod, "_attention_pallas",
                        lambda q, k, v, s: calls.setdefault("tile", True) or q)
    q = jnp.zeros((1, attn_mod._FLASH_THRESHOLD + 1, 2, 8))
    attn_mod.fused_attention(q, q, q, 0.5, "pallas")
    assert calls == {"flash": True}
    calls.clear()
    q = jnp.zeros((1, 64, 2, 8))
    attn_mod.fused_attention(q, q, q, 0.5, "pallas")
    assert calls == {"tile": True}


def test_auto_impl_prefers_xla_for_short_sequences(monkeypatch):
    """Auto dispatch: tiny sequences stay on XLA attention (kernel launch
    overhead dominates, measured at 287 tokens); long ones go Pallas."""
    from deepphysinet_tpu.ops import attention as attn_mod

    monkeypatch.setattr(attn_mod, "_HAS_PLTPU", True)
    monkeypatch.setattr(attn_mod.jax, "default_backend", lambda: "tpu")
    assert attn_mod.default_impl(287) == "xla"
    assert attn_mod.default_impl(attn_mod._XLA_SEQ_THRESHOLD) == "xla"
    assert attn_mod.default_impl(attn_mod._XLA_SEQ_THRESHOLD + 1) == "pallas"
    assert attn_mod.default_impl(None) == "pallas"

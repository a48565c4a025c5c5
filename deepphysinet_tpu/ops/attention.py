"""Fused multi-head attention: Pallas TPU kernel with an XLA fallback.

The reference computes full softmax attention as two cuBLAS einsums with the
L x L score matrix materialized in HBM (model/attn.py:55-63).  The TPU-native
replacement fuses QK^T -> masked softmax -> AV into one Pallas kernel per
(batch, head): for the encoder's sequence length (287 tokens, 32-dim heads) the
whole tile lives in VMEM, so the score matrix never touches HBM.

The kernel is exposed through ``fused_attention`` with a ``jax.custom_vjp``:
the forward pass is the Pallas kernel; the backward pass uses the standard
attention gradient identities in plain XLA (recomputing A from the saved
q, k, v) -- at this sequence length recomputation is cheaper than saving A.

``impl='xla'`` selects a pure-XLA path (used on CPU test meshes and as a
numerical reference for the kernel's unit tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Reference path; mirrors model/attn.py:55-63 (no mask: mask_flag=False)."""
    scores = jnp.einsum("blhe,bshe->bhls", q, k, preferred_element_type=jnp.float32)
    a = jax.nn.softmax(scale * scores, axis=-1)
    a = a.astype(v.dtype)
    return jnp.einsum("bhls,bshd->blhd", a, v)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int):
    """One (batch, head) tile: q/k/v [L_pad, E_pad] in VMEM; full fused attention."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [L_pad, L_pad]
    l_pad = scores.shape[-1]
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (1, l_pad), 1)
    neg = jnp.asarray(-jnp.inf, scores.dtype)
    scores = jnp.where(key_ids < seq_len, scores * scale, neg)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    a = (e / s).astype(v.dtype)
    o_ref[0] = jnp.dot(a, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """q, k, v: [B, L, H, E] -> out [B, L, H, E]."""
    B, L, H, E = q.shape
    l_pad = _round_up(L, 128)
    e_pad = _round_up(E, 128)

    def pad(x):
        x = jnp.moveaxis(x, 2, 1)  # [B, H, L, E]
        x = x.reshape(B * H, L, E)
        return jnp.pad(x, ((0, 0), (0, l_pad - L), (0, e_pad - E)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    kernel = functools.partial(_attn_kernel, scale=scale, seq_len=L)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * H, l_pad, e_pad), q.dtype),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, l_pad, e_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, e_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, e_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l_pad, e_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(qp, kp, vp)
    out = out[:, :L, :E].reshape(B, H, L, E)
    return jnp.moveaxis(out, 1, 2)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, scale: float, seq_len: int, block_k: int, num_k_blocks: int):
    """Online-softmax flash attention: one (batch*head, q-block) accumulates
    over streamed kv blocks; running max/sum/acc live in VMEM scratch."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [bq, e]
    k = k_ref[0]  # [bk, e]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale  # [bq, bk]
    key_ids = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_ids < seq_len, s, -jnp.inf)

    m_prev = m_scr[...]
    l_prev = l_scr[...]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_cur)
    alpha = jnp.exp(m_prev - m_cur)
    l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[...] = m_cur
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == num_k_blocks - 1)
    def _():
        o_ref[0] = (acc_scr[...] / l_scr[...]).astype(o_ref.dtype)


def _attention_flash(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
                     block_q: int = 256, block_k: int = 256) -> jnp.ndarray:
    """Blockwise flash attention for long sequences; q/k/v [B, L, H, E]."""
    B, L, H, E = q.shape
    l_pad = _round_up(L, max(block_q, block_k))
    e_pad = _round_up(E, 128)

    def pad(x):
        x = jnp.moveaxis(x, 2, 1).reshape(B * H, L, E)
        return jnp.pad(x, ((0, 0), (0, l_pad - L), (0, e_pad - E)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    nq, nk = l_pad // block_q, l_pad // block_k
    kernel = functools.partial(_flash_kernel, scale=scale, seq_len=L,
                               block_k=block_k, num_k_blocks=nk)
    out = pl.pallas_call(
        kernel,
        grid=(B * H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, e_pad), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, e_pad), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, e_pad), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, e_pad), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, l_pad, e_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, e_pad), jnp.float32),
        ],
    )(qp, kp, vp)
    out = out[:, :L, :E].reshape(B, H, L, E)
    return jnp.moveaxis(out, 1, 2)


# sequences longer than this use the blockwise flash kernel instead of the
# single-tile fused kernel (whose L x L scores must fit VMEM)
_FLASH_THRESHOLD = 1024

# at or below this length the auto dispatch stays on plain XLA attention.
# Round-3 sweep (fwd+bwd, B=1 H=8 E=64 bf16, median-of-5 slopes on v5e):
# XLA and the Pallas single-tile kernel are within measurement noise
# (~120-150 us) at EVERY length 287..1024, and blockwise flash only loses
# there (180 us at 1024) -- there is no crossover below the flash
# threshold, so XLA serves the whole single-tile range and flash takes over
# beyond it (where the L x L score tile stops fitting VMEM anyway)
_XLA_SEQ_THRESHOLD = 1024


def default_impl(seq_len: Optional[int] = None) -> str:
    if not (_HAS_PLTPU and jax.default_backend() == "tpu"):
        return "xla"
    if seq_len is not None and seq_len <= _XLA_SEQ_THRESHOLD:
        return "xla"
    return "pallas"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, scale: float, impl: Optional[str] = None):
    impl = impl or default_impl(q.shape[1])
    if impl == "flash":
        return _attention_flash(q, k, v, scale)
    if impl == "pallas":
        if q.shape[1] > _FLASH_THRESHOLD:
            return _attention_flash(q, k, v, scale)
        return _attention_pallas(q, k, v, scale)
    return attention_xla(q, k, v, scale)


def _fused_fwd(q, k, v, scale, impl):
    return fused_attention(q, k, v, scale, impl), (q, k, v)


def _fused_bwd(scale, impl, res, g):
    q, k, v = res
    scores = jnp.einsum("blhe,bshe->bhls", q, k, preferred_element_type=jnp.float32)
    a = jax.nn.softmax(scale * scores, axis=-1)
    dv = jnp.einsum("bhls,blhd->bshd", a.astype(g.dtype), g)
    da = jnp.einsum("blhd,bshd->bhls", g, v)
    ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
    ds = ds.astype(q.dtype)
    dq = scale * jnp.einsum("bhls,bshe->blhe", ds, k)
    dk = scale * jnp.einsum("bhls,blhe->bshe", ds, q)
    return dq, dk, dv


fused_attention.defvjp(_fused_fwd, _fused_bwd)

"""Informer ProbSparse self-attention (functional JAX port).

The reference ships ProbAttention alongside FullAttention (model/attn.py:71-158,
Informer leftover -- available but unused by the shipped config).  Provided
here as a selectable attention implementation (``attn_type='prob'`` on the
encoder) for long-token-sequence configurations (e.g. finer input grids where
the token count grows): top-u queries (by the max-minus-mean sparsity measure
over a random key sample) attend fully; the rest take the value mean.

JAX notes: sampling uses an explicit PRNG key (deterministic under jit);
top-k/gather/scatter replace torch's fancy indexing; the unmasked encoder
variant is implemented (the reference's masked variant only serves its unused
decoder).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def prob_attention(
    q: jnp.ndarray,  # [B, L_q, H, E]
    k: jnp.ndarray,  # [B, L_k, H, E]
    v: jnp.ndarray,  # [B, L_k, H, D]
    key: jax.Array,
    factor: int = 5,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    B, L_q, H, E = q.shape
    _, L_k, _, D = v.shape
    scale = scale or 1.0 / math.sqrt(E)

    qh = jnp.swapaxes(q, 1, 2)  # [B, H, L_q, E]
    kh = jnp.swapaxes(k, 1, 2)
    vh = jnp.swapaxes(v, 1, 2)

    u_part = min(int(factor * math.ceil(math.log(max(L_k, 2)))), L_k)
    u = min(int(factor * math.ceil(math.log(max(L_q, 2)))), L_q)

    # sampled Q-K scores for the sparsity measure (attn.py:90-99)
    sample_idx = jax.random.randint(key, (L_q, u_part), 0, L_k)
    k_sample = kh[:, :, sample_idx]  # [B, H, L_q, u_part, E]
    qk_sample = jnp.einsum("bhle,bhlse->bhls", qh, k_sample)
    m = jnp.max(qk_sample, axis=-1) - jnp.mean(qk_sample, axis=-1)  # [B, H, L_q]
    _, top_idx = jax.lax.top_k(m, u)  # [B, H, u]

    q_reduce = jnp.take_along_axis(qh, top_idx[..., None], axis=2)  # [B, H, u, E]
    scores = jnp.einsum("bhue,bhse->bhus", q_reduce, kh) * scale
    attn = jax.nn.softmax(scores, axis=-1)
    top_ctx = jnp.einsum("bhus,bhsd->bhud", attn.astype(vh.dtype), vh)  # [B, H, u, D]

    # initial context: value mean for non-selected queries (attn.py:112-119),
    # then scatter the fully-attended contexts into the top-u positions
    ctx = jnp.broadcast_to(jnp.mean(vh, axis=2, keepdims=True), (B, H, L_q, D))
    b_idx = jnp.arange(B)[:, None, None]
    h_idx = jnp.arange(H)[None, :, None]
    ctx = ctx.at[b_idx, h_idx, top_idx].set(top_ctx)

    return jnp.swapaxes(ctx, 1, 2)  # [B, L_q, H, D]

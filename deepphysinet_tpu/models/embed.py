"""Token / positional / forecast-hour embeddings for the variable encoder.

Functional port of model/embed.py:

* ``TokenEmbedding`` (embed.py:36-48): Conv1d(enc_in -> d_model, k=3, circular
  padding) applied along the token axis.  In JAX the circular pad is explicit
  (``jnp.pad(mode='wrap')``) followed by a VALID conv, which XLA lowers to MXU
  matmuls.
* ``PositionalEmbedding`` (embed.py:16-33): classic sinusoid table, built once
  as a constant.
* forecast-hour embedding (embed.py:50-64): SineCosPE(1, N_freqs=d_model/2) of
  the normalized lead time, broadcast over tokens.

``DataEmbedding.__call__(x, forecast_h, learnable_token)`` reproduces
embed.py:60-64: value-embed the field tokens, prepend the learnable tokens,
add positional + forecast-hour embeddings.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from deepphysinet_tpu.models.init import kaiming_normal_conv_init, torch_bias_init
from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe


def sinusoid_table(max_len: int, d_model: int) -> np.ndarray:
    """The PositionalEmbedding table (embed.py:20-31)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(0, max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class TokenEmbedding(nn.Module):
    d_model: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, L, C_in]; conv along L with circular padding, kernel 3.
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", kaiming_normal_conv_init, (3, c_in, self.d_model), jnp.float32
        )
        bias = self.param("bias", torch_bias_init(3 * c_in), (self.d_model,), jnp.float32)
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode="wrap")
        # im2col formulation: windows [B, L, 3, C] @ kernel [3, C, D]
        w = jnp.stack([xp[:, :-2], xp[:, 1:-1], xp[:, 2:]], axis=2)
        out = jnp.einsum(
            "blkc,kcd->bld",
            w.astype(self.compute_dtype),
            kernel.astype(self.compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return out + bias


class DataEmbedding(nn.Module):
    c_in: int
    d_model: int
    max_len: int = 5000
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.value_embedding = TokenEmbedding(self.d_model, self.compute_dtype)
        self._pos_table = sinusoid_table(self.max_len, self.d_model)
        self._time_freqs = make_freq_bands(self.d_model // 2, max_freq=4.0)

    def __call__(
        self, x: jnp.ndarray, forecast_h: jnp.ndarray, learnable_token: jnp.ndarray
    ) -> jnp.ndarray:
        # x: [B, L, C_in]; forecast_h: [B, 1] normalized lead; token: [1, T, D]
        b = x.shape[0]
        x = self.value_embedding(x)
        tok = jnp.broadcast_to(learnable_token, (b,) + learnable_token.shape[1:])
        x = jnp.concatenate([tok.astype(x.dtype), x], axis=1)
        seq = x.shape[1]
        pos = jnp.asarray(self._pos_table[:seq], x.dtype)
        time_emb = sinecos_pe(forecast_h, self._time_freqs, include_input=False)  # [B, D]
        return x + pos[None] + time_emb[:, None, :].astype(x.dtype)

"""The variable encoder: a pre-norm-free transformer over grid-variable tokens.

Port of model/transformer_net.py: each of the 159 tokens is a flattened 37x65
1-degree field for one (time step, variable) pair; ``learnable_token_num``
learnable tokens are prepended (transformer_net.py:101-103); ``e_layers``
encoder layers of full attention + k=1 conv FFN (= dense) with post-norm
residuals (transformer_net.py:17-44); final LayerNorm + linear projection
(transformer_net.py:109-128).

TPU-native notes: attention runs through the fused Pallas kernel
(ops/attention.py) instead of torch einsums (model/attn.py:55-63); matmuls can
run in bfloat16 with float32 accumulation via ``compute_dtype``.
``meta_cfg.dropout`` exists in the reference config but no dropout module is
instantiated in its encoder (SURVEY Q6); behavior here matches (no dropout).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from deepphysinet_tpu.models.embed import DataEmbedding
from deepphysinet_tpu.models.init import torch_bias_init, torch_kernel_init, uniform01_init
from deepphysinet_tpu.ops.attention import fused_attention


class TorchDense(nn.Module):
    """Dense layer with torch-default init and f32 params / configurable compute.

    Matmuls accumulate in float32 on the MXU; the result is stored back in
    ``compute_dtype`` (bf16 in production) so inter-layer activations cost half
    the HBM bandwidth -- the decode path is bandwidth-bound at large point
    batches.  Heads that need f32 outputs cast explicitly at the end.
    """

    features: int
    compute_dtype: jnp.dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init, (in_features, self.features), jnp.float32)
        y = jnp.einsum(
            "...d,df->...f",
            x.astype(self.compute_dtype),
            kernel.astype(self.compute_dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.compute_dtype)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_features), (self.features,), jnp.float32)
            y = y + bias.astype(self.compute_dtype)
        return y


class _ProjParams(nn.Module):
    """Parameter-only twin of TorchDense: declares the same kernel/bias tree
    (so checkpoints and the torch import map are layout-identical) without
    binding them to a matmul -- the caller fuses several projections into one
    MXU launch."""

    in_features: int
    features: int

    def setup(self):
        self.kernel = self.param(
            "kernel", torch_kernel_init, (self.in_features, self.features), jnp.float32)
        self.bias = self.param(
            "bias", torch_bias_init(self.in_features), (self.features,), jnp.float32)

    def __call__(self):  # pragma: no cover - params accessed directly
        raise NotImplementedError


class AttentionLayer(nn.Module):
    """QKV projection + attention + output projection (attn.py:161-196).

    ``attn_type='full'`` (default) runs the fused Pallas/XLA full attention;
    ``attn_type='prob'`` selects the Informer ProbSparse variant the reference
    keeps available (model/attn.py:71-158) for long token sequences.

    ``fused_qkv=True`` computes q/k/v in ONE [L, d] x [d, 3d] matmul (the
    kernels are concatenated at apply time; the parameter tree keeps the three
    reference-named projections, so checkpoints are interchangeable): XLA does
    not horizontally merge separate gemms, and at encoder dims (287x512
    tokens) three skinny MXU launches schedule worse than one wide one in the
    training step, where encode is not overlapped with PE prep.
    """

    d_model: int
    n_heads: int
    compute_dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    attn_type: str = "full"
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, _ = x.shape
        h = self.n_heads
        e = self.d_model // h
        if self.fused_qkv:
            d_in = x.shape[-1]
            projs = [
                _ProjParams(d_in, self.d_model, name=nm)
                for nm in ("query_projection", "key_projection", "value_projection")
            ]
            w = jnp.concatenate([p.kernel for p in projs], axis=1)  # [d, 3d]
            bias = jnp.concatenate([p.bias for p in projs])  # [3d]
            qkv = jnp.einsum(
                "...d,df->...f",
                x.astype(self.compute_dtype),
                w.astype(self.compute_dtype),
                preferred_element_type=jnp.float32,
            ).astype(self.compute_dtype) + bias.astype(self.compute_dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = TorchDense(self.d_model, self.compute_dtype, name="query_projection")(x)
            k = TorchDense(self.d_model, self.compute_dtype, name="key_projection")(x)
            v = TorchDense(self.d_model, self.compute_dtype, name="value_projection")(x)
        q = q.reshape(b, l, h, e).astype(self.compute_dtype)
        k = k.reshape(b, l, h, e).astype(self.compute_dtype)
        v = v.reshape(b, l, h, e).astype(self.compute_dtype)
        scale = 1.0 / (e**0.5)  # attn.py:57
        if self.attn_type == "prob":
            from deepphysinet_tpu.ops.prob_attention import prob_attention
            import jax

            key = (self.make_rng("sample") if self.has_rng("sample")
                   else jax.random.PRNGKey(0))
            out = prob_attention(q, k, v, key, scale=scale)
        else:
            out = fused_attention(q, k, v, scale, self.attn_impl)
        out = out.reshape(b, l, h * e)
        return TorchDense(self.d_model, self.compute_dtype, name="out_projection")(out)


class EncoderLayer(nn.Module):
    """Post-norm block: attn residual -> LN -> dense FFN -> LN (transformer_net.py:17-44)."""

    d_model: int
    n_heads: int
    d_ff: int
    activation: str = "gelu"
    compute_dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    attn_type: str = "full"
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        new_x = AttentionLayer(
            self.d_model, self.n_heads, self.compute_dtype, self.attn_impl,
            self.attn_type, self.fused_qkv, name="attention"
        )(x)
        x = x + new_x
        y = x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        act = nn.relu if self.activation == "relu" else nn.gelu
        # conv1/conv2 have kernel_size=1 -> plain dense layers over the feature dim.
        y = act(TorchDense(self.d_ff, self.compute_dtype, name="conv1")(y))
        y = TorchDense(self.d_model, self.compute_dtype, name="conv2")(y)
        return nn.LayerNorm(dtype=jnp.float32, name="norm2")(x + y)


class EncoderStack(nn.Module):
    """Informer-style pyramid of encoders on progressively halved inputs
    (transformer_net.py:75-92 -- present-but-unused in the reference; kept for
    inventory parity and long-sequence configurations).

    ``inp_lens[i]`` halves the input i times for encoder i; outputs concat on
    the token axis.
    """

    d_model: int
    n_heads: int
    d_ff: int
    e_layers: int
    inp_lens: tuple = (0, 1)
    activation: str = "gelu"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        outs = []
        for i, i_len in enumerate(self.inp_lens):
            inp_len = x.shape[1] // (2**i_len)
            y = x[:, -inp_len:, :]
            for j in range(self.e_layers):
                y = EncoderLayer(
                    self.d_model, self.n_heads, self.d_ff, self.activation,
                    self.compute_dtype, name=f"stack_{i}_layer_{j}",
                )(y)
            outs.append(y)
        return jnp.concatenate(outs, axis=1)


class TransformerNet(nn.Module):
    """The full encoder (transformer_net.py:95-129).

    ``__call__(x_enc [B, L, enc_in], forecast_h [B, 1]) -> [B, L + ltn, c_out]``.
    """

    enc_in: int
    c_out: int
    d_model: int = 512
    n_heads: int = 8
    e_layers: int = 6
    d_ff: int = 512
    activation: str = "gelu"
    learnable_token_num: int = 128  # reference default (transformer_net.py:98); see SURVEY Q1
    compute_dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    attn_type: str = "full"
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, x_enc: jnp.ndarray, forecast_h: jnp.ndarray) -> jnp.ndarray:
        token = self.param(
            "learnable_token", uniform01_init, (1, self.learnable_token_num, self.d_model), jnp.float32
        )
        x = DataEmbedding(
            self.enc_in, self.d_model, compute_dtype=self.compute_dtype, name="enc_embedding"
        )(x_enc, forecast_h, token)
        for i in range(self.e_layers):
            x = EncoderLayer(
                self.d_model,
                self.n_heads,
                self.d_ff,
                self.activation,
                self.compute_dtype,
                self.attn_impl,
                self.attn_type,
                self.fused_qkv,
                name=f"layer_{i}",
            )(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        return TorchDense(self.c_out, self.compute_dtype, name="projection")(x)

"""Fused Pallas kernel: the entire transformer encoder in ONE launch.

The flagship encoder is 4 post-norm layers over only 287 tokens x 256 dims
(models/transformer_net.py; reference model/transformer_net.py:17-129).  As
individual XLA ops that is ~50 dispatches of tiny matmuls/layernorms/softmaxes
per forward — measured 0.619 ms, i.e. ~1% MXU utilization and 27% of the whole
40960-point residual evaluation (docs/PERF.md round 3e).  At these dims the
ENTIRE model — all 4 layers' weights (~3 MB bf16) plus the [288, 256] token
activations and one [288, 288] score tile — fits comfortably in VMEM, so the
TPU-native answer is a single Pallas kernel that runs embedding-to-projection
with zero HBM round trips and zero inter-op dispatch gaps.

Design notes:
* Q/K/V/O weights are pre-sliced PER HEAD outside the kernel
  ([NL, H, D, E] / [NL, H, E, D]): per-head activation lane-slicing inside
  the kernel would carry lane offsets (Mosaic relayouts); per-head weight
  matmuls need none.
* Precision mirrors the XLA path op-for-op: matmuls take compute_dtype
  inputs with f32 accumulation, dense outputs round to compute_dtype before
  the bias add (TorchDense semantics), softmax and LayerNorm run in f32,
  residual-stream activations stay f32.
* Padded key columns are masked to -inf before softmax (same contract as
  ops/attention.py::_attn_kernel); padded query rows produce garbage that
  never mixes into real rows (attention mixes over keys only; LN is
  row-local) and are sliced off at the end.
* Forward-only: training differentiates the XLA encoder; this kernel serves
  the eval/bench/inference paths where the encoder runs under
  stop-gradient.  (The backward would need either saved activations or
  recompute; at 0.6 ms of a 4.9 ms training step the win is bounded and not
  yet harvested.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


class EncoderKernelWeights(NamedTuple):
    """Per-layer-stacked, per-head-pre-sliced encoder weights (all f32)."""

    wq: jnp.ndarray  # [NL, H, D, E]
    bq: jnp.ndarray  # [NL, H, E]
    wk: jnp.ndarray  # [NL, H, D, E]
    bk: jnp.ndarray  # [NL, H, E]
    wv: jnp.ndarray  # [NL, H, D, E]
    bv: jnp.ndarray  # [NL, H, E]
    wo: jnp.ndarray  # [NL, H, E, D]
    bo: jnp.ndarray  # [NL, D]
    ln1s: jnp.ndarray  # [NL, D]
    ln1b: jnp.ndarray  # [NL, D]
    w1: jnp.ndarray  # [NL, D, F]
    b1: jnp.ndarray  # [NL, F]
    w2: jnp.ndarray  # [NL, F, D]
    b2: jnp.ndarray  # [NL, D]
    ln2s: jnp.ndarray  # [NL, D]
    ln2b: jnp.ndarray  # [NL, D]
    lns: jnp.ndarray  # [D] final norm
    lnb: jnp.ndarray  # [D]
    wproj: jnp.ndarray  # [D, C]
    bproj: jnp.ndarray  # [C]


def extract_encoder_weights(model, params) -> EncoderKernelWeights:
    """Stack + head-slice the flax param tree of PhysicsNet's meta_net.

    Mirrors models/transformer_net.py::{AttentionLayer, EncoderLayer,
    TransformerNet} parameter naming (reference model/transformer_net.py /
    model/attn.py:161-196).
    """
    mn = params["params"]["meta_net"]
    nl = int(model.meta_cfg.get("e_layers", 6))
    d = int(model.meta_cfg.get("d_model", 512))
    h = int(model.meta_cfg.get("n_heads", 8))
    e = d // h

    def head_cols(kname, lay):
        att = mn[f"layer_{lay}"]["attention"]
        w = att[kname]["kernel"].reshape(d, h, e)  # out dim -> (head, e)
        b = att[kname]["bias"].reshape(h, e)
        return jnp.moveaxis(w, 1, 0), b  # [H, D, E], [H, E]

    wq, bq, wk, bk, wv, bv, wo, bo = [], [], [], [], [], [], [], []
    ln1s, ln1b, w1, b1, w2, b2, ln2s, ln2b = [], [], [], [], [], [], [], []
    for lay in range(nl):
        lp = mn[f"layer_{lay}"]
        a, b_ = head_cols("query_projection", lay); wq.append(a); bq.append(b_)
        a, b_ = head_cols("key_projection", lay); wk.append(a); bk.append(b_)
        a, b_ = head_cols("value_projection", lay); wv.append(a); bv.append(b_)
        # out_projection consumes the concat of heads: rows e*h -> per-head
        # [E, D] row blocks
        wo.append(lp["attention"]["out_projection"]["kernel"].reshape(h, e, d))
        bo.append(lp["attention"]["out_projection"]["bias"])
        ln1s.append(lp["norm1"]["scale"]); ln1b.append(lp["norm1"]["bias"])
        w1.append(lp["conv1"]["kernel"]); b1.append(lp["conv1"]["bias"])
        w2.append(lp["conv2"]["kernel"]); b2.append(lp["conv2"]["bias"])
        ln2s.append(lp["norm2"]["scale"]); ln2b.append(lp["norm2"]["bias"])
    stk = lambda xs: jnp.stack(xs, axis=0)
    return EncoderKernelWeights(
        wq=stk(wq), bq=stk(bq), wk=stk(wk), bk=stk(bk), wv=stk(wv), bv=stk(bv),
        wo=stk(wo), bo=stk(bo), ln1s=stk(ln1s), ln1b=stk(ln1b),
        w1=stk(w1), b1=stk(b1), w2=stk(w2), b2=stk(b2),
        ln2s=stk(ln2s), ln2b=stk(ln2b),
        lns=mn["norm"]["scale"], lnb=mn["norm"]["bias"],
        wproj=mn["projection"]["kernel"], bproj=mn["projection"]["bias"],
    )


def _layer_norm(x, scale, bias):
    """flax nn.LayerNorm twin (f32, eps 1e-6): row-local lane reductions."""
    f32 = jnp.float32
    x = x.astype(f32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    c = x - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    y = c * jax.lax.rsqrt(var + 1e-6)
    return y * scale.astype(f32)[None, :] + bias.astype(f32)[None, :]


def _encoder_kernel(
    x_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref,
    lns_ref, lnb_ref, wproj_ref, bproj_ref,
    out_ref,
    *, n_layers: int, n_heads: int, seq_len: int, scale: float, cdt,
    activation: str,
):
    f32 = jnp.float32

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    def dot_kt(a, b):  # a @ b^T (scores)
        return jax.lax.dot_general(
            a.astype(cdt), b.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    def dense(a, w, bias):
        # TorchDense semantics: f32-accumulated matmul rounded to cdt, bias
        # added in cdt (models/transformer_net.py::TorchDense)
        return dot(a, w).astype(cdt) + bias.astype(cdt)[None, :]

    l_pad = x_ref.shape[0]
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (1, l_pad), 1)
    key_mask = key_ids < seq_len  # [1, L_pad]

    act = jax.nn.relu if activation == "relu" else jax.nn.gelu

    x = x_ref[...].astype(f32)  # [L_pad, D] residual stream stays f32
    for lay in range(n_layers):
        # ---- attention sublayer (per-head weight slices, no lane slicing) ----
        attn = jnp.zeros_like(x)
        for hd in range(n_heads):
            qh = dense(x, wq_ref[lay, hd], bq_ref[lay, hd])  # [L, E] cdt
            kh = dense(x, wk_ref[lay, hd], bk_ref[lay, hd])
            vh = dense(x, wv_ref[lay, hd], bv_ref[lay, hd])
            s = dot_kt(qh, kh) * scale  # [L, L] f32
            s = jnp.where(key_mask, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            ex = jnp.exp(s - m)
            a = ex / jnp.sum(ex, axis=-1, keepdims=True)
            oh = dot(a, vh).astype(cdt)  # [L, E]
            # out_projection: the head's row block, accumulated in f32; its
            # bias is added once below (concat(heads) @ Wo == sum_h oh @ Wo_h)
            attn = attn + dot(oh, wo_ref[lay, hd])
        new_x = attn.astype(cdt) + bo_ref[lay].astype(cdt)[None, :]
        x = _layer_norm(x + new_x.astype(f32), ln1s_ref[lay], ln1b_ref[lay])
        # ---- FFN sublayer (k=1 convs == dense) ----
        y = act(dense(x, w1_ref[lay], b1_ref[lay]).astype(f32)).astype(cdt)
        y = dense(y, w2_ref[lay], b2_ref[lay])
        x = _layer_norm(x + y.astype(f32), ln2s_ref[lay], ln2b_ref[lay])

    x = _layer_norm(x, lns_ref[...], lnb_ref[...])
    out = dense(x, wproj_ref[...], bproj_ref[...])
    out_ref[...] = out.astype(out_ref.dtype)


def fused_encoder_forward(
    w: EncoderKernelWeights,
    x: jnp.ndarray,  # [L, D] f32 embedded tokens (post DataEmbedding)
    activation: str = "gelu",
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Tokens [L, D] -> encoder output [L, C] in one Pallas launch."""
    l, d = x.shape
    nl, h, _, e = w.wq.shape
    c_out = w.wproj.shape[-1]
    scale = 1.0 / (e ** 0.5)  # attn.py:57
    l_pad = ((l + 15) // 16) * 16  # bf16 sublane tile
    if l_pad != l:
        x = jnp.pad(x, ((0, l_pad - l), (0, 0)))

    cdt = compute_dtype
    f32 = jnp.float32
    wt = [w.wq.astype(cdt), w.bq.astype(f32), w.wk.astype(cdt), w.bk.astype(f32),
          w.wv.astype(cdt), w.bv.astype(f32), w.wo.astype(cdt), w.bo.astype(f32),
          w.ln1s.astype(f32), w.ln1b.astype(f32),
          w.w1.astype(cdt), w.b1.astype(f32), w.w2.astype(cdt), w.b2.astype(f32),
          w.ln2s.astype(f32), w.ln2b.astype(f32),
          w.lns.astype(f32), w.lnb.astype(f32),
          w.wproj.astype(cdt), w.bproj.astype(f32)]

    mem = pltpu.VMEM if _HAS_PLTPU else pl.ANY
    kernel = functools.partial(
        _encoder_kernel, n_layers=nl, n_heads=h, seq_len=l, scale=scale,
        cdt=cdt, activation=activation)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((l_pad, c_out), f32),
        in_specs=[pl.BlockSpec(memory_space=mem)] * (1 + len(wt)),
        out_specs=pl.BlockSpec(memory_space=mem),
        interpret=interpret,
    )(x.astype(f32), *wt)
    return out[:l]


def encode_fused(
    model,
    params,
    field_x: jnp.ndarray,  # [B, L, enc_in]
    forecast_h: jnp.ndarray,  # [B, 1]
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for PhysicsNet.encode on forward-only paths: [B, T, C] tokens.

    The DataEmbedding (one large im2col matmul + table adds) stays in XLA;
    the transformer layers + final norm + projection run in the fused
    kernel.  Activation/dtype follow the model config.
    """
    from deepphysinet_tpu.models.embed import DataEmbedding

    mn = params["params"]["meta_net"]
    d_model = int(model.meta_cfg.get("d_model", 512))
    emb = DataEmbedding(int(model.meta_cfg["enc_in"]), d_model,
                        compute_dtype=model.compute_dtype)
    xe = emb.apply({"params": mn["enc_embedding"]}, field_x, forecast_h,
                   mn["learnable_token"])  # [B, T, D] f32
    w = extract_encoder_weights(model, params)
    act = model.meta_cfg.get("activation", "gelu")
    outs = [fused_encoder_forward(w, xe[b], activation=act,
                                  interpret=interpret,
                                  compute_dtype=model.compute_dtype)
            for b in range(xe.shape[0])]
    return jnp.stack(outs, axis=0)

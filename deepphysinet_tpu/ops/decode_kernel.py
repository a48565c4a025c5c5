"""Fused Pallas kernel: hypernet coordinate-MLP decode + forward-mode tangents.

This is the framework's hot op.  The XLA path for one residual evaluation
streams ~[6 vars, N, 256] float activations through HBM between every layer of
the decode (primal + 3 tangent passes) -- at reference batch sizes that is
several GB of traffic per evaluation and the measured bottleneck.  This kernel
keeps ALL generated + static decode weights resident in VMEM (~2.8 MB for the
6 stacked variable nets) and pushes blocks of points through the entire layer
chain -- generated layer 1 -> relu -> generated layer 2 -> conditioning adds ->
ResMLP trunk -> scalar head -> +ref residual -- computing the primal AND the
three (x, y, t) directional derivatives in the same pass.  HBM traffic drops
to the PE inputs and the [N, 6] outputs.

Math notes:
* tangent rows share every matmul with the primal (the jvp of a dense layer is
  the same matmul without bias); relu tangents are masked by the primal sign;
  the conditioning adds (interpolated-NWP PE, forecast-hour PE, ref residual)
  are constants under the space-time derivative (reference semantics: those
  inputs are detached data -- SURVEY/train.point_fn), so they touch only the
  primal rows.
* the trunk skip structure gives y = F2(relu(F1 c)) + 2c (variable_net.py:82-84).
* outputs are in normalized units; inverse normalization, clip masking, and
  residual assembly stay in XLA (physics/engine.py) where they are cheap
  elementwise f32 ops.

Kernel generations (docs/PERF.md has the measurements):
* v1/v2 -- original fused decode+jvp (10.4M evals/s); v2 = sparse PE tangents.
* v3 -- in-kernel PE variant (measured slower; documented).
* v4 -- collapsed algebra (FusedDecodeWeights: the scalar head lets f2 and
  the full trunk input fold into per-window fused matrices; 15.5M evals/s).
  ``decode_bwd_kernel_v4`` is its fused backward (recompute-in-VMEM, weight
  cotangents accumulated across the grid), making ``fused_decode_jvp_v4_kbwd``
  the TRAINING hot path (7 ms/step, the 'kernel' engine TPU default).
* v5 -- variable-stacked layer-1 variant (measured slower; documented).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe


class DecodeWeights(NamedTuple):
    """Stacked per-variable decode weights; generated parts depend on tokens."""

    w1: jnp.ndarray  # [6, 192, 256] generated layer 1
    b1: jnp.ndarray  # [6, 256]
    w2: jnp.ndarray  # [6, 256, 256] generated layer 2
    b2: jnp.ndarray  # [6, 256]
    wd: jnp.ndarray  # [6, 192, 256] data_input_fc
    bd: jnp.ndarray  # [6, 256]
    fh_add: jnp.ndarray  # [6, 256] fore_h contribution (precomputed)
    f1: jnp.ndarray  # [6, 256, 256] trunk fc1
    g1: jnp.ndarray  # [6, 256]
    f2: jnp.ndarray  # [6, 256, 256] trunk fc2
    g2: jnp.ndarray  # [6, 256]
    wo: jnp.ndarray  # [6, 256] scalar head
    bo: jnp.ndarray  # [6]


def extract_decode_weights(
    model: PhysicsNet, params, tokens: jnp.ndarray, fore_h: jnp.ndarray
) -> DecodeWeights:
    """Materialize the effective decode weights for one window.

    Reproduces VariableNet's weight generation (variable_net.py:57-65) from
    the raw parameter tree: meta.T through coord_input_fc/coord_hidden_fc,
    plus the static trunk weights and the precomputed forecast-hour addend.
    """
    vp = params["params"]["variable_nets"]
    net_cfg = model.net_cfg
    token_num = net_cfg["learnable_token_num"]
    in_ch = net_cfg["in_channels"]
    hid = net_cfg["hidden_channels"]

    meta_t = tokens[0:token_num].T  # [d_model, token_num]

    k1, c1 = vp["coord_input_fc"]["kernel"], vp["coord_input_fc"]["bias"]
    gen1 = jnp.einsum("dt,vtk->vdk", meta_t, k1) + c1[:, None, :]  # [6, d, in+1]
    w1 = jnp.swapaxes(gen1[..., :in_ch], 1, 2)  # [6, in_ch, d]
    b1 = gen1[..., in_ch]  # [6, d]

    k2, c2 = vp["coord_hidden_fc"]["kernel"], vp["coord_hidden_fc"]["bias"]
    gen2 = jnp.einsum("dt,vtk->vdk", meta_t, k2) + c2[:, None, :]
    w2 = jnp.swapaxes(gen2[..., :hid], 1, 2)  # [6, hid, d]
    b2 = gen2[..., hid]

    fh_freqs = make_freq_bands(in_ch // 2, max_freq=4.0)
    fh_pe = sinecos_pe(fore_h.reshape(-1), fh_freqs, include_input=False)  # [in_ch]
    fh_add = jnp.einsum("i,vio->vo", fh_pe, vp["fore_h_fc"]["kernel"]) + vp["fore_h_fc"]["bias"]

    return DecodeWeights(
        w1=w1, b1=b1, w2=w2, b2=b2,
        wd=vp["data_input_fc"]["kernel"], bd=vp["data_input_fc"]["bias"],
        fh_add=fh_add,
        f1=vp["cat_fc1"]["fc1"]["kernel"], g1=vp["cat_fc1"]["fc1"]["bias"],
        f2=vp["cat_fc1"]["fc2"]["kernel"], g2=vp["cat_fc1"]["fc2"]["bias"],
        wo=vp["out_fc"]["kernel"][..., 0], bo=vp["out_fc"]["bias"][..., 0],
    )


def pe_and_tangents(
    coords: jnp.ndarray, coord_spec, dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SineCos PE of physical (x, y, t) and its three directional derivatives.

    Closed form: PE feature (freq f, fn, channel c) differentiates to
    f * cos / -f * sin times the channel's normalization scale -- no autodiff
    needed.  The direction-k derivative touches ONLY channel-k features (64 of
    192), so tangents are returned **compact**: (pe [N, 2F*3],
    dpe [3, N, 2F]), ordered (freq, fn) to match ``w1[k::3]`` row slices.

    ``dtype`` fuses the compute-dtype cast into the prep's output writes
    (the kernels and their XLA twins cast these inputs to the compute dtype
    anyway, so emitting it directly skips a separate cast pass).  The
    formulation is deliberately the stacked one: a round-4 micro-bench of
    layout-flat rewrites (lane-tile and K=3-matmul angle builds,
    scripts/perf_prep_variants.py) measured BOTH slower than this form
    (pe 156 us stacked vs 202/213 us, N=40960 on v5e) — the period-3 lane
    tile is a per-element lane shuffle, and the matmul build loses angle
    precision to the TPU's low-precision f32 matmul default.
    """
    scales = jnp.array(
        [1.0 / (coord_spec.dx * (coord_spec.lon_size - 1)),
         1.0 / (coord_spec.dy * (coord_spec.lat_size - 1)),
         1.0 / coord_spec.pred_t_span], jnp.float32)
    cn = coords.astype(jnp.float32) * scales  # [N, 3] normalized
    fb = jnp.asarray(coord_spec.freq_bands(), jnp.float32)  # [F]
    xf = jnp.swapaxes(cn[..., :, None] * fb, -1, -2)  # [N, F, 3]
    sin, cos = jnp.sin(xf), jnp.cos(xf)
    pe = jnp.stack([sin, cos], axis=-2).reshape(cn.shape[0], -1)  # [N, 2F*3]

    dsin = cos * fb[None, :, None]  # [N, F, 3] = d sin/d cn_c for channel c
    dcos = -sin * fb[None, :, None]
    dfeat = jnp.stack([dsin, dcos], axis=-2)  # [N, F, {sin,cos}, 3]
    # direction k -> channel-k column, scaled; compact [N, 2F] per direction
    dpe = jnp.moveaxis(dfeat, -1, 0) * scales[:, None, None, None]  # [3, N, F, 2]
    dpe = dpe.reshape(3, cn.shape[0], -1)
    return pe.astype(dtype), dpe.astype(dtype)


def slice_tangent_weights(w1: jnp.ndarray) -> jnp.ndarray:
    """Channel-sliced rows of the generated layer-1 weights for the sparse
    tangent matmuls: [6, in_ch, hid] -> [6, 3, in_ch//3, hid] where slice k
    holds rows k, k+3, k+6, ... (feature index = f*6 + s*3 + c)."""
    v, in_ch, hid = w1.shape
    return jnp.stack([w1[:, k::3, :] for k in range(3)], axis=1)


def _decode_kernel(
    pe_ref, dpe_ref, cdpe_ref, ref_ref,
    w1_ref, w1c_ref, b1_ref, w2_ref, b2_ref, wd_ref, bd_ref, fh_ref,
    f1_ref, g1_ref, f2_ref, g2_ref, wo_ref, bo_ref,
    primal_ref, tang_ref,
    *, block_n: int, n_vars: int, cdt,
):
    """One point block through the full decode + 3 tangents for all variables.

    Matmul inputs stay in ``cdt`` (bf16 in production) for full MXU rate with
    f32 accumulation; elementwise math between dots runs in f32.  Tangent
    layer-1 exploits PE-derivative sparsity: direction k multiplies only the
    channel-k weight rows (w1c), a 3x FLOP/traffic cut on that matmul.
    """
    f32 = jnp.float32
    P_in = pe_ref[...]  # [Nb, in_ch] cdt
    T_in = dpe_ref[...]  # [3, Nb, in_ch//3] cdt (compact per direction)
    CD = cdpe_ref[...]  # [Nb, in_ch] cdt

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    primal_cols = []
    tang_cols = []
    for v in range(n_vars):
        w1 = w1_ref[v]
        z = dot(P_in, w1) + b1_ref[v][None, :]
        tz = jnp.concatenate(
            [dot(T_in[k], w1c_ref[v, k]) for k in range(3)], axis=0
        )  # [3Nb, hid]
        mask = (z > 0).astype(f32)
        p = jnp.maximum(z, 0.0)
        t = tz * jnp.concatenate([mask, mask, mask], axis=0)

        w2 = w2_ref[v]
        p = dot(p, w2) + b2_ref[v][None, :]
        t = dot(t, w2)

        cd = dot(CD, wd_ref[v]) + bd_ref[v][None, :]
        c = p + cd + fh_ref[v][None, :]
        tc = t  # conditioning adds are constant under d/dx

        f1 = f1_ref[v]
        r = dot(c, f1) + g1_ref[v][None, :]
        tr = dot(tc, f1)
        maskr = (r > 0).astype(f32)
        pr = jnp.maximum(r, 0.0)
        tr = tr * jnp.concatenate([maskr, maskr, maskr], axis=0)

        f2 = f2_ref[v]
        y = dot(pr, f2) + g2_ref[v][None, :] + 2.0 * c  # trunk skip structure
        ty = dot(tr, f2) + 2.0 * tc

        # scalar head as broadcast-multiply + lane reduction (a [hid, 1] matmul
        # would need an unsupported bf16 minor-dim reshape in Mosaic)
        wo = wo_ref[v][None, :].astype(f32)  # [1, hid]
        o = jnp.sum(y * wo, axis=-1) + bo_ref[v] + ref_ref[:, v]  # [Nb]
        to = jnp.sum(ty * wo, axis=-1)  # [3Nb]
        primal_cols.append(o[:, None])
        tang_cols.append(to.reshape(3, block_n)[:, :, None])

    primal_ref[...] = jnp.concatenate(primal_cols, axis=-1)
    tang_ref[...] = jnp.concatenate(tang_cols, axis=-1)


def fused_decode_jvp(
    weights: DecodeWeights,
    pe: jnp.ndarray,  # [N, in_ch] f32
    dpe: jnp.ndarray,  # [3, N, in_ch//3] f32 (compact per-direction tangents)
    cd_pe: jnp.ndarray,  # [N, in_ch] f32
    ref: jnp.ndarray,  # [N, 6] normalized conditioning values (residual head)
    block_n: int = 512,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Primal [N, 6] and tangents [3, N, 6] (normalized units, d/d physical)."""
    n, in_ch = pe.shape
    ch = dpe.shape[-1]  # in_ch // 3
    n_vars = weights.w1.shape[0]
    if n % block_n != 0:
        pad = block_n - n % block_n
        pe = jnp.pad(pe, ((0, pad), (0, 0)))
        dpe = jnp.pad(dpe, ((0, 0), (0, pad), (0, 0)))
        cd_pe = jnp.pad(cd_pe, ((0, pad), (0, 0)))
        ref = jnp.pad(ref, ((0, pad), (0, 0)))
    n_pad = pe.shape[0]
    grid = (n_pad // block_n,)

    cd = compute_dtype
    w1c = slice_tangent_weights(weights.w1)
    wt = [weights.w1.astype(cd), w1c.astype(cd), weights.b1.astype(jnp.float32),
          weights.w2.astype(cd), weights.b2.astype(jnp.float32),
          weights.wd.astype(cd), weights.bd.astype(jnp.float32),
          weights.fh_add.astype(jnp.float32),
          weights.f1.astype(cd), weights.g1.astype(jnp.float32),
          weights.f2.astype(cd), weights.g2.astype(jnp.float32),
          weights.wo.astype(cd), weights.bo.astype(jnp.float32)]

    mem = pltpu.VMEM if _HAS_PLTPU else pl.ANY
    full = lambda: pl.BlockSpec(memory_space=mem)
    kernel = functools.partial(_decode_kernel, block_n=block_n, n_vars=n_vars, cdt=cd)

    primal, tang = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, n_vars), jnp.float32),
            jax.ShapeDtypeStruct((3, n_pad, n_vars), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((3, block_n, ch), lambda i: (0, i, 0), memory_space=mem),
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((block_n, n_vars), lambda i: (i, 0), memory_space=mem),
        ] + [full() for _ in wt],
        out_specs=(
            pl.BlockSpec((block_n, n_vars), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((3, block_n, n_vars), lambda i: (0, i, 0), memory_space=mem),
        ),
        interpret=interpret,
    )(pe.astype(cd), dpe.astype(cd), cd_pe.astype(cd), ref.astype(jnp.float32), *wt)
    return primal[:n], tang[:, :n]


def channel_major_perm(in_ch: int, n_channels: int) -> np.ndarray:
    """Permutation taking interleaved PE features (index = (f*2+s)*C + c) to
    channel-major, fn-grouped order [c][all sin(f), then all cos(f)] -- lets
    the kernel build each PE block as a plain concat (no lane interleave,
    which Mosaic cannot relayout) and slice direction-k tangent weights as
    contiguous row blocks."""
    C = n_channels
    n_freqs = in_ch // (2 * C)
    perm = []
    for c in range(C):
        perm.extend((2 * f) * C + c for f in range(n_freqs))  # sin rows
        perm.extend((2 * f + 1) * C + c for f in range(n_freqs))  # cos rows
    return np.asarray(perm)


def _pe_block(cn_col, fb, f32):
    """In-kernel SineCos PE for one channel: cn_col [Nb, 1] -> [Nb, 2F]
    fn-grouped ([sin..., cos...]) to match channel_major_perm's row order."""
    arg = cn_col * fb[None, :]  # [Nb, F]
    s, c = jnp.sin(arg), jnp.cos(arg)
    return jnp.concatenate([s, c], axis=-1), s, c


def _decode_kernel_v3(
    cn_ref, cd_ref, ref_ref, fb_ref, fb2_ref, scales_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, wd_ref, bd_ref, fh_ref,
    f1_ref, g1_ref, f2_ref, g2_ref, wo_ref, bo_ref,
    primal_ref, tang_ref,
    *, block_n: int, n_vars: int, cdt, n_freqs: int, n_cd_freqs: int,
):
    """v3: coordinates in, PE computed on the VPU inside the kernel.

    Inputs per block: normalized coords cn [Nb, 3->8 padded], conditioning
    values cd [Nb, 6->8], ref [Nb, 6].  W1/Wd arrive channel-major
    (channel_major_perm), so the direction-k tangent weights are the rows
    [k*2F : (k+1)*2F] of W1 -- no separate sliced copy needed.
    """
    f32 = jnp.float32
    fb = fb_ref[0]  # [F] coord freq bands
    fb2 = fb2_ref[0]  # [F2] coord_data freq bands
    scales = scales_ref[0]  # [3] d(cn)/d(physical)

    pe_blocks, sin_c, cos_c = [], [], []
    for c in range(3):
        blk, s, co = _pe_block(cn_ref[:, c : c + 1], fb, f32)
        pe_blocks.append(blk)
        sin_c.append(s)
        cos_c.append(co)
    P_in = jnp.concatenate(pe_blocks, axis=-1)  # [Nb, 6F] channel-major

    # tangent PE per direction k: d/dcn_k scaled to physical (fn-grouped)
    t_blocks = []
    for k in range(3):
        dsin = cos_c[k] * fb[None, :] * scales[k]
        dcos = -sin_c[k] * fb[None, :] * scales[k]
        t_blocks.append(jnp.concatenate([dsin, dcos], axis=-1))

    cd_blocks = [
        _pe_block(cd_ref[:, c : c + 1], fb2, f32)[0] for c in range(6)
    ]
    CD = jnp.concatenate(cd_blocks, axis=-1)  # [Nb, 12*F2] channel-major

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    two_f = 2 * n_freqs
    primal_cols, tang_cols = [], []
    for v in range(n_vars):
        w1 = w1_ref[v]
        z = dot(P_in, w1) + b1_ref[v][None, :]
        tz = jnp.concatenate(
            [dot(t_blocks[k], w1[k * two_f : (k + 1) * two_f]) for k in range(3)],
            axis=0,
        )
        mask = (z > 0).astype(f32)
        p = jnp.maximum(z, 0.0)
        t = tz * jnp.concatenate([mask, mask, mask], axis=0)

        w2 = w2_ref[v]
        p = dot(p, w2) + b2_ref[v][None, :]
        t = dot(t, w2)

        cd = dot(CD, wd_ref[v]) + bd_ref[v][None, :]
        c = p + cd + fh_ref[v][None, :]
        tc = t

        f1 = f1_ref[v]
        r = dot(c, f1) + g1_ref[v][None, :]
        tr = dot(tc, f1)
        maskr = (r > 0).astype(f32)
        pr = jnp.maximum(r, 0.0)
        tr = tr * jnp.concatenate([maskr, maskr, maskr], axis=0)

        f2 = f2_ref[v]
        y = dot(pr, f2) + g2_ref[v][None, :] + 2.0 * c
        ty = dot(tr, f2) + 2.0 * tc

        wo = wo_ref[v][None, :].astype(f32)
        o = jnp.sum(y * wo, axis=-1) + bo_ref[v] + ref_ref[:, v]
        to = jnp.sum(ty * wo, axis=-1)
        primal_cols.append(o[:, None])
        tang_cols.append(to.reshape(3, block_n)[:, :, None])

    primal_ref[...] = jnp.concatenate(primal_cols, axis=-1)
    tang_ref[...] = jnp.concatenate(tang_cols, axis=-1)


def fused_decode_jvp_v3(
    weights: DecodeWeights,
    coords: jnp.ndarray,  # [N, 3] physical (x m, y m, t s)
    coord_data: jnp.ndarray,  # [N, 6] normalized conditioning values
    coord_spec,
    block_n: int = 512,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """v3 entry: PE + tangents computed in-kernel; inputs are raw coordinates.

    Removes the [N, 192] x 5 PE/tangent HBM round trips of v1/v2 entirely --
    per point only 3 coords + 6 conditioning values + 6+18 outputs move.
    """
    n = coords.shape[0]
    n_vars = weights.w1.shape[0]
    in_ch = weights.w1.shape[1]
    n_freqs = in_ch // 6  # 2 fns x 3 channels
    n_cd_freqs = in_ch // 2 // 6

    scales = jnp.array(
        [1.0 / (coord_spec.dx * (coord_spec.lon_size - 1)),
         1.0 / (coord_spec.dy * (coord_spec.lat_size - 1)),
         1.0 / coord_spec.pred_t_span], jnp.float32)
    cn = coords.astype(jnp.float32) * scales  # [N, 3]
    cn = jnp.pad(cn, ((0, 0), (0, 5)))  # lane-friendlier [N, 8]
    cd_in = jnp.pad(coord_data.astype(jnp.float32), ((0, 0), (0, 2)))  # [N, 8]

    perm = channel_major_perm(in_ch, 3)
    perm_cd = channel_major_perm(in_ch, 6)
    cdt = compute_dtype
    w1_cm = weights.w1[:, perm, :].astype(cdt)
    wd_cm = weights.wd[:, perm_cd, :].astype(cdt)

    if n % block_n != 0:
        pad = block_n - n % block_n
        cn = jnp.pad(cn, ((0, pad), (0, 0)))
        cd_in = jnp.pad(cd_in, ((0, pad), (0, 0)))
        coord_data = jnp.pad(coord_data, ((0, pad), (0, 0)))
    n_pad = cn.shape[0]
    grid = (n_pad // block_n,)

    fb = jnp.asarray(coord_spec.freq_bands(), jnp.float32)[None]
    fb2 = jnp.asarray(make_freq_bands(n_cd_freqs, 4.0), jnp.float32)[None]
    wt = [w1_cm, weights.b1.astype(jnp.float32),
          weights.w2.astype(cdt), weights.b2.astype(jnp.float32),
          wd_cm, weights.bd.astype(jnp.float32),
          weights.fh_add.astype(jnp.float32),
          weights.f1.astype(cdt), weights.g1.astype(jnp.float32),
          weights.f2.astype(cdt), weights.g2.astype(jnp.float32),
          weights.wo.astype(cdt), weights.bo.astype(jnp.float32)]

    mem = pltpu.VMEM if _HAS_PLTPU else pl.ANY
    full = lambda: pl.BlockSpec(memory_space=mem)
    kernel = functools.partial(
        _decode_kernel_v3, block_n=block_n, n_vars=n_vars, cdt=cdt,
        n_freqs=n_freqs, n_cd_freqs=n_cd_freqs)

    primal, tang = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, n_vars), jnp.float32),
            jax.ShapeDtypeStruct((3, n_pad, n_vars), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((block_n, 8), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((block_n, 8), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((block_n, n_vars), lambda i: (i, 0), memory_space=mem),
        ] + [full() for _ in range(3)] + [full() for _ in wt],
        out_specs=(
            pl.BlockSpec((block_n, n_vars), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((3, block_n, n_vars), lambda i: (0, i, 0), memory_space=mem),
        ),
        interpret=interpret,
    )(cn, cd_in, coord_data.astype(jnp.float32), fb, fb2, scales[None], *wt)
    return primal[:n], tang[:, :n]


class FusedDecodeWeights(NamedTuple):
    """Algebraically collapsed decode weights (kernel/twin v4).

    Because each VariableNet ends in a scalar head (variable_net.py:85 ->
    out_fc [hid, 1]), the trunk output y = F2(relu(F1 c)) + 2c is only ever
    consumed as y . wo.  Re-associating the matmul chain per window:

        r  = p @ (w2 f1) + cd_pe @ (wd f1) + rbias          (full, for relu)
        o  = relu(r) . (f2 wo) + 2 (p . (w2 wo) + cd_pe . (wd wo)) + obias

    eliminates the f2 matmul and the full materialization of c entirely:
    per point per variable the MXU work drops from ~1.87 MFLOP to ~0.82 MFLOP
    (the fusions cost six [256,256]x[256,*] matmuls once per window).
    Same function of the same parameters -- gradients flow through the
    fusion einsums unchanged.
    """

    w1: jnp.ndarray  # [6, in_ch, hid] generated layer 1
    w1c: jnp.ndarray  # [6, 3, in_ch//3, hid] channel-sliced tangent rows
    b1: jnp.ndarray  # [6, hid]
    w2f1: jnp.ndarray  # [6, hid, hid] = w2 @ f1
    wdf1: jnp.ndarray  # [6, in_ch, hid] = wd @ f1
    rbias: jnp.ndarray  # [6, hid] = (b2 + bd + fh_add) @ f1 + g1
    fw2: jnp.ndarray  # [6, hid] = f2 @ wo
    w2wo: jnp.ndarray  # [6, hid] = w2 @ wo
    wdwo: jnp.ndarray  # [6, in_ch] = wd @ wo
    obias: jnp.ndarray  # [6] = g2.wo + 2 (b2 + bd + fh_add).wo + bo


def fuse_decode_weights(w: DecodeWeights) -> FusedDecodeWeights:
    """Per-window f32 weight fusion for the collapsed decode (v4)."""
    cbias = w.b2 + w.bd + w.fh_add  # [6, hid] constant part of c
    return FusedDecodeWeights(
        w1=w.w1,
        w1c=slice_tangent_weights(w.w1),
        b1=w.b1,
        w2f1=jnp.einsum("vij,vjk->vik", w.w2, w.f1),
        wdf1=jnp.einsum("vij,vjk->vik", w.wd, w.f1),
        rbias=jnp.einsum("vj,vjk->vk", cbias, w.f1) + w.g1,
        fw2=jnp.einsum("vjk,vk->vj", w.f2, w.wo),
        w2wo=jnp.einsum("vjk,vk->vj", w.w2, w.wo),
        wdwo=jnp.einsum("vjk,vk->vj", w.wd, w.wo),
        obias=jnp.einsum("vk,vk->v", w.g2, w.wo)
        + 2.0 * jnp.einsum("vk,vk->v", cbias, w.wo)
        + w.bo,
    )


def _v4_epilogue(
    p, t16, CD, ref_col,
    w2f1_v, wdf1_v, rbias_v, fw2_v, w2wo_v, wdwo_v, obias_v,
    *, block_n: int, cdt,
):
    """Collapsed-algebra tail after the first relu: second relu stage + the
    lane reductions producing one variable's primal and tangent rows.

    ONE implementation shared by every v4-algebra kernel (_decode_kernel_v4,
    _residual_kernel_v4 via _v4_var_column, and _decode_kernel_v4pe, whose
    layer-1/t16 prep differs) -- a numerics change here reaches all of them.
    Returns ``(o [Nb], to [3, Nb])`` in f32.
    """
    f32 = jnp.float32

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    rp = dot(p.astype(cdt), w2f1_v) + dot(CD, wdf1_v) + rbias_v[None, :]  # [Nb, hid]
    rt = dot(t16, w2f1_v)  # [3Nb, hid]
    return _v4_stage2(p, t16, rp, rt, CD, ref_col,
                      fw2_v, w2wo_v, wdwo_v, obias_v, block_n=block_n)


def _v4_stage2(
    p, t16, rp, rt, CD, ref_col,
    fw2_v, w2wo_v, wdwo_v, obias_v,
    *, block_n: int,
):
    """Pure-VPU tail of the v4 epilogue: second relu + the lane reductions.

    Split out of ``_v4_epilogue`` so the pipelined kernel can interleave it
    one variable behind the MXU stage (``_v4_stage1``); numerics are
    op-for-op identical to the original epilogue tail."""
    f32 = jnp.float32
    maskr = rp > 0
    pr = jnp.maximum(rp, 0.0)
    tr = jnp.where(jnp.concatenate([maskr, maskr, maskr], axis=0), rt, 0.0)

    fw2 = fw2_v[None, :].astype(f32)
    w2wo = w2wo_v[None, :].astype(f32)
    wdwo = wdwo_v[None, :].astype(f32)
    o = (
        jnp.sum(pr * fw2, axis=-1)
        + 2.0 * (jnp.sum(p * w2wo, axis=-1) + jnp.sum(CD.astype(f32) * wdwo, axis=-1))
        + obias_v
        + ref_col
    )  # [Nb]
    to = (jnp.sum(tr * fw2, axis=-1)
          + 2.0 * jnp.sum(t16.astype(f32) * w2wo, axis=-1))  # [3Nb]
    return o, to.reshape(3, block_n)


def _v4_stage1(
    P_in, T_in, CD,
    w1_ref, w1c_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
    *, v: int, cdt,
):
    """MXU phase of one variable's v4 column: both relu-layer pre-activations
    plus the tangent trunk matmuls; op-for-op the matmul prefix of
    ``_v4_var_column`` + ``_v4_epilogue``.  Returns ``(p, t16, rp, rt)``."""
    f32 = jnp.float32

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    z = dot(P_in, w1_ref[v]) + b1_ref[v][None, :]
    mask = z > 0
    p = jnp.maximum(z, 0.0)
    t16 = jnp.concatenate(
        [jnp.where(mask, dot(T_in[k], w1c_ref[v, k]), 0.0).astype(cdt)
         for k in range(3)], axis=0)  # [3Nb, hid]
    rp = dot(p.astype(cdt), w2f1_ref[v]) + dot(CD, wdf1_ref[v]) + rbias_ref[v][None, :]
    rt = dot(t16, w2f1_ref[v])
    return p, t16, rp, rt


def _v4_var_column(
    P_in, T_in, CD, ref_col,
    w1_ref, w1c_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
    fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
    *, v: int, block_n: int, cdt,
):
    """One variable's collapsed-algebra primal + 3 tangents inside a kernel.

    Shared by the decode kernel (_decode_kernel_v4) and the residual-assembly
    kernel (ops/residual_kernel.py); returns ``(o [Nb], to [3, Nb])`` in f32.
    """
    f32 = jnp.float32

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    z = dot(P_in, w1_ref[v]) + b1_ref[v][None, :]
    mask = z > 0
    p = jnp.maximum(z, 0.0)  # f32: feeds the w2wo reduction of o
    # masked tangents staged in cdt: they only feed matmuls and one
    # reduction, and the smaller buffers keep block_n=512 inside VMEM
    t16 = jnp.concatenate(
        [jnp.where(mask, dot(T_in[k], w1c_ref[v, k]), 0.0).astype(cdt)
         for k in range(3)], axis=0)  # [3Nb, hid]

    return _v4_epilogue(
        p, t16, CD, ref_col,
        w2f1_ref[v], wdf1_ref[v], rbias_ref[v], fw2_ref[v], w2wo_ref[v],
        wdwo_ref[v], obias_ref[v], block_n=block_n, cdt=cdt,
    )


def _decode_kernel_v4(
    pe_ref, dpe_ref, cdpe_ref, ref_ref,
    w1_ref, w1c_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
    fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
    primal_ref, tang_ref,
    *, block_n: int, n_vars: int, cdt, t_layout: bool = False,
):
    """v4: collapsed-algebra decode + 3 tangents (see FusedDecodeWeights).

    Per variable: two relu layers' pre-activations are the only full-width
    matmuls; primal and the 3 tangent rows share the big [4Nb, hid] trunk
    matmul; everything after the second relu is lane reductions on the VPU.

    ``t_layout=True`` is the var-major variant: ``ref`` arrives transposed
    [6, Nb] and the outputs are written as [n_vars, Nb] / [3, n_vars, Nb].
    The per-variable rows ``o``/``to3`` come out of the lane reductions
    lane-major, so stacking them on the SUBLANE axis is free, while the
    [Nb, 6] column form pays a lane->sublane relayout per variable (the
    residual kernel's row-vs-column epilogue A/B measured that relayout at
    ~16%: 18.2M vs 15.3M evals/s) -- and the var-major HBM layout is what
    the packed [6, N] residual assembly consumes directly (docs/PERF.md
    round 4 (e)).
    """
    P_in = pe_ref[...]  # [Nb, in_ch] cdt
    T_in = dpe_ref[...]  # [3, Nb, in_ch//3] cdt compact
    CD = cdpe_ref[...]  # [Nb, in_ch] cdt

    primal_cols, tang_cols = [], []
    for v in range(n_vars):
        o, to3 = _v4_var_column(
            P_in, T_in, CD, ref_ref[v] if t_layout else ref_ref[:, v],
            w1_ref, w1c_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
            fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
            v=v, block_n=block_n, cdt=cdt,
        )
        if t_layout:
            primal_cols.append(o[None, :])  # [1, Nb] lane-major row
            tang_cols.append(to3[:, None, :])  # [3, 1, Nb]
        else:
            primal_cols.append(o[:, None])
            tang_cols.append(to3[:, :, None])

    axis = 0 if t_layout else -1
    primal_ref[...] = jnp.concatenate(primal_cols, axis=axis).astype(primal_ref.dtype)
    tang_ref[...] = jnp.concatenate(tang_cols, axis=1 if t_layout else -1).astype(
        tang_ref.dtype)


def _decode_kernel_v4t_pipe(
    pe_ref, dpe_ref, cdpe_ref, ref_ref,
    w1_ref, w1c_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
    fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
    primal_ref, tang_ref,
    *, block_n: int, n_vars: int, cdt,
):
    """Software-pipelined var-major v4: variable v's pure-VPU epilogue
    (``_v4_stage2``) is emitted AFTER variable v+1's MXU stage
    (``_v4_stage1``) in program order, so the in-order issue stream lets the
    VPU reductions of one variable overlap the matmuls of the next instead
    of serializing (the fwd kernel measured 58.9% MFU vs the bwd's 83.5% on
    the same matmul mix -- docs/PERF.md round 4 (f); roofline puts the
    epilogue's ~42K VPU ops/pt at ~44% of VPU capacity, which under full
    serialization reproduces the observed rate).  Identical math to
    ``_decode_kernel_v4(t_layout=True)``: both stages are op-for-op splits
    of the same code, so parity is bitwise."""
    P_in = pe_ref[...]
    T_in = dpe_ref[...]
    CD = cdpe_ref[...]

    primal_rows, tang_rows = [], []

    def flush(staged):
        v, (p, t16, rp, rt) = staged
        o, to3 = _v4_stage2(p, t16, rp, rt, CD, ref_ref[v],
                            fw2_ref[v], w2wo_ref[v], wdwo_ref[v], obias_ref[v],
                            block_n=block_n)
        primal_rows.append(o[None, :])
        tang_rows.append(to3[:, None, :])

    staged = None
    for v in range(n_vars):
        cur = _v4_stage1(P_in, T_in, CD,
                         w1_ref, w1c_ref, b1_ref, w2f1_ref, wdf1_ref,
                         rbias_ref, v=v, cdt=cdt)
        if staged is not None:
            flush(staged)
        staged = (v, cur)
    flush(staged)

    primal_ref[...] = jnp.concatenate(primal_rows, axis=0).astype(primal_ref.dtype)
    tang_ref[...] = jnp.concatenate(tang_rows, axis=1).astype(tang_ref.dtype)


def fused_decode_jvp_v4(
    fw: FusedDecodeWeights,
    pe: jnp.ndarray,  # [N, in_ch] f32
    dpe: jnp.ndarray,  # [3, N, in_ch//3] f32 compact
    cd_pe: jnp.ndarray,  # [N, in_ch] f32
    ref: jnp.ndarray,  # [N, 6] normalized conditioning values (residual head)
    block_n: int = 256,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    vmem_limit_bytes: int = 0,
    out_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Primal [N, 6] + tangents [3, N, 6] via the collapsed v4 kernel.

    block_n=256 fits the default 16 MB scoped-VMEM limit; larger blocks need
    ``vmem_limit_bytes`` raised (v5e has 128 MB physical VMEM).
    ``out_dtype=bfloat16`` halves the output HBM traffic (perf experiment;
    accumulation stays f32 in-kernel)."""
    n, in_ch = pe.shape
    ch = dpe.shape[-1]
    n_vars = fw.w1.shape[0]
    if n % block_n != 0:
        pad = block_n - n % block_n
        pe = jnp.pad(pe, ((0, pad), (0, 0)))
        dpe = jnp.pad(dpe, ((0, 0), (0, pad), (0, 0)))
        cd_pe = jnp.pad(cd_pe, ((0, pad), (0, 0)))
        ref = jnp.pad(ref, ((0, pad), (0, 0)))
    n_pad = pe.shape[0]
    grid = (n_pad // block_n,)

    cd = compute_dtype
    f32 = jnp.float32
    wt = [fw.w1.astype(cd), fw.w1c.astype(cd), fw.b1.astype(f32),
          fw.w2f1.astype(cd), fw.wdf1.astype(cd), fw.rbias.astype(f32),
          fw.fw2.astype(f32), fw.w2wo.astype(f32), fw.wdwo.astype(f32),
          fw.obias.astype(f32)]

    mem = pltpu.VMEM if _HAS_PLTPU else pl.ANY
    full = lambda: pl.BlockSpec(memory_space=mem)
    kernel = functools.partial(_decode_kernel_v4, block_n=block_n, n_vars=n_vars, cdt=cd)
    extra = {}
    if vmem_limit_bytes and _HAS_PLTPU and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))

    primal, tang = pl.pallas_call(
        kernel,
        grid=grid,
        **extra,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, n_vars), out_dtype),
            jax.ShapeDtypeStruct((3, n_pad, n_vars), out_dtype),
        ),
        in_specs=[
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((3, block_n, ch), lambda i: (0, i, 0), memory_space=mem),
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((block_n, n_vars), lambda i: (i, 0), memory_space=mem),
        ] + [full() for _ in wt],
        out_specs=(
            pl.BlockSpec((block_n, n_vars), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((3, block_n, n_vars), lambda i: (0, i, 0), memory_space=mem),
        ),
        interpret=interpret,
    )(pe.astype(cd), dpe.astype(cd), cd_pe.astype(cd), ref.astype(jnp.float32), *wt)
    return primal[:n], tang[:, :n]


def fused_decode_jvp_v4t(
    fw: FusedDecodeWeights,
    pe: jnp.ndarray,  # [N, in_ch] f32
    dpe: jnp.ndarray,  # [3, N, in_ch//3] f32 compact
    cd_pe: jnp.ndarray,  # [N, in_ch] f32
    ref_t: jnp.ndarray,  # [6, N] TRANSPOSED conditioning values
    block_n: int = 256,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    pipeline: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Var-major twin of fused_decode_jvp_v4: primal [6, N] + tangents [3, 6, N].

    ``pipeline=True`` selects the software-pipelined kernel body
    (``_decode_kernel_v4t_pipe``): identical math, epilogue of variable v
    interleaved after the matmuls of variable v+1.

    Same math, transposed output layout: each variable's lane-major row is
    written straight to its sublane slot, skipping the per-variable
    lane->sublane relayout of the [N, 6] column form AND producing the layout
    the packed residual assembly (physics/engine.py::residual_losses_packed)
    and the data loss consume with zero XLA-side transposes of lane-padded
    minor-dim-6 buffers (docs/PERF.md round 4 (e)/(f))."""
    n, in_ch = pe.shape
    ch = dpe.shape[-1]
    n_vars = fw.w1.shape[0]
    if n % block_n != 0:
        pad = block_n - n % block_n
        pe = jnp.pad(pe, ((0, pad), (0, 0)))
        dpe = jnp.pad(dpe, ((0, 0), (0, pad), (0, 0)))
        cd_pe = jnp.pad(cd_pe, ((0, pad), (0, 0)))
        ref_t = jnp.pad(ref_t, ((0, 0), (0, pad)))
    n_pad = pe.shape[0]
    grid = (n_pad // block_n,)

    cd = compute_dtype
    f32 = jnp.float32
    wt = [fw.w1.astype(cd), fw.w1c.astype(cd), fw.b1.astype(f32),
          fw.w2f1.astype(cd), fw.wdf1.astype(cd), fw.rbias.astype(f32),
          fw.fw2.astype(f32), fw.w2wo.astype(f32), fw.wdwo.astype(f32),
          fw.obias.astype(f32)]

    mem = pltpu.VMEM if _HAS_PLTPU else pl.ANY
    full = lambda: pl.BlockSpec(memory_space=mem)
    if pipeline:
        kernel = functools.partial(_decode_kernel_v4t_pipe, block_n=block_n,
                                   n_vars=n_vars, cdt=cd)
    else:
        kernel = functools.partial(_decode_kernel_v4, block_n=block_n,
                                   n_vars=n_vars, cdt=cd, t_layout=True)

    primal, tang = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((n_vars, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((3, n_vars, n_pad), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((3, block_n, ch), lambda i: (0, i, 0), memory_space=mem),
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((n_vars, block_n), lambda i: (0, i), memory_space=mem),
        ] + [full() for _ in wt],
        out_specs=(
            pl.BlockSpec((n_vars, block_n), lambda i: (0, i), memory_space=mem),
            pl.BlockSpec((3, n_vars, block_n), lambda i: (0, 0, i), memory_space=mem),
        ),
        interpret=interpret,
    )(pe.astype(cd), dpe.astype(cd), cd_pe.astype(cd), ref_t.astype(jnp.float32), *wt)
    return primal[:, :n], tang[:, :, :n]


def decode_jvp_xla_v4(
    fw: FusedDecodeWeights,
    pe: jnp.ndarray,
    dpe: jnp.ndarray,  # [3, N, in_ch//3] compact
    cd_pe: jnp.ndarray,
    ref: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA twin of the v4 kernel: identical collapsed math, plain jnp.

    Fully differentiable -- this is both the CPU fallback and the function
    whose VJP backs the trainable kernel wrapper; it is also the decode used
    by the ``pde_engine='jvp'`` training path (the analytic forward-mode
    replacement for jax.linearize with the cheap algebra).
    """
    cdt = compute_dtype
    f32 = jnp.float32

    def dot(a, w):
        return jnp.einsum("...i,io->...o", a.astype(cdt), w.astype(cdt),
                          preferred_element_type=f32)

    primal_cols, tang_cols = [], []
    for v in range(fw.w1.shape[0]):
        z = dot(pe, fw.w1[v]) + fw.b1[v]
        tz = jnp.stack([dot(dpe[k], fw.w1c[v, k]) for k in range(3)], 0)  # [3, N, hid]
        mask = (z > 0).astype(f32)
        p = jnp.maximum(z, 0.0)
        t = tz * mask[None]
        r = dot(p, fw.w2f1[v]) + dot(cd_pe, fw.wdf1[v]) + fw.rbias[v]
        maskr = (r > 0).astype(f32)
        pr = jnp.maximum(r, 0.0)
        tr = dot(t, fw.w2f1[v]) * maskr[None]
        o = (jnp.sum(pr * fw.fw2[v], -1)
             + 2.0 * (jnp.sum(p * fw.w2wo[v], -1) + jnp.sum(cd_pe.astype(f32) * fw.wdwo[v], -1))
             + fw.obias[v] + ref[:, v])
        to = jnp.sum(tr * fw.fw2[v], -1) + 2.0 * jnp.sum(t * fw.w2wo[v], -1)
        primal_cols.append(o)
        tang_cols.append(to)
    primal = jnp.stack(primal_cols, -1)  # [N, 6]
    tang = jnp.stack(tang_cols, -1)  # [3, N, 6]
    return primal, tang


def decode_xla_v4_primal(
    fw: FusedDecodeWeights,
    pe: jnp.ndarray,  # [N, in_ch] (pe_and_tangents layout)
    cd_pe: jnp.ndarray,  # [N, in_ch]
    ref: jnp.ndarray,  # [N, 6] normalized conditioning values
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Primal-only collapsed decode: [N, 6] normalized outputs, no tangents.

    The cheap pure-decode path (same per-point algebra as decode_jvp_xla_v4
    minus the tangent chains): ~2.3x fewer matmul FLOPs than
    ``PhysicsNet.decode`` for the identical function of the same parameters.
    Used FORWARD-ONLY -- inference sweeps and the full-grid RMSE scan (via
    engine.collapsed_decode); differentiable, but training's data-only branch
    keeps the plain decode (this path's VJP measured slower, docs/PERF.md)."""
    cdt = compute_dtype
    f32 = jnp.float32

    def dot(a, w):
        return jnp.einsum("...i,io->...o", a.astype(cdt), w.astype(cdt),
                          preferred_element_type=f32)

    cols = []
    for v in range(fw.w1.shape[0]):
        p = jnp.maximum(dot(pe, fw.w1[v]) + fw.b1[v], 0.0)
        r = dot(p, fw.w2f1[v]) + dot(cd_pe, fw.wdf1[v]) + fw.rbias[v]
        pr = jnp.maximum(r, 0.0)
        o = (jnp.sum(pr * fw.fw2[v], -1)
             + 2.0 * (jnp.sum(p * fw.w2wo[v], -1)
                      + jnp.sum(cd_pe.astype(f32) * fw.wdwo[v], -1))
             + fw.obias[v] + ref[:, v])
        cols.append(o)
    return jnp.stack(cols, -1)  # [N, 6]


def _decode_kernel_v4_primal(
    pe_ref, cdpe_ref, ref_ref,
    w1_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
    fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
    out_ref,
    *, n_vars: int, cdt,
):
    """Primal-only collapsed decode, var-major output [n_vars, Nb].

    The tangent-free sibling of ``_decode_kernel_v4(t_layout=True)``: per
    variable just the two relu-layer matmuls plus the three lane reductions
    -- the matmul prefix/epilogue of ``_v4_var_column`` with every tangent
    op deleted.  Forward decode only, no derivatives (reference behavior:
    the torch model's plain forward in test/inference mode,
    interface_physics.py:1407-1527).  Measured NEGATIVE vs the XLA twin for
    this forward-only op (docs/PERF.md round 4 (k)) -- kept as a selectable,
    parity-tested variant behind engine.collapsed_decode_t(use_kernel=True);
    the shipping inference/eval paths use the XLA var-major form."""
    f32 = jnp.float32
    P_in = pe_ref[...]  # [Nb, in_ch] cdt
    CD = cdpe_ref[...]  # [Nb, in_ch] cdt
    CD32 = CD.astype(f32)

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    rows = []
    for v in range(n_vars):
        z = dot(P_in, w1_ref[v]) + b1_ref[v][None, :]
        p = jnp.maximum(z, 0.0)  # [Nb, hid] f32
        rp = dot(p.astype(cdt), w2f1_ref[v]) + dot(CD, wdf1_ref[v]) + rbias_ref[v][None, :]
        pr = jnp.maximum(rp, 0.0)
        o = (
            jnp.sum(pr * fw2_ref[v][None, :].astype(f32), axis=-1)
            + 2.0 * (jnp.sum(p * w2wo_ref[v][None, :].astype(f32), axis=-1)
                     + jnp.sum(CD32 * wdwo_ref[v][None, :].astype(f32), axis=-1))
            + obias_ref[v]
            + ref_ref[v]
        )  # [Nb]
        rows.append(o[None, :])
    out_ref[...] = jnp.concatenate(rows, axis=0).astype(out_ref.dtype)


def decode_primal_v4t(
    fw: FusedDecodeWeights,
    pe: jnp.ndarray,  # [N, in_ch] f32
    cd_pe: jnp.ndarray,  # [N, in_ch] f32
    ref_t: jnp.ndarray,  # [6, N] TRANSPOSED conditioning values
    block_n: int = 512,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Var-major primal-only Pallas decode: [6, N] normalized outputs.

    The kernel twin of ``decode_xla_v4_primal`` (same collapsed algebra, no
    tangents) in the round-4 var-major IO layout; forward-only by policy,
    like the XLA form.  With no tangent buffers the per-block VMEM footprint
    is small, so the default block is 512 (vs 256 for the jvp kernels)."""
    n, in_ch = pe.shape
    n_vars = fw.w1.shape[0]
    if n % block_n != 0:
        pad = block_n - n % block_n
        pe = jnp.pad(pe, ((0, pad), (0, 0)))
        cd_pe = jnp.pad(cd_pe, ((0, pad), (0, 0)))
        ref_t = jnp.pad(ref_t, ((0, 0), (0, pad)))
    n_pad = pe.shape[0]
    grid = (n_pad // block_n,)

    cd = compute_dtype
    f32 = jnp.float32
    wt = [fw.w1.astype(cd), fw.b1.astype(f32),
          fw.w2f1.astype(cd), fw.wdf1.astype(cd), fw.rbias.astype(f32),
          fw.fw2.astype(f32), fw.w2wo.astype(f32), fw.wdwo.astype(f32),
          fw.obias.astype(f32)]

    mem = pltpu.VMEM if _HAS_PLTPU else pl.ANY
    full = lambda: pl.BlockSpec(memory_space=mem)
    kernel = functools.partial(_decode_kernel_v4_primal, n_vars=n_vars, cdt=cd)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((n_vars, n_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((n_vars, block_n), lambda i: (0, i), memory_space=mem),
        ] + [full() for _ in wt],
        out_specs=pl.BlockSpec((n_vars, block_n), lambda i: (0, i),
                               memory_space=mem),
        interpret=interpret,
    )(pe.astype(cd), cd_pe.astype(cd), ref_t.astype(jnp.float32), *wt)
    return out[:, :n]


def decode_xla_v4t_primal(
    fw: FusedDecodeWeights,
    pe: jnp.ndarray,  # [N, in_ch]
    cd_pe: jnp.ndarray,  # [N, in_ch]
    ref_t: jnp.ndarray,  # [6, N]
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """XLA twin of ``decode_primal_v4t``: [6, N] var-major, plain jnp.

    Row-for-row the same math as ``decode_xla_v4_primal`` with the output
    stacked on axis 0 instead of -1 (the CPU / non-TPU fallback behind
    ``engine.collapsed_decode_t``)."""
    cdt = compute_dtype
    f32 = jnp.float32

    def dot(a, w):
        return jnp.einsum("...i,io->...o", a.astype(cdt), w.astype(cdt),
                          preferred_element_type=f32)

    rows = []
    for v in range(fw.w1.shape[0]):
        p = jnp.maximum(dot(pe, fw.w1[v]) + fw.b1[v], 0.0)
        r = dot(p, fw.w2f1[v]) + dot(cd_pe, fw.wdf1[v]) + fw.rbias[v]
        pr = jnp.maximum(r, 0.0)
        o = (jnp.sum(pr * fw.fw2[v], -1)
             + 2.0 * (jnp.sum(p * fw.w2wo[v], -1)
                      + jnp.sum(cd_pe.astype(f32) * fw.wdwo[v], -1))
             + fw.obias[v] + ref_t[v])
        rows.append(o)
    return jnp.stack(rows, 0)  # [6, N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_decode_jvp_trainable_v4(fw, pe, dpe, cd_pe, ref,
                                  block_n=256, compute_dtype=jnp.bfloat16):
    """Differentiable v4 decode: Pallas kernel forward, XLA-twin backward.

    Gradients are exact for the fused weights and ``ref``; the pe/dpe/cd_pe
    cotangents come from the twin's VJP (in training they are data and
    stop-gradient'd upstream -- physics/engine.py:fused_kernel_fields).
    """
    if _HAS_PLTPU and jax.default_backend() == "tpu":
        return fused_decode_jvp_v4(fw, pe, dpe, cd_pe, ref,
                                   block_n=block_n, compute_dtype=compute_dtype)
    return decode_jvp_xla_v4(fw, pe, dpe, cd_pe, ref, compute_dtype)


def _fused_trainable_v4_fwd(fw, pe, dpe, cd_pe, ref, block_n, compute_dtype):
    out = fused_decode_jvp_trainable_v4(fw, pe, dpe, cd_pe, ref, block_n, compute_dtype)
    return out, (fw, pe, dpe, cd_pe, ref)


def _fused_trainable_v4_bwd(block_n, compute_dtype, res, g):
    fw, pe, dpe, cd_pe, ref = res
    _, vjp = jax.vjp(
        lambda w, a, b, c, r: decode_jvp_xla_v4(w, a, b, c, r, compute_dtype),
        fw, pe, dpe, cd_pe, ref,
    )
    return vjp(g)


fused_decode_jvp_trainable_v4.defvjp(_fused_trainable_v4_fwd, _fused_trainable_v4_bwd)


def _decode_kernel_v5(
    pe_ref, dpe_ref, cdpe_ref, ref_ref,
    w1s_ref, w1cs_ref, b1s_ref, w2f1_ref, wdf1s_ref, rbias_ref,
    fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
    primal_ref, tang_ref,
    *, block_n: int, n_vars: int, hid: int, cdt,
):
    """v5: v4 algebra with the per-variable layer-1 / conditioning matmuls
    column-stacked into single wide ops.

    The v4 kernel issues ~42 tiny dots per block (each ~0.13 us of MXU work),
    so op dispatch dominates.  Stacking all 6 variables' L1, tangent-L1 and
    wd@f1 matmuls into [Nb, in] x [in, 6*hid] ops cuts that stage's op count
    6x; the trunk (block-diagonal in stacked space) stays per-variable on
    lane-aligned slices.
    """
    f32 = jnp.float32
    P_in = pe_ref[...]
    T_in = dpe_ref[...]
    CD = cdpe_ref[...]

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    z_all = dot(P_in, w1s_ref[...]) + b1s_ref[...]  # [Nb, 6*hid]
    mask_all = z_all > 0
    p_all = jnp.maximum(z_all, 0.0)
    t16_all = [
        jnp.where(mask_all, dot(T_in[k], w1cs_ref[k]), 0.0).astype(cdt)
        for k in range(3)
    ]  # 3 x [Nb, 6*hid]
    cdr_all = dot(CD, wdf1s_ref[...]) + rbias_ref[...]  # [Nb, 6*hid]

    primal_cols, tang_cols = [], []
    for v in range(n_vars):
        sl = slice(v * hid, (v + 1) * hid)
        p = p_all[:, sl]
        W = w2f1_ref[v]
        rp = dot(p.astype(cdt), W) + cdr_all[:, sl]
        t16 = jnp.concatenate([t16_all[k][:, sl] for k in range(3)], axis=0)
        rt = dot(t16, W)
        maskr = rp > 0
        pr = jnp.maximum(rp, 0.0)
        tr = jnp.where(jnp.concatenate([maskr, maskr, maskr], axis=0), rt, 0.0)

        fw2 = fw2_ref[v][None, :].astype(f32)
        w2wo = w2wo_ref[v][None, :].astype(f32)
        wdwo = wdwo_ref[v][None, :].astype(f32)
        o = (jnp.sum(pr * fw2, axis=-1)
             + 2.0 * (jnp.sum(p * w2wo, axis=-1)
                      + jnp.sum(CD.astype(f32) * wdwo, axis=-1))
             + obias_ref[v] + ref_ref[:, v])
        to = (jnp.sum(tr * fw2, axis=-1)
              + 2.0 * jnp.sum(t16.astype(f32) * w2wo, axis=-1))
        primal_cols.append(o[:, None])
        tang_cols.append(to.reshape(3, block_n)[:, :, None])

    primal_ref[...] = jnp.concatenate(primal_cols, axis=-1)
    tang_ref[...] = jnp.concatenate(tang_cols, axis=-1)


def fused_decode_jvp_v5(
    fw: FusedDecodeWeights,
    pe: jnp.ndarray,
    dpe: jnp.ndarray,
    cd_pe: jnp.ndarray,
    ref: jnp.ndarray,
    block_n: int = 256,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    vmem_limit_bytes: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """v5 entry: restacks the fused weights column-wise per window in XLA."""
    n, in_ch = pe.shape
    ch = dpe.shape[-1]
    n_vars, _, hid = fw.w1.shape
    if n % block_n != 0:
        pad = block_n - n % block_n
        pe = jnp.pad(pe, ((0, pad), (0, 0)))
        dpe = jnp.pad(dpe, ((0, 0), (0, pad), (0, 0)))
        cd_pe = jnp.pad(cd_pe, ((0, pad), (0, 0)))
        ref = jnp.pad(ref, ((0, pad), (0, 0)))
    n_pad = pe.shape[0]
    grid = (n_pad // block_n,)

    cd = compute_dtype
    f32 = jnp.float32
    # column-stack across variables: [6, in, hid] -> [in, 6*hid]
    stack = lambda w: jnp.moveaxis(w, 0, 1).reshape(w.shape[1], n_vars * hid)
    w1s = stack(fw.w1).astype(cd)
    w1cs = jnp.stack([stack(fw.w1c[:, k]) for k in range(3)]).astype(cd)  # [3, ch, 6h]
    wdf1s = stack(fw.wdf1).astype(cd)
    b1s = fw.b1.reshape(1, -1).astype(f32)  # [1, 6*hid] (var-major rows -> cols)
    rbias_s = fw.rbias.reshape(1, -1).astype(f32)

    wt = [w1s, w1cs, b1s, fw.w2f1.astype(cd), wdf1s, rbias_s,
          fw.fw2.astype(f32), fw.w2wo.astype(f32), fw.wdwo.astype(f32),
          fw.obias.astype(f32)]

    mem = pltpu.VMEM if _HAS_PLTPU else pl.ANY
    full = lambda: pl.BlockSpec(memory_space=mem)
    kernel = functools.partial(_decode_kernel_v5, block_n=block_n,
                               n_vars=n_vars, hid=hid, cdt=cd)
    extra = {}
    if vmem_limit_bytes and _HAS_PLTPU and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))

    primal, tang = pl.pallas_call(
        kernel,
        grid=grid,
        **extra,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, n_vars), jnp.float32),
            jax.ShapeDtypeStruct((3, n_pad, n_vars), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((3, block_n, ch), lambda i: (0, i, 0), memory_space=mem),
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((block_n, n_vars), lambda i: (i, 0), memory_space=mem),
        ] + [full() for _ in wt],
        out_specs=(
            pl.BlockSpec((block_n, n_vars), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((3, block_n, n_vars), lambda i: (0, i, 0), memory_space=mem),
        ),
        interpret=interpret,
    )(pe.astype(cd), dpe.astype(cd), cd_pe.astype(cd), ref.astype(jnp.float32), *wt)
    return primal[:n], tang[:, :n]


def _decode_kernel_v4pe(
    cn_ref, cd_ref, ref_ref, fb_ref, fb2_ref, scales_ref,
    w1_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
    fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
    primal_ref, tang_ref,
    *, block_n: int, n_vars: int, cdt, n_freqs: int, n_cd_freqs: int,
):
    """v4 collapsed algebra with the PE computed on the VPU inside the kernel.

    Inputs per block shrink from [Nb, 192]x2 + [3, Nb, 64] prepared features
    to [Nb, 8] coords + [Nb, 8] conditioning values: no XLA prep pipeline, no
    feature HBM round trip (the >50K-point VMEM spill of the prep is the
    round-2 perf item b).  W1 / wd-fused weights arrive channel-major
    (channel_major_perm) so each PE block is a plain concat and direction-k
    tangent weights are contiguous row slices (the v3 trick on v4 algebra).
    """
    f32 = jnp.float32
    fb = fb_ref[0]  # [F] coord freq bands
    fb2 = fb2_ref[0]  # [F2] conditioning freq bands
    scales = scales_ref[0]  # [3]

    pe_blocks, sin_c, cos_c = [], [], []
    for c in range(3):
        blk, s, co = _pe_block(cn_ref[:, c : c + 1], fb, f32)
        pe_blocks.append(blk)
        sin_c.append(s)
        cos_c.append(co)
    P_in = jnp.concatenate(pe_blocks, axis=-1).astype(cdt)  # [Nb, 6F] cm

    t_blocks = []
    for k in range(3):
        dsin = cos_c[k] * fb[None, :] * scales[k]
        dcos = -sin_c[k] * fb[None, :] * scales[k]
        t_blocks.append(jnp.concatenate([dsin, dcos], axis=-1).astype(cdt))

    CD = jnp.concatenate(
        [_pe_block(cd_ref[:, c : c + 1], fb2, f32)[0] for c in range(6)],
        axis=-1).astype(cdt)  # [Nb, 12*F2] cm

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    two_f = 2 * n_freqs
    primal_cols, tang_cols = [], []
    for v in range(n_vars):
        w1 = w1_ref[v]
        z = dot(P_in, w1) + b1_ref[v][None, :]
        mask = z > 0
        p = jnp.maximum(z, 0.0)
        t16 = jnp.concatenate(
            [jnp.where(mask, dot(t_blocks[k], w1[k * two_f : (k + 1) * two_f]),
                       0.0).astype(cdt)
             for k in range(3)], axis=0)  # [3Nb, hid]

        o, to = _v4_epilogue(
            p, t16, CD, ref_ref[:, v],
            w2f1_ref[v], wdf1_ref[v], rbias_ref[v], fw2_ref[v], w2wo_ref[v],
            wdwo_ref[v], obias_ref[v], block_n=block_n, cdt=cdt,
        )
        primal_cols.append(o[:, None])
        tang_cols.append(to[:, :, None])

    primal_ref[...] = jnp.concatenate(primal_cols, axis=-1)
    tang_ref[...] = jnp.concatenate(tang_cols, axis=-1)


def fused_decode_jvp_v4pe(
    fw: FusedDecodeWeights,
    coords: jnp.ndarray,  # [N, 3] physical (x m, y m, t s)
    coord_data: jnp.ndarray,  # [N, 6] normalized conditioning values
    coord_spec,
    block_n: int = 256,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    vmem_limit_bytes: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """v4 algebra + in-kernel PE: raw coordinates in, (primal, tangents) out.

    Per point only 3 coords + 6 conditioning values + 6 + 18 outputs cross
    HBM -- the whole pe/dpe/cd_pe prep (the piece that spills VMEM past ~50K
    points and forces chunked inference) disappears.  Weight layout: the
    channel-major permutation is applied per window in XLA (cheap einsum-free
    gathers over [6, 192, hid])."""
    n = coords.shape[0]
    n_vars, in_ch, hid = fw.w1.shape
    n_freqs = in_ch // 6
    n_cd_freqs = in_ch // 2 // 6
    if n_freqs != coord_spec.n_freqs:
        raise ValueError(
            f"v4pe: decode in_channels {in_ch} implies {n_freqs} coord freqs "
            f"but coord_spec.n_freqs={coord_spec.n_freqs}")

    scales = jnp.array(
        [1.0 / (coord_spec.dx * (coord_spec.lon_size - 1)),
         1.0 / (coord_spec.dy * (coord_spec.lat_size - 1)),
         1.0 / coord_spec.pred_t_span], jnp.float32)
    cn = coords.astype(jnp.float32) * scales
    cn = jnp.pad(cn, ((0, 0), (0, 5)))  # lane-friendlier [N, 8]
    cd_in = jnp.pad(coord_data.astype(jnp.float32), ((0, 0), (0, 2)))
    ref = coord_data.astype(jnp.float32)

    perm = channel_major_perm(in_ch, 3)
    perm_cd = channel_major_perm(in_ch, 6)
    cdt = compute_dtype
    f32 = jnp.float32
    w1_cm = fw.w1[:, perm, :].astype(cdt)
    wdf1_cm = fw.wdf1[:, perm_cd, :].astype(cdt)
    wdwo_cm = fw.wdwo[:, perm_cd].astype(f32)

    if n % block_n != 0:
        pad = block_n - n % block_n
        cn = jnp.pad(cn, ((0, pad), (0, 0)))
        cd_in = jnp.pad(cd_in, ((0, pad), (0, 0)))
        ref = jnp.pad(ref, ((0, pad), (0, 0)))
    n_pad = cn.shape[0]
    grid = (n_pad // block_n,)

    # coordinate bands from the spec (max_freq is a config knob); the
    # conditioning-value PE is fixed at max_freq 4.0 everywhere
    # (engine._kernel_inputs / models/variable_net.py)
    fb = jnp.asarray(coord_spec.freq_bands(), jnp.float32)[None]
    fb2 = jnp.asarray(make_freq_bands(n_cd_freqs, 4.0), jnp.float32)[None]
    wt = [w1_cm, fw.b1.astype(f32), fw.w2f1.astype(cdt), wdf1_cm,
          fw.rbias.astype(f32), fw.fw2.astype(f32), fw.w2wo.astype(f32),
          wdwo_cm, fw.obias.astype(f32)]

    mem = pltpu.VMEM if _HAS_PLTPU else pl.ANY
    full = lambda: pl.BlockSpec(memory_space=mem)
    kernel = functools.partial(
        _decode_kernel_v4pe, block_n=block_n, n_vars=n_vars, cdt=cdt,
        n_freqs=n_freqs, n_cd_freqs=n_cd_freqs)
    extra = {}
    if vmem_limit_bytes and _HAS_PLTPU and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))

    primal, tang = pl.pallas_call(
        kernel,
        grid=grid,
        **extra,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, n_vars), jnp.float32),
            jax.ShapeDtypeStruct((3, n_pad, n_vars), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((block_n, 8), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((block_n, 8), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((block_n, n_vars), lambda i: (i, 0), memory_space=mem),
        ] + [full() for _ in range(3)] + [full() for _ in wt],
        out_specs=(
            pl.BlockSpec((block_n, n_vars), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((3, block_n, n_vars), lambda i: (0, i, 0), memory_space=mem),
        ),
        interpret=interpret,
    )(cn, cd_in, ref, fb, fb2, scales[None], *wt)
    return primal[:n], tang[:, :n]


def _decode_bwd_kernel_v4(
    pe_ref, dpe_ref, cdpe_ref, go_ref, gto_ref,
    w1_ref, w1c_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
    fw2_ref, w2wo_ref, wdwo_ref,
    gw1_ref, gw1c_ref, gb1_ref, gw2f1_ref, gwdf1_ref, grbias_ref,
    gfw2_ref, gw2wo_ref, gwdwo_ref,
    *, block_n: int, n_vars: int, cdt, t_layout: bool = False,
):
    """Backward of the collapsed v4 decode wrt the fused weights.

    Recomputes the forward chain block-wise in VMEM (cheaper than saving
    [N, hid] residuals to HBM: the whole point of the fused path is avoiding
    that traffic) and accumulates every weight gradient across the grid into
    VMEM-resident output blocks (all grid steps map to output block 0; the
    buffers are initialized at step 0 and written back once at the end).

    ``t_layout=True``: the cotangents arrive var-major ([n_vars, Nb] /
    [3, n_vars, Nb], straight from the packed [6, N] assembly backward with
    no XLA-side relayout of lane-padded minor-dim-6 buffers); the kernel
    transposes the tiny [n_vars, Nb] blocks in VMEM to the column form the
    per-variable math uses.
    """
    f32 = jnp.float32
    i = pl.program_id(0)
    P_in = pe_ref[...]  # [Nb, in_ch] cdt
    T_in = dpe_ref[...]  # [3, Nb, ch] cdt
    CD = cdpe_ref[...]  # [Nb, in_ch] cdt

    @pl.when(i == 0)
    def _init():
        for ref in (gw1_ref, gw1c_ref, gb1_ref, gw2f1_ref, gwdf1_ref,
                    grbias_ref, gfw2_ref, gw2wo_ref, gwdwo_ref):
            ref[...] = jnp.zeros_like(ref)

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    def dot_t(a, b):  # a^T @ b, contracting the row (point) axis
        return jax.lax.dot_general(
            a.astype(cdt), b.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def dot_wt(g, w):  # g @ w^T
        return jax.lax.dot_general(
            g.astype(cdt), w.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    if t_layout:
        # [n_vars, Nb] -> [Nb, n_vars] in VMEM: ~6x256 values, negligible next
        # to the [Nb, hid] matmul operands, and it spares XLA the HBM-side
        # relayout of the 6/128-lane-padded [N, 6] form
        gp_t = go_ref[...].T  # [Nb, n_vars]
        gt_t = [gto_ref[k].T for k in range(3)]  # each [Nb, n_vars]

    for v in range(n_vars):
        # ---- recompute the forward chain ----
        z = dot(P_in, w1_ref[v]) + b1_ref[v][None, :]
        mask = z > 0
        p = jnp.maximum(z, 0.0)
        mask3 = jnp.concatenate([mask, mask, mask], axis=0)
        tz = jnp.concatenate(
            [dot(T_in[k], w1c_ref[v, k]) for k in range(3)], axis=0)
        t = jnp.where(mask3, tz, 0.0)  # [3Nb, hid]
        W = w2f1_ref[v]
        rp = dot(p, W) + dot(CD, wdf1_ref[v]) + rbias_ref[v][None, :]
        maskr = rp > 0
        pr = jnp.maximum(rp, 0.0)
        maskr3 = jnp.concatenate([maskr, maskr, maskr], axis=0)
        tr = jnp.where(maskr3, dot(t, W), 0.0)

        # ---- backward ----
        if t_layout:
            go = gp_t[:, v : v + 1]  # [Nb, 1] f32
            gto = jnp.concatenate(
                [gt_t[k][:, v : v + 1] for k in range(3)], axis=0)  # [3Nb, 1]
        else:
            go = go_ref[:, v : v + 1]  # [Nb, 1] f32
            gto = gto_ref[..., v].reshape(3 * block_n, 1)  # [3Nb, 1]
        a_v = fw2_ref[v][None, :]  # [1, hid]
        b_v = w2wo_ref[v][None, :]

        g_rp = jnp.where(maskr, go * a_v, 0.0)  # [Nb, hid]
        g_rt = jnp.where(maskr3, gto * a_v, 0.0)  # [3Nb, hid]

        gfw2_ref[v] += jnp.sum(pr * go, axis=0) + jnp.sum(tr * gto, axis=0)
        gw2wo_ref[v] += 2.0 * (jnp.sum(p * go, axis=0) + jnp.sum(t * gto, axis=0))
        gwdwo_ref[v] += 2.0 * jnp.sum(CD.astype(f32) * go, axis=0)
        # g_obias = sum(go) is a scalar per variable: Mosaic cannot store
        # scalars to VMEM, and it's free in XLA (g_primal.sum(0)) -- computed
        # by the caller instead
        grbias_ref[v] += jnp.sum(g_rp, axis=0)

        gw2f1_ref[v] += dot_t(p, g_rp) + dot_t(t, g_rt)
        gwdf1_ref[v] += dot_t(CD, g_rp)

        g_p = dot_wt(g_rp, W) + 2.0 * (go * b_v)
        g_t = dot_wt(g_rt, W) + 2.0 * (gto * b_v)
        g_z = jnp.where(mask, g_p, 0.0)
        g_tz = jnp.where(mask3, g_t, 0.0)

        gw1_ref[v] += dot_t(P_in.astype(f32), g_z)
        gb1_ref[v] += jnp.sum(g_z, axis=0)
        for k in range(3):
            gw1c_ref[v, k] += dot_t(
                T_in[k].astype(f32), g_tz[k * block_n : (k + 1) * block_n])


def decode_bwd_kernel_v4(
    fw: FusedDecodeWeights,
    pe: jnp.ndarray,
    dpe: jnp.ndarray,
    cd_pe: jnp.ndarray,
    g_primal: jnp.ndarray,  # [N, 6] f32
    g_tang: jnp.ndarray,  # [3, N, 6] f32
    block_n: int = 256,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    vmem_limit_bytes: int = 100 * 1024 * 1024,
) -> FusedDecodeWeights:
    """Weight cotangents of fused_decode_jvp_v4 (obias slot carries g_obias)."""
    n, in_ch = pe.shape
    ch = dpe.shape[-1]
    n_vars = fw.w1.shape[0]
    hid = fw.w1.shape[-1]
    if n % block_n != 0:
        pad = block_n - n % block_n
        pe = jnp.pad(pe, ((0, pad), (0, 0)))
        dpe = jnp.pad(dpe, ((0, 0), (0, pad), (0, 0)))
        cd_pe = jnp.pad(cd_pe, ((0, pad), (0, 0)))
        # zero cotangents on padded points -> no gradient contribution
        g_primal = jnp.pad(g_primal, ((0, pad), (0, 0)))
        g_tang = jnp.pad(g_tang, ((0, 0), (0, pad), (0, 0)))
    n_pad = pe.shape[0]
    grid = (n_pad // block_n,)

    cd = compute_dtype
    f32 = jnp.float32
    wt = [fw.w1.astype(cd), fw.w1c.astype(cd), fw.b1.astype(f32),
          fw.w2f1.astype(cd), fw.wdf1.astype(cd), fw.rbias.astype(f32),
          fw.fw2.astype(f32), fw.w2wo.astype(f32), fw.wdwo.astype(f32)]

    mem = pltpu.VMEM if _HAS_PLTPU else pl.ANY
    full = lambda: pl.BlockSpec(memory_space=mem)
    acc = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=mem)
    kernel = functools.partial(_decode_bwd_kernel_v4, block_n=block_n,
                               n_vars=n_vars, cdt=cd)
    extra = {}
    if vmem_limit_bytes and _HAS_PLTPU and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((n_vars, in_ch, hid), f32),  # g_w1
            jax.ShapeDtypeStruct((n_vars, 3, ch, hid), f32),  # g_w1c
            jax.ShapeDtypeStruct((n_vars, hid), f32),  # g_b1
            jax.ShapeDtypeStruct((n_vars, hid, hid), f32),  # g_w2f1
            jax.ShapeDtypeStruct((n_vars, in_ch, hid), f32),  # g_wdf1
            jax.ShapeDtypeStruct((n_vars, hid), f32),  # g_rbias
            jax.ShapeDtypeStruct((n_vars, hid), f32),  # g_fw2
            jax.ShapeDtypeStruct((n_vars, hid), f32),  # g_w2wo
            jax.ShapeDtypeStruct((n_vars, in_ch), f32),  # g_wdwo
        ),
        in_specs=[
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((3, block_n, ch), lambda i: (0, i, 0), memory_space=mem),
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((block_n, n_vars), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((3, block_n, n_vars), lambda i: (0, i, 0), memory_space=mem),
        ] + [full() for _ in wt],
        out_specs=(
            acc(n_vars, in_ch, hid), acc(n_vars, 3, ch, hid), acc(n_vars, hid),
            acc(n_vars, hid, hid), acc(n_vars, in_ch, hid), acc(n_vars, hid),
            acc(n_vars, hid), acc(n_vars, hid), acc(n_vars, in_ch),
        ),
        interpret=interpret,
        **extra,
    )(pe.astype(cd), dpe.astype(cd), cd_pe.astype(cd),
      g_primal.astype(f32), g_tang.astype(f32), *wt)
    return FusedDecodeWeights(
        w1=outs[0], w1c=outs[1], b1=outs[2], w2f1=outs[3], wdf1=outs[4],
        rbias=outs[5], fw2=outs[6], w2wo=outs[7], wdwo=outs[8],
        obias=jnp.sum(g_primal[:n], axis=0))


def decode_bwd_kernel_v4t(
    fw: FusedDecodeWeights,
    pe: jnp.ndarray,
    dpe: jnp.ndarray,
    cd_pe: jnp.ndarray,
    g_primal_t: jnp.ndarray,  # [6, N] f32 var-major
    g_tang_t: jnp.ndarray,  # [3, 6, N] f32 var-major
    block_n: int = 256,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    vmem_limit_bytes: int = 100 * 1024 * 1024,
) -> FusedDecodeWeights:
    """Var-major twin of decode_bwd_kernel_v4 (cotangents arrive [6, N])."""
    n, in_ch = pe.shape
    ch = dpe.shape[-1]
    n_vars = fw.w1.shape[0]
    hid = fw.w1.shape[-1]
    if n % block_n != 0:
        pad = block_n - n % block_n
        pe = jnp.pad(pe, ((0, pad), (0, 0)))
        dpe = jnp.pad(dpe, ((0, 0), (0, pad), (0, 0)))
        cd_pe = jnp.pad(cd_pe, ((0, pad), (0, 0)))
        g_primal_t = jnp.pad(g_primal_t, ((0, 0), (0, pad)))
        g_tang_t = jnp.pad(g_tang_t, ((0, 0), (0, 0), (0, pad)))
    n_pad = pe.shape[0]
    grid = (n_pad // block_n,)

    cd = compute_dtype
    f32 = jnp.float32
    wt = [fw.w1.astype(cd), fw.w1c.astype(cd), fw.b1.astype(f32),
          fw.w2f1.astype(cd), fw.wdf1.astype(cd), fw.rbias.astype(f32),
          fw.fw2.astype(f32), fw.w2wo.astype(f32), fw.wdwo.astype(f32)]

    mem = pltpu.VMEM if _HAS_PLTPU else pl.ANY
    full = lambda: pl.BlockSpec(memory_space=mem)
    acc = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=mem)
    kernel = functools.partial(_decode_bwd_kernel_v4, block_n=block_n,
                               n_vars=n_vars, cdt=cd, t_layout=True)
    extra = {}
    if vmem_limit_bytes and _HAS_PLTPU and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((n_vars, in_ch, hid), f32),  # g_w1
            jax.ShapeDtypeStruct((n_vars, 3, ch, hid), f32),  # g_w1c
            jax.ShapeDtypeStruct((n_vars, hid), f32),  # g_b1
            jax.ShapeDtypeStruct((n_vars, hid, hid), f32),  # g_w2f1
            jax.ShapeDtypeStruct((n_vars, in_ch, hid), f32),  # g_wdf1
            jax.ShapeDtypeStruct((n_vars, hid), f32),  # g_rbias
            jax.ShapeDtypeStruct((n_vars, hid), f32),  # g_fw2
            jax.ShapeDtypeStruct((n_vars, hid), f32),  # g_w2wo
            jax.ShapeDtypeStruct((n_vars, in_ch), f32),  # g_wdwo
        ),
        in_specs=[
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((3, block_n, ch), lambda i: (0, i, 0), memory_space=mem),
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((n_vars, block_n), lambda i: (0, i), memory_space=mem),
            pl.BlockSpec((3, n_vars, block_n), lambda i: (0, 0, i), memory_space=mem),
        ] + [full() for _ in wt],
        out_specs=(
            acc(n_vars, in_ch, hid), acc(n_vars, 3, ch, hid), acc(n_vars, hid),
            acc(n_vars, hid, hid), acc(n_vars, in_ch, hid), acc(n_vars, hid),
            acc(n_vars, hid), acc(n_vars, hid), acc(n_vars, in_ch),
        ),
        interpret=interpret,
        **extra,
    )(pe.astype(cd), dpe.astype(cd), cd_pe.astype(cd),
      g_primal_t.astype(f32), g_tang_t.astype(f32), *wt)
    return FusedDecodeWeights(
        w1=outs[0], w1c=outs[1], b1=outs[2], w2f1=outs[3], wdf1=outs[4],
        rbias=outs[5], fw2=outs[6], w2wo=outs[7], wdwo=outs[8],
        obias=jnp.sum(g_primal_t[:, :n], axis=1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_decode_jvp_v4_kbwd(fw, pe, dpe, cd_pe, ref,
                             block_n=256, compute_dtype=jnp.bfloat16,
                             interpret=False):
    """v4 decode with Pallas kernels on BOTH passes (training hot path).

    Gradient contract: exact cotangents for the fused weights and ``ref``
    (d o/d ref = identity); **zeros for pe/dpe/cd_pe** -- in the training
    engine those are data (coordinates / stop-gradient'd conditioning), so
    computing their [N, in_ch] cotangents would be pure waste.  Use
    ``fused_decode_jvp_trainable_v4`` if input gradients are ever needed.

    ``interpret=True`` forces the REAL Pallas fwd+bwd kernels in interpret
    mode on any backend (the multi-chip dryrun / CPU-mesh tests use this to
    exercise the production code path without a TPU); otherwise off-TPU falls
    back to the XLA twin.
    """
    if interpret or (_HAS_PLTPU and jax.default_backend() == "tpu"):
        return fused_decode_jvp_v4(fw, pe, dpe, cd_pe, ref,
                                   block_n=block_n, compute_dtype=compute_dtype,
                                   interpret=interpret)
    return decode_jvp_xla_v4(fw, pe, dpe, cd_pe, ref, compute_dtype)


def _fused_v4_kbwd_fwd(fw, pe, dpe, cd_pe, ref, block_n, compute_dtype, interpret):
    out = fused_decode_jvp_v4_kbwd(fw, pe, dpe, cd_pe, ref, block_n,
                                   compute_dtype, interpret)
    return out, (fw, pe, dpe, cd_pe)


def _fused_v4_kbwd_bwd(block_n, compute_dtype, interpret, res, g):
    fw, pe, dpe, cd_pe = res
    g_primal, g_tang = g
    if interpret or (_HAS_PLTPU and jax.default_backend() == "tpu"):
        gfw = decode_bwd_kernel_v4(fw, pe, dpe, cd_pe, g_primal, g_tang,
                                   block_n=block_n, compute_dtype=compute_dtype,
                                   interpret=interpret)
    else:
        # CPU fallback: the twin's VJP, projected onto the weight cotangents
        zeros_ref = jnp.zeros_like(g_primal)
        _, vjp = jax.vjp(
            lambda w: decode_jvp_xla_v4(w, pe, dpe, cd_pe, zeros_ref,
                                        compute_dtype), fw)
        (gfw,) = vjp((g_primal, g_tang))
    g_ref = g_primal  # o = ... + ref (identity head)
    return (gfw, jnp.zeros_like(pe), jnp.zeros_like(dpe),
            jnp.zeros_like(cd_pe), g_ref)


fused_decode_jvp_v4_kbwd.defvjp(_fused_v4_kbwd_fwd, _fused_v4_kbwd_bwd)


def decode_jvp_xla_v4t(fw, pe, dpe, cd_pe, ref_t, compute_dtype=jnp.bfloat16):
    """Var-major XLA twin: transposed wrapper of decode_jvp_xla_v4."""
    primal, tang = decode_jvp_xla_v4(fw, pe, dpe, cd_pe, ref_t.T, compute_dtype)
    return primal.T, tang.transpose(0, 2, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_decode_jvp_v4t_kbwd(fw, pe, dpe, cd_pe, ref_t,
                              block_n=256, compute_dtype=jnp.bfloat16,
                              interpret=False):
    """Var-major v4 decode with Pallas kernels on BOTH passes.

    Training hot path when the packed [6, N] residual assembly is active:
    ``(primal_t [6, N], tang_t [3, 6, N])`` flow between the kernels and the
    assembly with NO lane-padded [N, 6] buffer ever crossing the custom-vjp
    boundary (the measured ~0.84 ms/step seam, docs/PERF.md round 4 (e)).
    Same gradient contract as fused_decode_jvp_v4_kbwd: exact cotangents for
    the fused weights and ``ref_t``, zeros for pe/dpe/cd_pe.
    """
    if interpret or (_HAS_PLTPU and jax.default_backend() == "tpu"):
        return fused_decode_jvp_v4t(fw, pe, dpe, cd_pe, ref_t,
                                    block_n=block_n, compute_dtype=compute_dtype,
                                    interpret=interpret)
    return decode_jvp_xla_v4t(fw, pe, dpe, cd_pe, ref_t, compute_dtype)


def _fused_v4t_kbwd_fwd(fw, pe, dpe, cd_pe, ref_t, block_n, compute_dtype,
                        interpret):
    out = fused_decode_jvp_v4t_kbwd(fw, pe, dpe, cd_pe, ref_t, block_n,
                                    compute_dtype, interpret)
    return out, (fw, pe, dpe, cd_pe)


def _fused_v4t_kbwd_bwd(block_n, compute_dtype, interpret, res, g):
    fw, pe, dpe, cd_pe = res
    g_primal_t, g_tang_t = g
    if interpret or (_HAS_PLTPU and jax.default_backend() == "tpu"):
        gfw = decode_bwd_kernel_v4t(fw, pe, dpe, cd_pe, g_primal_t, g_tang_t,
                                    block_n=block_n, compute_dtype=compute_dtype,
                                    interpret=interpret)
    else:
        # CPU fallback: the twin's VJP, projected onto the weight cotangents
        zeros_ref = jnp.zeros((g_primal_t.shape[1], g_primal_t.shape[0]),
                              g_primal_t.dtype)
        _, vjp = jax.vjp(
            lambda w: decode_jvp_xla_v4(w, pe, dpe, cd_pe, zeros_ref,
                                        compute_dtype), fw)
        (gfw,) = vjp((g_primal_t.T, g_tang_t.transpose(0, 2, 1)))
    g_ref_t = g_primal_t  # o = ... + ref (identity head)
    return (gfw, jnp.zeros_like(pe), jnp.zeros_like(dpe),
            jnp.zeros_like(cd_pe), g_ref_t)


fused_decode_jvp_v4t_kbwd.defvjp(_fused_v4t_kbwd_fwd, _fused_v4t_kbwd_bwd)


def decode_jvp_xla(
    weights: DecodeWeights,
    pe: jnp.ndarray,
    dpe: jnp.ndarray,  # [3, N, in_ch//3] compact
    cd_pe: jnp.ndarray,
    ref: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA twin of the fused kernel: identical math in plain jnp ops.

    Serves as (a) the CPU fallback, (b) the function whose VJP backs the
    kernel's custom gradient (fused_decode_jvp_trainable).
    """
    cdt = compute_dtype
    f32 = jnp.float32

    def dot(a, w):
        return jnp.einsum("...i,io->...o", a.astype(cdt), w.astype(cdt),
                          preferred_element_type=f32)

    w1c = slice_tangent_weights(weights.w1)  # [6, 3, ch, hid]
    primal_cols, tang_cols = [], []
    n = pe.shape[0]
    for v in range(weights.w1.shape[0]):
        z = dot(pe, weights.w1[v]) + weights.b1[v]
        tz = jnp.stack([dot(dpe[k], w1c[v, k]) for k in range(3)], 0)  # [3, N, hid]
        mask = (z > 0).astype(f32)
        p = jnp.maximum(z, 0.0)
        t = tz * mask[None]
        p2 = dot(p, weights.w2[v]) + weights.b2[v]
        t2 = dot(t, weights.w2[v])
        cdv = dot(cd_pe, weights.wd[v]) + weights.bd[v]
        c = p2 + cdv + weights.fh_add[v]
        tc = t2
        r = dot(c, weights.f1[v]) + weights.g1[v]
        tr = dot(tc, weights.f1[v]) * (r > 0).astype(f32)[None]
        y = dot(jnp.maximum(r, 0.0), weights.f2[v]) + weights.g2[v] + 2.0 * c
        ty = dot(tr, weights.f2[v]) + 2.0 * tc
        wo = weights.wo[v].astype(f32)
        primal_cols.append(jnp.sum(y * wo, -1) + weights.bo[v] + ref[:, v])
        tang_cols.append(jnp.sum(ty * wo, -1))
    primal = jnp.stack(primal_cols, -1)  # [N, 6]
    tang = jnp.stack(tang_cols, -1)  # [3, N, 6]
    return primal, tang


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_decode_jvp_trainable(weights, pe, dpe, cd_pe, ref,
                               block_n=512, compute_dtype=jnp.bfloat16):
    """Differentiable fused decode: Pallas kernel forward, XLA-twin backward.

    Lets the *training* step use the kernel for its forward residual
    evaluation; the parameter gradient recomputes through the XLA twin
    (standard recompute-in-backward trade: no extra residual memory).
    Falls back to the twin entirely off-TPU.
    """
    if _HAS_PLTPU and jax.default_backend() == "tpu":
        return fused_decode_jvp(weights, pe, dpe, cd_pe, ref,
                                block_n=block_n, compute_dtype=compute_dtype)
    return decode_jvp_xla(weights, pe, dpe, cd_pe, ref, compute_dtype)


def _fused_trainable_fwd(weights, pe, dpe, cd_pe, ref, block_n, compute_dtype):
    out = fused_decode_jvp_trainable(weights, pe, dpe, cd_pe, ref, block_n, compute_dtype)
    return out, (weights, pe, dpe, cd_pe, ref)


def _fused_trainable_bwd(block_n, compute_dtype, res, g):
    weights, pe, dpe, cd_pe, ref = res
    _, vjp = jax.vjp(
        lambda w, a, b, c, r: decode_jvp_xla(w, a, b, c, r, compute_dtype),
        weights, pe, dpe, cd_pe, ref,
    )
    return vjp(g)


fused_decode_jvp_trainable.defvjp(_fused_trainable_fwd, _fused_trainable_bwd)


# ---------------------------------------------------------------------------
# v6 -- trig-only inputs: the PE derivative folded into the weight prep
# ---------------------------------------------------------------------------
#
# The SineCos PE derivative is a signed, scaled permutation of the PE itself:
# d/dc [sin(f c), cos(f c)] = f * [cos(f c), -sin(f c)].  v4 materializes that
# permutation as a separate dpe array in XLA (stack + moveaxis + scale over
# [3, N, 2F] -- several full HBM passes on the eval critical path, overlapped
# only by the 0.37 ms encode).  v6 folds the swap/sign/frequency/scale into
# the per-window WEIGHT prep instead (amortized over every point):
#
#   z_v      = sum_k trig_k @ w1g[v, k] + b1          (primal layer 1)
#   dz_v/dc_k =        trig_k @ w1t[v, k]             (tangent layer 1)
#
# where trig_k = [sin(fb c_k) | cos(fb c_k)] ([N, 2F], fn-grouped, the
# channel_major_perm row order) serves BOTH matmuls, and
#
#   w1t[v, k, f]     = -fb[f] * scale_k * w1g[v, k, F+f]   (sin rows)
#   w1t[v, k, F+f]   =  fb[f] * scale_k * w1g[v, k, f]     (cos rows)
#
# is a roll+scale of the channel-major primal weights, built once per window.
# The XLA point prep shrinks to sin/cos on [3, N, F] plus one concat (no
# interleave, no transpose, no derivative arrays), and the kernel's
# point-stream input traffic halves (trig replaces pe AND dpe).  Identical
# math to v4; bf16 rounding differs only by where the fb*scale product is
# applied.  Reference semantics unchanged (interface_physics.py:285-299).


def coord_scales(coord_spec) -> jnp.ndarray:
    """d(normalized coord)/d(physical coord) for (x, y, t) -- [3] f32."""
    return jnp.array(
        [1.0 / (coord_spec.dx * (coord_spec.lon_size - 1)),
         1.0 / (coord_spec.dy * (coord_spec.lat_size - 1)),
         1.0 / coord_spec.pred_t_span], jnp.float32)


def trig3_inputs(coords: jnp.ndarray, coord_spec) -> jnp.ndarray:
    """SineCos trig blocks per coordinate: [3, N, 2F], fn-grouped.

    trig[k] = [sin(fb * cn_k) | cos(fb * cn_k)] where cn is the normalized
    coordinate.  This is the ONLY per-point prep the v6 kernel needs.
    """
    scales = coord_scales(coord_spec)
    fb = jnp.asarray(coord_spec.freq_bands(), jnp.float32)  # [F]
    cn = coords.astype(jnp.float32) * scales  # [N, 3]
    xf = cn.T[:, :, None] * fb  # [3, N, F]
    return jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1)  # [3, N, 2F]


class FusedDecodeWeightsV6(NamedTuple):
    """v4's collapsed weights with layer 1 re-expressed over trig inputs."""

    w1g: jnp.ndarray  # [6, 3, 2F, hid] channel-major primal layer-1 rows
    w1t: jnp.ndarray  # [6, 3, 2F, hid] tangent rows (swap/sign/fb/scale folded)
    b1: jnp.ndarray  # [6, hid]
    w2f1: jnp.ndarray  # [6, hid, hid]
    wdf1: jnp.ndarray  # [6, in_ch, hid]
    rbias: jnp.ndarray  # [6, hid]
    fw2: jnp.ndarray  # [6, hid]
    w2wo: jnp.ndarray  # [6, hid]
    wdwo: jnp.ndarray  # [6, in_ch]
    obias: jnp.ndarray  # [6]


def fuse_v6_from_v4(fw: FusedDecodeWeights, coord_spec) -> FusedDecodeWeightsV6:
    """Per-window re-expression of the v4 fused weights over trig inputs."""
    n_vars, in_ch, hid = fw.w1.shape
    nf = in_ch // 6
    perm = channel_major_perm(in_ch, 3)
    w1g = fw.w1[:, perm, :].reshape(n_vars, 3, 2 * nf, hid)
    fb = jnp.asarray(coord_spec.freq_bands(), jnp.float32)  # [F]
    coef = (coord_scales(coord_spec)[:, None] * fb)[None, :, :, None]  # [1,3,F,1]
    w1t = jnp.concatenate(
        [-coef * w1g[:, :, nf:], coef * w1g[:, :, :nf]], axis=2)
    return FusedDecodeWeightsV6(
        w1g=w1g, w1t=w1t, b1=fw.b1, w2f1=fw.w2f1, wdf1=fw.wdf1,
        rbias=fw.rbias, fw2=fw.fw2, w2wo=fw.w2wo, wdwo=fw.wdwo, obias=fw.obias)


def fuse_decode_weights_v6(w: DecodeWeights, coord_spec) -> FusedDecodeWeightsV6:
    """Per-window f32 weight fusion for the trig-input collapsed decode."""
    return fuse_v6_from_v4(fuse_decode_weights(w), coord_spec)


def _v6_var_column(
    T, CD, ref_col,
    w1g_ref, w1t_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
    fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
    *, v: int, block_n: int, cdt,
):
    """One variable's primal + 3 tangents from trig blocks (v6 layer 1)."""
    f32 = jnp.float32

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    z = (dot(T[0], w1g_ref[v, 0]) + dot(T[1], w1g_ref[v, 1])
         + dot(T[2], w1g_ref[v, 2]) + b1_ref[v][None, :])
    mask = z > 0
    p = jnp.maximum(z, 0.0)
    t16 = jnp.concatenate(
        [jnp.where(mask, dot(T[k], w1t_ref[v, k]), 0.0).astype(cdt)
         for k in range(3)], axis=0)  # [3Nb, hid]

    return _v4_epilogue(
        p, t16, CD, ref_col,
        w2f1_ref[v], wdf1_ref[v], rbias_ref[v], fw2_ref[v], w2wo_ref[v],
        wdwo_ref[v], obias_ref[v], block_n=block_n, cdt=cdt,
    )


def _decode_kernel_v6(
    trig_ref, cdpe_ref, ref_ref,
    w1g_ref, w1t_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
    fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
    primal_ref, tang_ref,
    *, block_n: int, n_vars: int, cdt,
):
    """v6: collapsed algebra, primal AND tangents fed by the trig blocks."""
    T = trig_ref[...]  # [3, Nb, 2F] cdt
    CD = cdpe_ref[...]  # [Nb, in_ch] cdt

    primal_cols, tang_cols = [], []
    for v in range(n_vars):
        o, to3 = _v6_var_column(
            T, CD, ref_ref[:, v],
            w1g_ref, w1t_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
            fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
            v=v, block_n=block_n, cdt=cdt,
        )
        primal_cols.append(o[:, None])
        tang_cols.append(to3[:, :, None])

    primal_ref[...] = jnp.concatenate(primal_cols, axis=-1).astype(primal_ref.dtype)
    tang_ref[...] = jnp.concatenate(tang_cols, axis=-1).astype(tang_ref.dtype)


def fused_decode_jvp_v6(
    fw: FusedDecodeWeightsV6,
    trig: jnp.ndarray,  # [3, N, 2F] f32
    cd_pe: jnp.ndarray,  # [N, in_ch] f32
    ref: jnp.ndarray,  # [N, 6] normalized conditioning values (residual head)
    block_n: int = 256,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    vmem_limit_bytes: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Primal [N, 6] + tangents [3, N, 6] via the trig-input v6 kernel."""
    _, n, two_f = trig.shape
    in_ch = cd_pe.shape[-1]
    n_vars = fw.w1g.shape[0]
    if n % block_n != 0:
        pad = block_n - n % block_n
        trig = jnp.pad(trig, ((0, 0), (0, pad), (0, 0)))
        cd_pe = jnp.pad(cd_pe, ((0, pad), (0, 0)))
        ref = jnp.pad(ref, ((0, pad), (0, 0)))
    n_pad = trig.shape[1]
    grid = (n_pad // block_n,)

    cd = compute_dtype
    f32 = jnp.float32
    wt = [fw.w1g.astype(cd), fw.w1t.astype(cd), fw.b1.astype(f32),
          fw.w2f1.astype(cd), fw.wdf1.astype(cd), fw.rbias.astype(f32),
          fw.fw2.astype(f32), fw.w2wo.astype(f32), fw.wdwo.astype(f32),
          fw.obias.astype(f32)]

    mem = pltpu.VMEM if _HAS_PLTPU else pl.ANY
    full = lambda: pl.BlockSpec(memory_space=mem)
    kernel = functools.partial(_decode_kernel_v6, block_n=block_n,
                               n_vars=n_vars, cdt=cd)
    extra = {}
    if vmem_limit_bytes and _HAS_PLTPU and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))

    primal, tang = pl.pallas_call(
        kernel,
        grid=grid,
        **extra,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, n_vars), jnp.float32),
            jax.ShapeDtypeStruct((3, n_pad, n_vars), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((3, block_n, two_f), lambda i: (0, i, 0), memory_space=mem),
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((block_n, n_vars), lambda i: (i, 0), memory_space=mem),
        ] + [full() for _ in wt],
        out_specs=(
            pl.BlockSpec((block_n, n_vars), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((3, block_n, n_vars), lambda i: (0, i, 0), memory_space=mem),
        ),
        interpret=interpret,
    )(trig.astype(cd), cd_pe.astype(cd), ref.astype(jnp.float32), *wt)
    return primal[:n], tang[:, :n]


def decode_jvp_xla_v6(
    fw: FusedDecodeWeightsV6,
    trig: jnp.ndarray,  # [3, N, 2F]
    cd_pe: jnp.ndarray,
    ref: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA twin of the v6 kernel: identical collapsed math, plain jnp.

    Fully differentiable -- the CPU fallback and the gradient-reference for
    the fused backward kernel's tests.
    """
    cdt = compute_dtype
    f32 = jnp.float32
    n_vars = fw.w1g.shape[0]

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    T = trig
    primal_cols, tang_cols = [], []
    for v in range(n_vars):
        z = (dot(T[0], fw.w1g[v, 0]) + dot(T[1], fw.w1g[v, 1])
             + dot(T[2], fw.w1g[v, 2]) + fw.b1[v][None, :])
        mask = z > 0
        p = jnp.maximum(z, 0.0)
        tz = jnp.stack([dot(T[k], fw.w1t[v, k]) for k in range(3)], 0)  # [3,N,hid]
        t = jnp.where(mask[None], tz, 0.0)

        rp = dot(p, fw.w2f1[v]) + dot(cd_pe, fw.wdf1[v]) + fw.rbias[v][None, :]
        maskr = rp > 0
        pr = jnp.maximum(rp, 0.0)
        rt = jnp.where(maskr[None], jnp.stack(
            [dot(t[k], fw.w2f1[v]) for k in range(3)], 0), 0.0)

        fw2 = fw.fw2[v][None, :].astype(f32)
        w2wo = fw.w2wo[v][None, :].astype(f32)
        o = (jnp.sum(pr * fw2, axis=-1)
             + 2.0 * (jnp.sum(p * w2wo, axis=-1)
                      + jnp.sum(cd_pe.astype(f32) * fw.wdwo[v][None, :].astype(f32),
                                axis=-1))
             + fw.obias[v] + ref[:, v])
        to = (jnp.sum(rt * fw2[None], axis=-1)
              + 2.0 * jnp.sum(t * w2wo[None], axis=-1))  # [3, N]
        primal_cols.append(o[:, None])
        tang_cols.append(to[:, :, None])
    return jnp.concatenate(primal_cols, -1), jnp.concatenate(tang_cols, -1)


def _decode_bwd_kernel_v6(
    trig_ref, cdpe_ref, go_ref, gto_ref,
    w1g_ref, w1t_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
    fw2_ref, w2wo_ref, wdwo_ref,
    gw1g_ref, gw1t_ref, gb1_ref, gw2f1_ref, gwdf1_ref, grbias_ref,
    gfw2_ref, gw2wo_ref, gwdwo_ref,
    *, block_n: int, n_vars: int, cdt,
):
    """Backward of the v6 decode wrt the fused weights (recompute-in-VMEM).

    Mirror of _decode_bwd_kernel_v4 with the trig blocks feeding both the
    primal (w1g) and tangent (w1t) layer-1 cotangents:
    g_w1g[v, k] = trig_k^T g_z, g_w1t[v, k] = trig_k^T g_tz_k.
    """
    f32 = jnp.float32
    i = pl.program_id(0)
    T = trig_ref[...]  # [3, Nb, 2F] cdt
    CD = cdpe_ref[...]  # [Nb, in_ch] cdt

    @pl.when(i == 0)
    def _init():
        for ref in (gw1g_ref, gw1t_ref, gb1_ref, gw2f1_ref, gwdf1_ref,
                    grbias_ref, gfw2_ref, gw2wo_ref, gwdwo_ref):
            ref[...] = jnp.zeros_like(ref)

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    def dot_t(a, b):  # a^T @ b, contracting the row (point) axis
        return jax.lax.dot_general(
            a.astype(cdt), b.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def dot_wt(g, w):  # g @ w^T
        return jax.lax.dot_general(
            g.astype(cdt), w.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    for v in range(n_vars):
        # ---- recompute the forward chain ----
        z = (dot(T[0], w1g_ref[v, 0]) + dot(T[1], w1g_ref[v, 1])
             + dot(T[2], w1g_ref[v, 2]) + b1_ref[v][None, :])
        mask = z > 0
        p = jnp.maximum(z, 0.0)
        mask3 = jnp.concatenate([mask, mask, mask], axis=0)
        tz = jnp.concatenate(
            [dot(T[k], w1t_ref[v, k]) for k in range(3)], axis=0)
        t = jnp.where(mask3, tz, 0.0)  # [3Nb, hid]
        W = w2f1_ref[v]
        rp = dot(p, W) + dot(CD, wdf1_ref[v]) + rbias_ref[v][None, :]
        maskr = rp > 0
        pr = jnp.maximum(rp, 0.0)
        maskr3 = jnp.concatenate([maskr, maskr, maskr], axis=0)
        tr = jnp.where(maskr3, dot(t, W), 0.0)

        # ---- backward ----
        go = go_ref[:, v : v + 1]  # [Nb, 1] f32
        gto = gto_ref[..., v].reshape(3 * block_n, 1)  # [3Nb, 1]
        a_v = fw2_ref[v][None, :]  # [1, hid]
        b_v = w2wo_ref[v][None, :]

        g_rp = jnp.where(maskr, go * a_v, 0.0)  # [Nb, hid]
        g_rt = jnp.where(maskr3, gto * a_v, 0.0)  # [3Nb, hid]

        gfw2_ref[v] += jnp.sum(pr * go, axis=0) + jnp.sum(tr * gto, axis=0)
        gw2wo_ref[v] += 2.0 * (jnp.sum(p * go, axis=0) + jnp.sum(t * gto, axis=0))
        gwdwo_ref[v] += 2.0 * jnp.sum(CD.astype(f32) * go, axis=0)
        # g_obias = sum(go): scalar per variable, computed by the caller
        grbias_ref[v] += jnp.sum(g_rp, axis=0)

        gw2f1_ref[v] += dot_t(p, g_rp) + dot_t(t, g_rt)
        gwdf1_ref[v] += dot_t(CD, g_rp)

        g_p = dot_wt(g_rp, W) + 2.0 * (go * b_v)
        g_t = dot_wt(g_rt, W) + 2.0 * (gto * b_v)
        g_z = jnp.where(mask, g_p, 0.0)
        g_tz = jnp.where(mask3, g_t, 0.0)

        for k in range(3):
            gw1g_ref[v, k] += dot_t(T[k].astype(f32), g_z)
            gw1t_ref[v, k] += dot_t(
                T[k].astype(f32), g_tz[k * block_n : (k + 1) * block_n])
        gb1_ref[v] += jnp.sum(g_z, axis=0)


def decode_bwd_kernel_v6(
    fw: FusedDecodeWeightsV6,
    trig: jnp.ndarray,  # [3, N, 2F]
    cd_pe: jnp.ndarray,
    g_primal: jnp.ndarray,  # [N, 6] f32
    g_tang: jnp.ndarray,  # [3, N, 6] f32
    block_n: int = 256,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    vmem_limit_bytes: int = 100 * 1024 * 1024,
) -> FusedDecodeWeightsV6:
    """Weight cotangents of fused_decode_jvp_v6 (obias slot carries g_obias)."""
    _, n, two_f = trig.shape
    in_ch = cd_pe.shape[-1]
    n_vars, _, _, hid = fw.w1g.shape
    if n % block_n != 0:
        pad = block_n - n % block_n
        trig = jnp.pad(trig, ((0, 0), (0, pad), (0, 0)))
        cd_pe = jnp.pad(cd_pe, ((0, pad), (0, 0)))
        # zero cotangents on padded points -> no gradient contribution
        g_primal = jnp.pad(g_primal, ((0, pad), (0, 0)))
        g_tang = jnp.pad(g_tang, ((0, 0), (0, pad), (0, 0)))
    n_pad = trig.shape[1]
    grid = (n_pad // block_n,)

    cd = compute_dtype
    f32 = jnp.float32
    wt = [fw.w1g.astype(cd), fw.w1t.astype(cd), fw.b1.astype(f32),
          fw.w2f1.astype(cd), fw.wdf1.astype(cd), fw.rbias.astype(f32),
          fw.fw2.astype(f32), fw.w2wo.astype(f32), fw.wdwo.astype(f32)]

    mem = pltpu.VMEM if _HAS_PLTPU else pl.ANY
    full = lambda: pl.BlockSpec(memory_space=mem)
    acc = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=mem)
    kernel = functools.partial(_decode_bwd_kernel_v6, block_n=block_n,
                               n_vars=n_vars, cdt=cd)
    extra = {}
    if vmem_limit_bytes and _HAS_PLTPU and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((n_vars, 3, two_f, hid), f32),  # g_w1g
            jax.ShapeDtypeStruct((n_vars, 3, two_f, hid), f32),  # g_w1t
            jax.ShapeDtypeStruct((n_vars, hid), f32),  # g_b1
            jax.ShapeDtypeStruct((n_vars, hid, hid), f32),  # g_w2f1
            jax.ShapeDtypeStruct((n_vars, in_ch, hid), f32),  # g_wdf1
            jax.ShapeDtypeStruct((n_vars, hid), f32),  # g_rbias
            jax.ShapeDtypeStruct((n_vars, hid), f32),  # g_fw2
            jax.ShapeDtypeStruct((n_vars, hid), f32),  # g_w2wo
            jax.ShapeDtypeStruct((n_vars, in_ch), f32),  # g_wdwo
        ),
        in_specs=[
            pl.BlockSpec((3, block_n, two_f), lambda i: (0, i, 0), memory_space=mem),
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((block_n, n_vars), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((3, block_n, n_vars), lambda i: (0, i, 0), memory_space=mem),
        ] + [full() for _ in wt],
        out_specs=(
            acc(n_vars, 3, two_f, hid), acc(n_vars, 3, two_f, hid),
            acc(n_vars, hid), acc(n_vars, hid, hid), acc(n_vars, in_ch, hid),
            acc(n_vars, hid), acc(n_vars, hid), acc(n_vars, hid),
            acc(n_vars, in_ch),
        ),
        interpret=interpret,
        **extra,
    )(trig.astype(cd), cd_pe.astype(cd),
      g_primal.astype(f32), g_tang.astype(f32), *wt)
    return FusedDecodeWeightsV6(
        w1g=outs[0], w1t=outs[1], b1=outs[2], w2f1=outs[3], wdf1=outs[4],
        rbias=outs[5], fw2=outs[6], w2wo=outs[7], wdwo=outs[8],
        obias=jnp.sum(g_primal[:n], axis=0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_decode_jvp_v6_kbwd(fw, trig, cd_pe, ref,
                             block_n=256, compute_dtype=jnp.bfloat16,
                             interpret=False):
    """v6 decode with Pallas kernels on BOTH passes (training hot path).

    Same gradient contract as fused_decode_jvp_v4_kbwd: exact cotangents for
    the fused weights and ``ref`` (identity head), **zeros for trig/cd_pe**
    (data inputs in the training engine).
    """
    if interpret or (_HAS_PLTPU and jax.default_backend() == "tpu"):
        return fused_decode_jvp_v6(fw, trig, cd_pe, ref,
                                   block_n=block_n, compute_dtype=compute_dtype,
                                   interpret=interpret)
    return decode_jvp_xla_v6(fw, trig, cd_pe, ref, compute_dtype)


def _fused_v6_kbwd_fwd(fw, trig, cd_pe, ref, block_n, compute_dtype, interpret):
    out = fused_decode_jvp_v6_kbwd(fw, trig, cd_pe, ref, block_n,
                                   compute_dtype, interpret)
    return out, (fw, trig, cd_pe)


def _fused_v6_kbwd_bwd(block_n, compute_dtype, interpret, res, g):
    fw, trig, cd_pe = res
    g_primal, g_tang = g
    if interpret or (_HAS_PLTPU and jax.default_backend() == "tpu"):
        gfw = decode_bwd_kernel_v6(fw, trig, cd_pe, g_primal, g_tang,
                                   block_n=block_n, compute_dtype=compute_dtype,
                                   interpret=interpret)
    else:
        # CPU fallback: the twin's VJP, projected onto the weight cotangents
        zeros_ref = jnp.zeros_like(g_primal)
        _, vjp = jax.vjp(
            lambda w: decode_jvp_xla_v6(w, trig, cd_pe, zeros_ref,
                                        compute_dtype), fw)
        (gfw,) = vjp((g_primal, g_tang))
    g_ref = g_primal  # o = ... + ref (identity head)
    return (gfw, jnp.zeros_like(trig), jnp.zeros_like(cd_pe), g_ref)


fused_decode_jvp_v6_kbwd.defvjp(_fused_v6_kbwd_fwd, _fused_v6_kbwd_bwd)


# ---------------------------------------------------------------------------
# v4s (kernel_version=7): dpe-free var-major decode.
#
# The v6 experiment (round 4 (a)) showed the FOLD is sound (PE derivative
# absorbed into per-window weights, no dpe array) but its kernel regressed
# because it split the primal into three K=2F matmuls (padded 3x128 K-tiles
# vs v4's 2).  v4s keeps v6's folded weights (fuse_v6_from_v4) and restores
# v4's single wide-K primal pass: the per-point operand is the CHANNEL-MAJOR
# trig row [N, 3*2F] (trig_cm_inputs), the primal consumes the whole row
# through the permuted layer-1 weights (one K=192 matmul), and direction-k's
# tangent matmul consumes the contiguous 2F-lane block k of the SAME operand
# through the swap/sign/fb/scale-folded tangent weights.  MXU slot count is
# identical to v4/v4t; the dpe input stream ([3, N, 2F]) and its prep
# (dsin/dcos multiplies + stack + moveaxis) disappear entirely.
# ---------------------------------------------------------------------------


def trig_cm_inputs(coords: jnp.ndarray, coord_spec, dtype=jnp.float32) -> jnp.ndarray:
    """Channel-major trig operand [N, 3*2F] for the v4s kernels.

    Block c (lanes ``c*2F : (c+1)*2F``) holds ``[sin(fb * cn_c) | cos(fb *
    cn_c)]`` (fn-grouped, matching ``channel_major_perm``'s row order).  This
    is the ONLY per-point prep v4s needs: compare ``pe_and_tangents``, whose
    dpe branch costs two extra [N, F, 3] multiplies plus a stack + moveaxis
    + reshape and a second [3, N, 2F] HBM stream into the kernel.
    """
    scales = coord_scales(coord_spec)
    fb = jnp.asarray(coord_spec.freq_bands(), jnp.float32)  # [F]
    cn = coords.astype(jnp.float32) * scales  # [N, 3]
    xf = cn[:, :, None] * fb  # [N, 3, F]
    out = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1)  # [N, 3, 2F]
    return out.reshape(cn.shape[0], -1).astype(dtype)


def _decode_kernel_v4s(
    pe_ref, cdpe_ref, ref_ref,
    w1g_ref, w1t_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
    fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
    primal_ref, tang_ref,
    *, block_n: int, n_vars: int, cdt, two_f: int,
):
    """v4s: var-major collapsed decode from the channel-major trig operand.

    Identical MXU slot count to ``_decode_kernel_v4(t_layout=True)``: one
    K=3*2F primal matmul (``w1g`` flattened to [in_ch, hid] rows by the
    wrapper) plus three K=2F tangent matmuls whose inputs are contiguous
    lane slices of the ALREADY-LOADED primal operand -- the fold
    d/dcn sin(f cn) = f cos(f cn) turns the dpe operand into a swap/scale
    of pe, absorbed into ``w1t`` at fuse time (fuse_v6_from_v4).
    """
    P_in = pe_ref[...]  # [Nb, 3*2F] cdt, channel-major
    CD = cdpe_ref[...]  # [Nb, in_ch] cdt
    f32 = jnp.float32

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    primal_rows, tang_rows = [], []
    for v in range(n_vars):
        z = dot(P_in, w1g_ref[v]) + b1_ref[v][None, :]
        mask = z > 0
        p = jnp.maximum(z, 0.0)
        t16 = jnp.concatenate(
            [jnp.where(mask,
                       dot(P_in[:, k * two_f:(k + 1) * two_f], w1t_ref[v, k]),
                       0.0).astype(cdt)
             for k in range(3)], axis=0)  # [3Nb, hid]
        o, to3 = _v4_epilogue(
            p, t16, CD, ref_ref[v],
            w2f1_ref[v], wdf1_ref[v], rbias_ref[v], fw2_ref[v], w2wo_ref[v],
            wdwo_ref[v], obias_ref[v], block_n=block_n, cdt=cdt,
        )
        primal_rows.append(o[None, :])  # [1, Nb] lane-major row
        tang_rows.append(to3[:, None, :])  # [3, 1, Nb]

    primal_ref[...] = jnp.concatenate(primal_rows, axis=0).astype(primal_ref.dtype)
    tang_ref[...] = jnp.concatenate(tang_rows, axis=1).astype(tang_ref.dtype)


def fused_decode_jvp_v4s(
    fw: FusedDecodeWeightsV6,
    pe_cm: jnp.ndarray,  # [N, 3*2F] channel-major trig (trig_cm_inputs)
    cd_pe: jnp.ndarray,  # [N, in_ch]
    ref_t: jnp.ndarray,  # [6, N] TRANSPOSED conditioning values
    block_n: int = 256,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Primal [6, N] + tangents [3, 6, N] via the dpe-free v4s kernel."""
    n, in_ch = pe_cm.shape
    n_vars, _, two_f, hid = fw.w1t.shape
    if n % block_n != 0:
        pad = block_n - n % block_n
        pe_cm = jnp.pad(pe_cm, ((0, pad), (0, 0)))
        cd_pe = jnp.pad(cd_pe, ((0, pad), (0, 0)))
        ref_t = jnp.pad(ref_t, ((0, 0), (0, pad)))
    n_pad = pe_cm.shape[0]
    grid = (n_pad // block_n,)

    cd = compute_dtype
    f32 = jnp.float32
    wt = [fw.w1g.reshape(n_vars, in_ch, hid).astype(cd), fw.w1t.astype(cd),
          fw.b1.astype(f32), fw.w2f1.astype(cd), fw.wdf1.astype(cd),
          fw.rbias.astype(f32), fw.fw2.astype(f32), fw.w2wo.astype(f32),
          fw.wdwo.astype(f32), fw.obias.astype(f32)]

    mem = pltpu.VMEM if _HAS_PLTPU else pl.ANY
    full = lambda: pl.BlockSpec(memory_space=mem)
    kernel = functools.partial(_decode_kernel_v4s, block_n=block_n,
                               n_vars=n_vars, cdt=cd, two_f=two_f)

    primal, tang = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((n_vars, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((3, n_vars, n_pad), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((n_vars, block_n), lambda i: (0, i), memory_space=mem),
        ] + [full() for _ in wt],
        out_specs=(
            pl.BlockSpec((n_vars, block_n), lambda i: (0, i), memory_space=mem),
            pl.BlockSpec((3, n_vars, block_n), lambda i: (0, 0, i), memory_space=mem),
        ),
        interpret=interpret,
    )(pe_cm.astype(cd), cd_pe.astype(cd), ref_t.astype(jnp.float32), *wt)
    return primal[:, :n], tang[:, :, :n]


def decode_jvp_xla_v4s(
    fw: FusedDecodeWeightsV6,
    pe_cm: jnp.ndarray,  # [N, 3*2F] channel-major trig
    cd_pe: jnp.ndarray,
    ref_t: jnp.ndarray,  # [6, N]
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA twin of the v4s kernel: identical collapsed math, plain jnp.

    Fully differentiable -- the CPU fallback and the gradient reference for
    the fused backward kernel's tests.  Returns var-major ([6, N], [3, 6, N]).
    """
    cdt = compute_dtype
    f32 = jnp.float32
    n, in_ch = pe_cm.shape
    n_vars, _, two_f, hid = fw.w1t.shape

    def dots(a, w):  # [N, K] x [V, K, H] -> [V, N, H], f32 accumulation
        return jnp.einsum("nk,vkh->vnh", a.astype(cdt), w.astype(cdt),
                          preferred_element_type=f32)

    def bdots(a, w):  # [V, N, K] x [V, K, H] -> [V, N, H]
        return jnp.einsum("vnk,vkh->vnh", a.astype(cdt), w.astype(cdt),
                          preferred_element_type=f32)

    z = dots(pe_cm, fw.w1g.reshape(n_vars, in_ch, hid)) + fw.b1[:, None, :]
    mask = z > 0
    p = jnp.maximum(z, 0.0)  # [V, N, hid]
    t = jnp.stack(
        [jnp.where(mask, dots(pe_cm[:, k * two_f:(k + 1) * two_f], fw.w1t[:, k]),
                   0.0)
         for k in range(3)], axis=0)  # [3, V, N, hid]

    rp = bdots(p, fw.w2f1) + dots(cd_pe, fw.wdf1) + fw.rbias[:, None, :]
    maskr = rp > 0
    pr = jnp.maximum(rp, 0.0)
    tr = jnp.where(maskr[None],
                   jnp.stack([bdots(t[k], fw.w2f1) for k in range(3)], axis=0),
                   0.0)  # [3, V, N, hid]

    o = (jnp.sum(pr * fw.fw2[:, None, :].astype(f32), axis=-1)
         + 2.0 * (jnp.sum(p * fw.w2wo[:, None, :].astype(f32), axis=-1)
                  + jnp.einsum("nk,vk->vn", cd_pe.astype(f32), fw.wdwo.astype(f32)))
         + fw.obias[:, None]
         + ref_t)  # [V, N]
    to = (jnp.sum(tr * fw.fw2[None, :, None, :].astype(f32), axis=-1)
          + 2.0 * jnp.sum(t * fw.w2wo[None, :, None, :].astype(f32), axis=-1))
    return o, to  # [V, N], [3, V, N]


def _decode_bwd_kernel_v4s(
    pe_ref, cdpe_ref, go_ref, gto_ref,
    w1g_ref, w1t_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
    fw2_ref, w2wo_ref, wdwo_ref,
    gw1g_ref, gw1t_ref, gb1_ref, gw2f1_ref, gwdf1_ref, grbias_ref,
    gfw2_ref, gw2wo_ref, gwdwo_ref,
    *, block_n: int, n_vars: int, cdt, two_f: int,
):
    """Backward of the v4s decode wrt the fused weights (recompute-in-VMEM).

    Mirror of ``_decode_bwd_kernel_v4(t_layout=True)`` with the channel-major
    trig operand feeding both the primal (flattened ``w1g``) and, via its
    contiguous lane slices, the tangent (``w1t``) layer-1 cotangents --
    no dpe input to load or store as a residual.
    """
    f32 = jnp.float32
    i = pl.program_id(0)
    P_in = pe_ref[...]  # [Nb, 3*2F] cdt channel-major
    CD = cdpe_ref[...]  # [Nb, in_ch] cdt

    @pl.when(i == 0)
    def _init():
        for ref in (gw1g_ref, gw1t_ref, gb1_ref, gw2f1_ref, gwdf1_ref,
                    grbias_ref, gfw2_ref, gw2wo_ref, gwdwo_ref):
            ref[...] = jnp.zeros_like(ref)

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    def dot_t(a, b):  # a^T @ b, contracting the row (point) axis
        return jax.lax.dot_general(
            a.astype(cdt), b.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def dot_wt(g, w):  # g @ w^T
        return jax.lax.dot_general(
            g.astype(cdt), w.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    T_sl = [P_in[:, k * two_f:(k + 1) * two_f] for k in range(3)]
    # var-major cotangents -> column form in VMEM (~6x256 values, negligible)
    gp_t = go_ref[...].T  # [Nb, n_vars]
    gt_t = [gto_ref[k].T for k in range(3)]  # each [Nb, n_vars]

    for v in range(n_vars):
        # ---- recompute the forward chain ----
        z = dot(P_in, w1g_ref[v]) + b1_ref[v][None, :]
        mask = z > 0
        p = jnp.maximum(z, 0.0)
        mask3 = jnp.concatenate([mask, mask, mask], axis=0)
        tz = jnp.concatenate(
            [dot(T_sl[k], w1t_ref[v, k]) for k in range(3)], axis=0)
        t = jnp.where(mask3, tz, 0.0)  # [3Nb, hid]
        W = w2f1_ref[v]
        rp = dot(p, W) + dot(CD, wdf1_ref[v]) + rbias_ref[v][None, :]
        maskr = rp > 0
        pr = jnp.maximum(rp, 0.0)
        maskr3 = jnp.concatenate([maskr, maskr, maskr], axis=0)
        tr = jnp.where(maskr3, dot(t, W), 0.0)

        # ---- backward ----
        go = gp_t[:, v : v + 1]  # [Nb, 1] f32
        gto = jnp.concatenate(
            [gt_t[k][:, v : v + 1] for k in range(3)], axis=0)  # [3Nb, 1]
        a_v = fw2_ref[v][None, :]  # [1, hid]
        b_v = w2wo_ref[v][None, :]

        g_rp = jnp.where(maskr, go * a_v, 0.0)  # [Nb, hid]
        g_rt = jnp.where(maskr3, gto * a_v, 0.0)  # [3Nb, hid]

        gfw2_ref[v] += jnp.sum(pr * go, axis=0) + jnp.sum(tr * gto, axis=0)
        gw2wo_ref[v] += 2.0 * (jnp.sum(p * go, axis=0) + jnp.sum(t * gto, axis=0))
        gwdwo_ref[v] += 2.0 * jnp.sum(CD.astype(f32) * go, axis=0)
        # g_obias = sum(go): scalar per variable, computed by the caller
        grbias_ref[v] += jnp.sum(g_rp, axis=0)

        gw2f1_ref[v] += dot_t(p, g_rp) + dot_t(t, g_rt)
        gwdf1_ref[v] += dot_t(CD, g_rp)

        g_p = dot_wt(g_rp, W) + 2.0 * (go * b_v)
        g_t = dot_wt(g_rt, W) + 2.0 * (gto * b_v)
        g_z = jnp.where(mask, g_p, 0.0)
        g_tz = jnp.where(mask3, g_t, 0.0)

        gw1g_ref[v] += dot_t(P_in.astype(f32), g_z)
        gb1_ref[v] += jnp.sum(g_z, axis=0)
        for k in range(3):
            gw1t_ref[v, k] += dot_t(
                T_sl[k].astype(f32), g_tz[k * block_n : (k + 1) * block_n])


def decode_bwd_kernel_v4s(
    fw: FusedDecodeWeightsV6,
    pe_cm: jnp.ndarray,  # [N, 3*2F]
    cd_pe: jnp.ndarray,
    g_primal_t: jnp.ndarray,  # [6, N] f32 var-major
    g_tang_t: jnp.ndarray,  # [3, 6, N] f32 var-major
    block_n: int = 256,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    vmem_limit_bytes: int = 100 * 1024 * 1024,
) -> FusedDecodeWeightsV6:
    """Weight cotangents of fused_decode_jvp_v4s (obias slot carries g_obias)."""
    n, in_ch = pe_cm.shape
    n_vars, _, two_f, hid = fw.w1t.shape
    if n % block_n != 0:
        pad = block_n - n % block_n
        pe_cm = jnp.pad(pe_cm, ((0, pad), (0, 0)))
        cd_pe = jnp.pad(cd_pe, ((0, pad), (0, 0)))
        # zero cotangents on padded points -> no gradient contribution
        g_primal_t = jnp.pad(g_primal_t, ((0, 0), (0, pad)))
        g_tang_t = jnp.pad(g_tang_t, ((0, 0), (0, 0), (0, pad)))
    n_pad = pe_cm.shape[0]
    grid = (n_pad // block_n,)

    cd = compute_dtype
    f32 = jnp.float32
    wt = [fw.w1g.reshape(n_vars, in_ch, hid).astype(cd), fw.w1t.astype(cd),
          fw.b1.astype(f32), fw.w2f1.astype(cd), fw.wdf1.astype(cd),
          fw.rbias.astype(f32), fw.fw2.astype(f32), fw.w2wo.astype(f32),
          fw.wdwo.astype(f32)]

    mem = pltpu.VMEM if _HAS_PLTPU else pl.ANY
    full = lambda: pl.BlockSpec(memory_space=mem)
    acc = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=mem)
    kernel = functools.partial(_decode_bwd_kernel_v4s, block_n=block_n,
                               n_vars=n_vars, cdt=cd, two_f=two_f)
    extra = {}
    if vmem_limit_bytes and _HAS_PLTPU and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((n_vars, in_ch, hid), f32),  # g_w1g (flat)
            jax.ShapeDtypeStruct((n_vars, 3, two_f, hid), f32),  # g_w1t
            jax.ShapeDtypeStruct((n_vars, hid), f32),  # g_b1
            jax.ShapeDtypeStruct((n_vars, hid, hid), f32),  # g_w2f1
            jax.ShapeDtypeStruct((n_vars, in_ch, hid), f32),  # g_wdf1
            jax.ShapeDtypeStruct((n_vars, hid), f32),  # g_rbias
            jax.ShapeDtypeStruct((n_vars, hid), f32),  # g_fw2
            jax.ShapeDtypeStruct((n_vars, hid), f32),  # g_w2wo
            jax.ShapeDtypeStruct((n_vars, in_ch), f32),  # g_wdwo
        ),
        in_specs=[
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((n_vars, block_n), lambda i: (0, i), memory_space=mem),
            pl.BlockSpec((3, n_vars, block_n), lambda i: (0, 0, i), memory_space=mem),
        ] + [full() for _ in wt],
        out_specs=(
            acc(n_vars, in_ch, hid), acc(n_vars, 3, two_f, hid), acc(n_vars, hid),
            acc(n_vars, hid, hid), acc(n_vars, in_ch, hid), acc(n_vars, hid),
            acc(n_vars, hid), acc(n_vars, hid), acc(n_vars, in_ch),
        ),
        interpret=interpret,
        **extra,
    )(pe_cm.astype(cd), cd_pe.astype(cd),
      g_primal_t.astype(f32), g_tang_t.astype(f32), *wt)
    return FusedDecodeWeightsV6(
        w1g=outs[0].reshape(n_vars, 3, two_f, hid), w1t=outs[1], b1=outs[2],
        w2f1=outs[3], wdf1=outs[4], rbias=outs[5], fw2=outs[6], w2wo=outs[7],
        wdwo=outs[8], obias=jnp.sum(g_primal_t[:, :n], axis=1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_decode_jvp_v4s_kbwd(fw, pe_cm, cd_pe, ref_t,
                              block_n=256, compute_dtype=jnp.bfloat16,
                              interpret=False):
    """v4s decode with Pallas kernels on BOTH passes (training hot path).

    Var-major ([6, N] / [3, 6, N]) outputs; same gradient contract as
    ``fused_decode_jvp_v4t_kbwd``: exact cotangents for the fused weights
    and ``ref_t``, zeros for pe_cm/cd_pe (data inputs in the training
    engine).  ``interpret=True`` forces the REAL Pallas kernels in interpret
    mode on any backend; otherwise off-TPU falls back to the XLA twin.
    """
    if interpret or (_HAS_PLTPU and jax.default_backend() == "tpu"):
        return fused_decode_jvp_v4s(fw, pe_cm, cd_pe, ref_t,
                                    block_n=block_n, compute_dtype=compute_dtype,
                                    interpret=interpret)
    return decode_jvp_xla_v4s(fw, pe_cm, cd_pe, ref_t, compute_dtype)


def _fused_v4s_kbwd_fwd(fw, pe_cm, cd_pe, ref_t, block_n, compute_dtype,
                        interpret):
    out = fused_decode_jvp_v4s_kbwd(fw, pe_cm, cd_pe, ref_t, block_n,
                                    compute_dtype, interpret)
    return out, (fw, pe_cm, cd_pe)


def _fused_v4s_kbwd_bwd(block_n, compute_dtype, interpret, res, g):
    fw, pe_cm, cd_pe = res
    g_primal_t, g_tang_t = g
    if interpret or (_HAS_PLTPU and jax.default_backend() == "tpu"):
        gfw = decode_bwd_kernel_v4s(fw, pe_cm, cd_pe, g_primal_t, g_tang_t,
                                    block_n=block_n, compute_dtype=compute_dtype,
                                    interpret=interpret)
    else:
        # CPU fallback: the twin's VJP, projected onto the weight cotangents
        zeros_ref = jnp.zeros_like(g_primal_t)
        _, vjp = jax.vjp(
            lambda w: decode_jvp_xla_v4s(w, pe_cm, cd_pe, zeros_ref,
                                         compute_dtype), fw)
        (gfw,) = vjp((g_primal_t, g_tang_t))
    g_ref_t = g_primal_t  # o = ... + ref (identity head)
    return (gfw, jnp.zeros_like(pe_cm), jnp.zeros_like(cd_pe), g_ref_t)


fused_decode_jvp_v4s_kbwd.defvjp(_fused_v4s_kbwd_fwd, _fused_v4s_kbwd_bwd)

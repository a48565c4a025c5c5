"""Fused Pallas kernel: decode + tangents + in-kernel PDE residual assembly.

The eval-path residual pipeline was three stages: the v4 decode+jvp kernel
(ops/decode_kernel.py) writing primal [N, 6] + tangents [3, N, 6] to HBM, an
XLA inverse-normalization chain (physics/engine.py::fields_from_primal_
tangents), and the six-equation residual assembly + MSE reductions
(physics/engine.py::residual_losses_from_fields).  The post-kernel stages cost
a measured 0.288 ms of the 2.263 ms evaluation at the 40960-point bench shape
(12.7%; scripts/perf_bound_assembly.py) -- mostly dispatch and HBM round trips
of the [3, N, 6] tangent tensor, not FLOPs.

This kernel fuses all three: each grid block decodes its points with the exact
shared v4 math (`_v4_var_column`, the same traced ops as the decode kernel),
applies the inverse-norm chain rule and clip masking with compile-time
constants from the observation specs, evaluates the six primitive-equation
residuals by calling physics/equations.py *inside* the kernel (the equations
are pure elementwise jnp, so the reference formulas -- reference
interface_physics.py:97-185 -- are reused verbatim rather than re-derived),
and reduces each equation's squared residual to one partial sum per block.
HBM output traffic collapses from 96 B/point to 24 B per *block*.

Eval/validation path only (MSE criterion, mean_norm specs): training keeps the
decode kernel + XLA assembly because the loss there must be differentiable
w.r.t. the generated weights (custom-VJP pair in ops/decode_kernel.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from deepphysinet_tpu.ops.decode_kernel import (
    FusedDecodeWeights, FusedDecodeWeightsV6, _HAS_PLTPU, _v4_var_column,
    _v6_var_column, pltpu)
from deepphysinet_tpu.physics import equations as eqs
from deepphysinet_tpu.physics.constants import DEFAULT_CONSTANTS, PhysicalConstants

FIELD_KEYS = ("u", "v", "p", "T", "q", "rio")
# clip applies to p, T, q, rho only -- u, v are never clipped
# (physics/engine.py::fields_from_primal_tangents, reference inverse_norm)
_CLIPPED = (False, False, True, True, True, True)


def _residual_kernel_v4(
    pe_ref, dpe_ref, cdpe_ref, ref_ref, f_ref,
    w1_ref, w1c_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
    fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
    out_ref,
    *, block_n: int, cdt, n_valid: int, stds, means, bounds, with_clip: bool,
    constants: PhysicalConstants,
):
    f32 = jnp.float32
    P_in = pe_ref[...]
    T_in = dpe_ref[...]
    CD = cdpe_ref[...]

    # The assembly works on [1, Nb] ROW vectors: a [Nb]-shaped reduction
    # result lays out along the lane axis, so keeping the epilogue in row
    # form uses all 128 VPU lanes and avoids the [Nb, 1]-column relayout
    # (measured 15.3M vs 18.2M evals/s when the epilogue ran on columns).
    fields: Dict[str, jnp.ndarray] = {}
    derivs: Dict[str, Dict[str, jnp.ndarray]] = {}
    for v, key in enumerate(FIELD_KEYS):
        o, to3 = _v4_var_column(
            # ref arrives TRANSPOSED [6, Nb]: the leading-dim index yields a
            # zero-lane-offset row, which the scalar reductions below require
            # (a ref[:, v] lane slice carries offset v into every consumer and
            # Mosaic refuses offset-laden float reductions)
            P_in, T_in, CD, ref_ref[v],
            w1_ref, w1c_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
            fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
            v=v, block_n=block_n, cdt=cdt,
        )
        oc = o[None, :]  # [1, Nb] normalized primal
        std, mean = stds[v], means[v]
        phys = oc * std + mean
        scale = std
        if with_clip and _CLIPPED[v] and bounds[v] is not None:
            lo, hi = bounds[v]
            # mask from the UNCLIPPED value, strict bounds (torch.clip
            # derivative semantics; engine.fields_from_primal_tangents)
            in_b = jnp.logical_and(phys > lo, phys < hi).astype(f32)
            phys = jnp.clip(phys, lo, hi)
            scale = std * in_b
        fields[key] = phys
        derivs[key] = {
            "x": to3[0][None, :] * scale,
            "y": to3[1][None, :] * scale,
            "t": to3[2][None, :] * scale,
        }

    f = f_ref[...].astype(f32)  # [1, Nb] coriolis (row form)

    # padded-tail rows must not contribute to the sums
    i = pl.program_id(0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (1, block_n), 1) + i * block_n
    valid = (ridx < n_valid).astype(f32)

    pairs = (
        eqs.momentum_u_residual(fields, derivs, f, constants),
        eqs.momentum_v_residual(fields, derivs, f, constants),
        eqs.continuity_residual(fields, derivs, constants),
        eqs.energy_residual(fields, derivs, constants),
        eqs.vapor_residual(fields, derivs, constants),
        eqs.gas_residual(fields, constants),
    )
    # scalar-sum x one-hot accumulation avoids relayout-prone scalar
    # stack/concat lowering; the single [1, 128] output block is shared by
    # every grid step (index map pinned to 0) and accumulated in VMEM, the
    # same pattern as the backward kernel's weight-cotangent buffers
    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, out_ref.shape[-1]), 1)
    row = jnp.zeros((1, out_ref.shape[-1]), f32)
    for e, (diff, const) in enumerate(pairs):
        d = (diff.astype(f32) - const.astype(f32)) * valid
        row = row + jnp.sum(d * d) * (lane == e).astype(f32)
    out_ref[...] += row


def _residual_kernel_v6(
    trig_ref, cdpe_ref, ref_ref, f_ref,
    w1g_ref, w1t_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
    fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
    out_ref,
    *, block_n: int, cdt, n_valid: int, stds, means, bounds, with_clip: bool,
    constants: PhysicalConstants,
):
    """v6 twin of _residual_kernel_v4: trig-block layer 1, same assembly."""
    f32 = jnp.float32
    T = trig_ref[...]
    CD = cdpe_ref[...]

    fields: Dict[str, jnp.ndarray] = {}
    derivs: Dict[str, Dict[str, jnp.ndarray]] = {}
    for v, key in enumerate(FIELD_KEYS):
        o, to3 = _v6_var_column(
            T, CD, ref_ref[v],
            w1g_ref, w1t_ref, b1_ref, w2f1_ref, wdf1_ref, rbias_ref,
            fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
            v=v, block_n=block_n, cdt=cdt,
        )
        oc = o[None, :]  # [1, Nb] normalized primal
        std, mean = stds[v], means[v]
        phys = oc * std + mean
        scale = std
        if with_clip and _CLIPPED[v] and bounds[v] is not None:
            lo, hi = bounds[v]
            in_b = jnp.logical_and(phys > lo, phys < hi).astype(f32)
            phys = jnp.clip(phys, lo, hi)
            scale = std * in_b
        fields[key] = phys
        derivs[key] = {
            "x": to3[0][None, :] * scale,
            "y": to3[1][None, :] * scale,
            "t": to3[2][None, :] * scale,
        }

    f = f_ref[...].astype(f32)  # [1, Nb] coriolis (row form)

    i = pl.program_id(0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (1, block_n), 1) + i * block_n
    valid = (ridx < n_valid).astype(f32)

    pairs = (
        eqs.momentum_u_residual(fields, derivs, f, constants),
        eqs.momentum_v_residual(fields, derivs, f, constants),
        eqs.continuity_residual(fields, derivs, constants),
        eqs.energy_residual(fields, derivs, constants),
        eqs.vapor_residual(fields, derivs, constants),
        eqs.gas_residual(fields, constants),
    )

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, out_ref.shape[-1]), 1)
    row = jnp.zeros((1, out_ref.shape[-1]), f32)
    for e, (diff, const) in enumerate(pairs):
        d = (diff.astype(f32) - const.astype(f32)) * valid
        row = row + jnp.sum(d * d) * (lane == e).astype(f32)
    out_ref[...] += row


def fused_residual_sums_v6(
    fw: FusedDecodeWeightsV6,
    trig: jnp.ndarray,  # [3, N, 2F] f32
    cd_pe: jnp.ndarray,  # [N, in_ch] f32
    ref: jnp.ndarray,  # [N, 6] normalized conditioning values
    coriolis_f: jnp.ndarray,  # [N, 1]
    obs_specs,
    with_clip: bool = True,
    constants: PhysicalConstants = DEFAULT_CONSTANTS,
    block_n: int = 256,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """v6 twin of fused_residual_sums_v4 (trig inputs, no dpe array)."""
    _, n, two_f = trig.shape
    in_ch = cd_pe.shape[-1]
    for spec in obs_specs:
        if spec.use_norm and spec.norm_type.lower() != "mean_norm":
            raise NotImplementedError(
                f"residual kernel supports mean_norm only, got {spec.norm_type} "
                f"for {spec.name}")
    stds = tuple(float(s.norm_factor[1]) if s.use_norm else 1.0 for s in obs_specs)
    means = tuple(float(s.norm_factor[0]) if s.use_norm else 0.0 for s in obs_specs)
    bounds = tuple(
        (float(s.bound[0]), float(s.bound[1])) if s.bound is not None else None
        for s in obs_specs)

    f_row = coriolis_f.reshape(1, n)
    ref_t = ref.T  # [6, N]: leading-dim variable slices (zero lane offset)
    if n % block_n != 0:
        pad = block_n - n % block_n
        trig = jnp.pad(trig, ((0, 0), (0, pad), (0, 0)))
        cd_pe = jnp.pad(cd_pe, ((0, pad), (0, 0)))
        ref_t = jnp.pad(ref_t, ((0, 0), (0, pad)))
        f_row = jnp.pad(f_row, ((0, 0), (0, pad)))
    n_pad = trig.shape[1]
    grid = (n_pad // block_n,)

    cd = compute_dtype
    f32 = jnp.float32
    wt = [fw.w1g.astype(cd), fw.w1t.astype(cd), fw.b1.astype(f32),
          fw.w2f1.astype(cd), fw.wdf1.astype(cd), fw.rbias.astype(f32),
          fw.fw2.astype(f32), fw.w2wo.astype(f32), fw.wdwo.astype(f32),
          fw.obias.astype(f32)]
    n_vars = fw.w1g.shape[0]

    mem = pltpu.VMEM if _HAS_PLTPU else pl.ANY
    full = lambda: pl.BlockSpec(memory_space=mem)
    kernel = functools.partial(
        _residual_kernel_v6, block_n=block_n, cdt=cd, n_valid=n,
        stds=stds, means=means, bounds=bounds, with_clip=with_clip,
        constants=constants)

    sums = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((1, 128), f32),
        in_specs=[
            pl.BlockSpec((3, block_n, two_f), lambda i: (0, i, 0), memory_space=mem),
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((n_vars, block_n), lambda i: (0, i), memory_space=mem),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=mem),
        ] + [full() for _ in wt],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=mem),
        interpret=interpret,
    )(trig.astype(cd), cd_pe.astype(cd), ref_t.astype(f32),
      f_row.astype(f32), *wt)
    return sums[0, :6]  # [6]


def fused_residual_sums_v4(
    fw: FusedDecodeWeights,
    pe: jnp.ndarray,  # [N, in_ch] f32
    dpe: jnp.ndarray,  # [3, N, in_ch//3] f32 compact
    cd_pe: jnp.ndarray,  # [N, in_ch] f32
    ref: jnp.ndarray,  # [N, 6] normalized conditioning values
    coriolis_f: jnp.ndarray,  # [N, 1]
    obs_specs,
    with_clip: bool = True,
    constants: PhysicalConstants = DEFAULT_CONSTANTS,
    block_n: int = 256,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Per-equation squared-residual sums [6] over all N points, in one launch.

    Equation order: (momentum_u, momentum_v, continuity, energy, vapor, gas).
    Divide by N for the MSE the engine's XLA assembly computes.
    """
    n, in_ch = pe.shape
    ch = dpe.shape[-1]
    for i, spec in enumerate(obs_specs):
        if spec.use_norm and spec.norm_type.lower() != "mean_norm":
            raise NotImplementedError(
                f"residual kernel supports mean_norm only, got {spec.norm_type} "
                f"for {spec.name}")
    stds = tuple(float(s.norm_factor[1]) if s.use_norm else 1.0 for s in obs_specs)
    means = tuple(float(s.norm_factor[0]) if s.use_norm else 0.0 for s in obs_specs)
    bounds = tuple(
        (float(s.bound[0]), float(s.bound[1])) if s.bound is not None else None
        for s in obs_specs)

    f_row = coriolis_f.reshape(1, n)  # row form for the in-kernel assembly
    ref_t = ref.T  # [6, N]: leading-dim variable slices (zero lane offset)
    if n % block_n != 0:
        pad = block_n - n % block_n
        pe = jnp.pad(pe, ((0, pad), (0, 0)))
        dpe = jnp.pad(dpe, ((0, 0), (0, pad), (0, 0)))
        cd_pe = jnp.pad(cd_pe, ((0, pad), (0, 0)))
        ref_t = jnp.pad(ref_t, ((0, 0), (0, pad)))
        f_row = jnp.pad(f_row, ((0, 0), (0, pad)))
    n_pad = pe.shape[0]
    grid = (n_pad // block_n,)

    cd = compute_dtype
    f32 = jnp.float32
    wt = [fw.w1.astype(cd), fw.w1c.astype(cd), fw.b1.astype(f32),
          fw.w2f1.astype(cd), fw.wdf1.astype(cd), fw.rbias.astype(f32),
          fw.fw2.astype(f32), fw.w2wo.astype(f32), fw.wdwo.astype(f32),
          fw.obias.astype(f32)]
    n_vars = fw.w1.shape[0]

    mem = pltpu.VMEM if _HAS_PLTPU else pl.ANY
    full = lambda: pl.BlockSpec(memory_space=mem)
    kernel = functools.partial(
        _residual_kernel_v4, block_n=block_n, cdt=cd, n_valid=n,
        stds=stds, means=means, bounds=bounds, with_clip=with_clip,
        constants=constants)

    sums = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((1, 128), f32),
        in_specs=[
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((3, block_n, ch), lambda i: (0, i, 0), memory_space=mem),
            pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
            pl.BlockSpec((n_vars, block_n), lambda i: (0, i), memory_space=mem),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=mem),
        ] + [full() for _ in wt],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=mem),
        interpret=interpret,
    )(pe.astype(cd), dpe.astype(cd), cd_pe.astype(cd), ref_t.astype(f32),
      f_row.astype(f32), *wt)
    return sums[0, :6]  # [6]


def kernel_residual_losses(
    model,
    params,
    tokens: jnp.ndarray,  # [T, D]
    coords: jnp.ndarray,  # [N, 3] physical
    coord_data: jnp.ndarray,  # [N, 6] normalized conditioning values
    fore_h: jnp.ndarray,  # [1]
    coriolis_f: jnp.ndarray,  # [N, 1]
    coord_spec,
    obs_specs,
    loss_factor: Dict[str, float],
    with_clip: bool = True,
    constants: PhysicalConstants = DEFAULT_CONSTANTS,
    interpret: bool = False,
    block_n: int = 256,
    version: int = 4,
) -> Dict[str, jnp.ndarray]:
    """Drop-in for engine.fused_kernel_fields + residual_losses_from_fields on
    the forward-only path (MSE criterion): same loss dict, one kernel launch.
    """
    from deepphysinet_tpu.ops.decode_kernel import (
        extract_decode_weights, fuse_decode_weights, fuse_v6_from_v4,
        pe_and_tangents, trig3_inputs)
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe

    weights = extract_decode_weights(model, params, tokens, fore_h)
    in_ch = model.net_cfg["in_channels"]
    cd_freqs = make_freq_bands(in_ch // 2 // 6, max_freq=4.0)
    cd_pe = sinecos_pe(coord_data, cd_freqs, include_input=False)
    fw = fuse_decode_weights(weights)
    if version == 6:
        trig = trig3_inputs(coords, coord_spec)
        sums = fused_residual_sums_v6(
            fuse_v6_from_v4(fw, coord_spec), trig, cd_pe, coord_data,
            coriolis_f, obs_specs, with_clip=with_clip, constants=constants,
            interpret=interpret, block_n=block_n,
            compute_dtype=model.compute_dtype)
    else:
        pe, dpe = pe_and_tangents(coords, coord_spec)
        sums = fused_residual_sums_v4(
            fw, pe, dpe, cd_pe, coord_data, coriolis_f, obs_specs,
            with_clip=with_clip, constants=constants, interpret=interpret,
            block_n=block_n, compute_dtype=model.compute_dtype)
    n = coords.shape[0]
    mse = sums / float(n)
    losses = {
        "montion_u_loss": mse[0] * loss_factor["motion_u_factor"],
        "montion_v_loss": mse[1] * loss_factor["motion_v_factor"],
        "continous_loss": mse[2] * loss_factor["continuous_factor"],
        "energy_loss": mse[3] * loss_factor["energy_factor"],
        "vapor_loss": mse[4] * loss_factor["vapor_factor"],
        "gas_loss": mse[5] * loss_factor["gas_factor"],
    }
    losses["total"] = (
        losses["montion_u_loss"] + losses["montion_v_loss"]
        + losses["energy_loss"] + losses["continous_loss"]
        + losses["vapor_loss"] + losses["gas_loss"]
    )
    return losses

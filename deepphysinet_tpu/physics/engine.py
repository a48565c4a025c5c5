"""Forward-mode PDE residual engine.

The reference computes every space-time derivative with reverse-mode
``torch.autograd.grad(create_graph=True)`` -- 19 full backward passes through
the network per collocation batch (interface_physics.py:90-95, 285-299).  The
TPU-native engine uses **one** ``jax.linearize`` of the batched point function
plus three tangent passes (unit directions x, y, t): the primal network trace
is shared, each tangent pass is a chain of matmuls the MXU eats whole, and the
entire engine lives inside the training jit so XLA fuses it with the rest of
the step.

The point function must map physical coordinates [N, 3] (x meters, y meters,
t seconds) to physical-unit outputs [N, 6] in VARIABLE_ORDER (u, v, p, T, q,
rho), including coordinate encoding and inverse normalization -- so the
returned derivatives are exactly the d(physical)/d(physical) quantities the
equations need.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deepphysinet_tpu.physics import equations as eqs
from deepphysinet_tpu.physics.constants import DEFAULT_CONSTANTS, PhysicalConstants

FIELD_KEYS = ("u", "v", "p", "T", "q", "rio")


@dataclasses.dataclass
class FieldDerivatives:
    """Physical fields and their x/y/t derivatives at the collocation points."""

    fields: Dict[str, jnp.ndarray]  # each [N, 1]
    derivs: Dict[str, Dict[str, jnp.ndarray]]  # derivs[var][axis] -> [N, 1]


def linearized_fields(
    phys_fn: Callable[[jnp.ndarray], jnp.ndarray], coords: jnp.ndarray
) -> FieldDerivatives:
    """Evaluate ``phys_fn`` and its x/y/t Jacobian columns at ``coords [N, 3]``."""
    primal, lin = jax.linearize(phys_fn, coords)

    n = coords.shape[0]

    def tangent(axis: int) -> jnp.ndarray:
        basis = jnp.zeros((n, 3), coords.dtype).at[:, axis].set(1.0)
        return lin(basis)  # [N, 6]

    dx, dy, dt = tangent(0), tangent(1), tangent(2)

    fields = {k: primal[:, i : i + 1] for i, k in enumerate(FIELD_KEYS)}
    derivs = {
        k: {
            "x": dx[:, i : i + 1],
            "y": dy[:, i : i + 1],
            "t": dt[:, i : i + 1],
        }
        for i, k in enumerate(FIELD_KEYS)
    }
    return FieldDerivatives(fields=fields, derivs=derivs)


def _mse(diff: jnp.ndarray, const: jnp.ndarray) -> jnp.ndarray:
    d = (diff - const).astype(jnp.float32)
    return jnp.mean(d * d)


def residual_losses_from_fields(
    fd: FieldDerivatives,
    coriolis_f: jnp.ndarray,
    loss_factor: Dict[str, float],
    constants: PhysicalConstants = DEFAULT_CONSTANTS,
    criterion: Optional[Callable] = None,
) -> Dict[str, jnp.ndarray]:
    """Assemble the six equation losses from already-computed fields/derivs.

    ``criterion(pred, target) -> scalar`` defaults to MSE (the reference
    config's pde_loss); any registered loss can be passed through.
    """
    crit = criterion or _mse
    fields, derivs = fd.fields, fd.derivs
    losses = {}
    diff, const = eqs.momentum_u_residual(fields, derivs, coriolis_f, constants)
    losses["montion_u_loss"] = crit(diff, const) * loss_factor["motion_u_factor"]
    diff, const = eqs.momentum_v_residual(fields, derivs, coriolis_f, constants)
    losses["montion_v_loss"] = crit(diff, const) * loss_factor["motion_v_factor"]
    diff, const = eqs.continuity_residual(fields, derivs, constants)
    losses["continous_loss"] = crit(diff, const) * loss_factor["continuous_factor"]
    diff, const = eqs.energy_residual(fields, derivs, constants)
    losses["energy_loss"] = crit(diff, const) * loss_factor["energy_factor"]
    diff, const = eqs.vapor_residual(fields, derivs, constants)
    losses["vapor_loss"] = crit(diff, const) * loss_factor["vapor_factor"]
    diff, const = eqs.gas_residual(fields, constants)
    losses["gas_loss"] = crit(diff, const) * loss_factor["gas_factor"]
    losses["total"] = (
        losses["montion_u_loss"] + losses["montion_v_loss"] + losses["energy_loss"]
        + losses["continous_loss"] + losses["vapor_loss"] + losses["gas_loss"]
    )
    return losses


def fields_from_primal_tangents(
    primal: jnp.ndarray,  # [N, 6] normalized-unit decode outputs
    tang: jnp.ndarray,  # [3, N, 6] d(normalized)/d(physical x, y, t)
    obs_specs,
    with_clip: bool,
) -> FieldDerivatives:
    """Inverse-normalization chain rule + clip masking -> physical fields/derivs.

    For mean_norm, d(phys)/dx = std * d(norm)/dx; where the clip is active the
    derivative is zero (torch.clip semantics, matching the linearize path).
    """
    from deepphysinet_tpu.ops.normalization import inverse_normalize

    clipped = (False, False, True, True, True, True)  # u, v never clip
    fields, derivs = {}, {}
    for i, key in enumerate(FIELD_KEYS):
        spec = obs_specs[i]
        if spec.use_norm and spec.norm_type.lower() != "mean_norm":
            raise NotImplementedError(
                "fused kernel chain rule supports mean_norm only; use the "
                f"linearize engine for {spec.name} ({spec.norm_type})"
            )
        p_norm = primal[:, i : i + 1]
        clip = with_clip and clipped[i] and spec.bound is not None
        p_phys = inverse_normalize(p_norm, spec, with_clip=clip)
        std = (jnp.asarray(spec.norm_factor[1], jnp.float32)
               if spec.use_norm else jnp.asarray(1.0, jnp.float32))
        scale = std
        if clip:
            lo, hi = spec.bound
            unclipped = inverse_normalize(p_norm, spec, with_clip=False)
            scale = std * ((unclipped > lo) & (unclipped < hi)).astype(jnp.float32)
        fields[key] = p_phys
        derivs[key] = {
            "x": tang[0, :, i : i + 1] * scale,
            "y": tang[1, :, i : i + 1] * scale,
            "t": tang[2, :, i : i + 1] * scale,
        }
    return FieldDerivatives(fields=fields, derivs=derivs)


def packed_physical_from_primal_tangents(
    primal: jnp.ndarray,  # [N, 6] normalized-unit decode outputs
    tang: jnp.ndarray,  # [3, N, 6] d(normalized)/d(physical x, y, t)
    obs_specs,
    with_clip: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized twin of ``fields_from_primal_tangents``.

    Returns ``(P [6, N] physical fields, D [3, 6, N] physical derivs)`` in
    variable-major layout.  Same math as the dict form (mean_norm inverse +
    torch.clip semantics with zero derivative where the clip is active), but
    as a handful of full-width ops instead of 24 separate ``[N, 1]`` column
    chains -- on TPU the column form runs at 1/128 lane utilization and its
    reverse-AD cost ~1.0 ms of the 4.9 ms production step (docs/PERF.md
    round 4 (c)); this form and its XLA backward are a few tens of µs.
    """
    return packed_physical_from_primal_tangents_t(
        primal.T, tang.transpose(0, 2, 1), obs_specs, with_clip)


def packed_physical_from_primal_tangents_t(
    primal_t: jnp.ndarray,  # [6, N] var-major normalized decode outputs
    tang_t: jnp.ndarray,  # [3, 6, N] var-major normalized tangents
    obs_specs,
    with_clip: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``packed_physical_from_primal_tangents`` on already-var-major inputs.

    The var-major decode kernel (ops/decode_kernel.py::fused_decode_jvp_v4t)
    emits this layout directly, so no transpose of a lane-padded minor-dim-6
    buffer appears anywhere in the traced program (docs/PERF.md round 4 (e)).
    """
    import numpy as np

    clipped = (False, False, True, True, True, True)  # u, v never clip
    mean = np.zeros(6, np.float32)
    std = np.ones(6, np.float32)
    lo = np.full(6, -np.inf, np.float32)
    hi = np.full(6, np.inf, np.float32)
    clip_col = np.zeros(6, bool)
    for i, spec in enumerate(obs_specs):
        if spec.use_norm:
            if spec.norm_type.lower() != "mean_norm":
                raise NotImplementedError(
                    "packed assembly supports mean_norm only; use the "
                    f"linearize engine for {spec.name} ({spec.norm_type})")
            mean[i] = np.float32(spec.norm_factor[0])
            std[i] = np.float32(spec.norm_factor[1])
        if with_clip and clipped[i] and spec.bound is not None:
            lo[i], hi[i] = spec.bound
            clip_col[i] = True

    unclipped = primal_t * jnp.asarray(std)[:, None] + jnp.asarray(mean)[:, None]
    fields = jnp.clip(unclipped, jnp.asarray(lo)[:, None], jnp.asarray(hi)[:, None])
    in_bounds = (
        (unclipped > jnp.asarray(lo)[:, None]) & (unclipped < jnp.asarray(hi)[:, None])
    ).astype(jnp.float32)
    scale = jnp.where(jnp.asarray(clip_col)[:, None],
                      jnp.asarray(std)[:, None] * in_bounds,
                      jnp.asarray(std)[:, None])  # [6, N]
    derivs = tang_t * scale[None]  # [3, 6, N]
    return fields, derivs


def residual_losses_packed(
    fields: jnp.ndarray,  # [6, N] physical (u, v, p, T, q, rho)
    derivs: jnp.ndarray,  # [3, 6, N] physical d/dx, d/dy, d/dt
    coriolis_f: jnp.ndarray,  # [N, 1] or [N]
    loss_factor: Dict[str, float],
    constants: PhysicalConstants = DEFAULT_CONSTANTS,
) -> Dict[str, jnp.ndarray]:
    """Vectorized twin of ``residual_losses_from_fields`` (MSE criterion).

    All six equations share the advective operator D(.)/Dt computed once on
    the full [6, N] block; each residual is then a row combination.  Same
    formulas and stop_gradient placement as physics/equations.py (reference
    interface_physics.py:90-185); identical values, vastly cheaper XLA
    reverse-AD (docs/PERF.md round 4 (d)).
    """
    c = constants
    u, v, p, T, q, rho = (fields[i] for i in range(6))
    f = coriolis_f[:, 0] if coriolis_f.ndim == 2 else coriolis_f
    # advective derivative of every variable: [6, N]
    adv = derivs[2] + u[None, :] * derivs[0] + v[None, :] * derivs[1]

    r_u = adv[0] + derivs[0, 2] / rho - f * v
    r_v = adv[1] + derivs[1, 2] / rho + f * u
    r_c = adv[5] + rho * (derivs[0, 0] + derivs[1, 1])
    r_e = (c.c_p * adv[3] - adv[2] / (rho + c.eps_rho) + c.latent_heat * adv[4])

    dp, dq = adv[2], adv[4]
    q_s = jax.lax.stop_gradient(saturation_specific_humidity_packed(p, T))
    q_s = jnp.maximum(q_s, 1e-6)
    delta = jax.lax.stop_gradient(
        jnp.where(jnp.logical_and(dp < 0, q >= q_s),
                  jnp.ones_like(dp), jnp.zeros_like(dp)))
    r_moist = (1.0 + 0.608 * q) * c.r_d
    f_fac = (c.latent_heat * r_moist - c.c_p * c.r_v * T) / (
        c.c_p * c.r_v + T * T + c.latent_heat**2 * q_s)
    f_fac = jax.lax.stop_gradient(f_fac * q_s * T)
    r_q = -dp * delta * f_fac / (p + c.eps_rho) + dq

    r_g = p - rho * (1.0 + 0.608 * q) * c.r_d * T

    def mse(r):
        r32 = r.astype(jnp.float32)
        return jnp.mean(r32 * r32)

    losses = {
        "montion_u_loss": mse(r_u) * loss_factor["motion_u_factor"],
        "montion_v_loss": mse(r_v) * loss_factor["motion_v_factor"],
        "continous_loss": mse(r_c) * loss_factor["continuous_factor"],
        "energy_loss": mse(r_e) * loss_factor["energy_factor"],
        "vapor_loss": mse(r_q) * loss_factor["vapor_factor"],
        "gas_loss": mse(r_g) * loss_factor["gas_factor"],
    }
    losses["total"] = (
        losses["montion_u_loss"] + losses["montion_v_loss"] + losses["energy_loss"]
        + losses["continous_loss"] + losses["vapor_loss"] + losses["gas_loss"]
    )
    return losses


def saturation_specific_humidity_packed(p: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Tetens formula on row vectors (same math as equations.py)."""
    t = T - 273.15
    e_s = 6.112 * jnp.exp(17.67 * t / (t + 243.5)) * 100.0
    return 0.622 * e_s / (p - 0.378 * e_s)


def packed_residual_losses_from_primal_tangents(
    primal: jnp.ndarray,
    tang: jnp.ndarray,
    coriolis_f: jnp.ndarray,
    obs_specs,
    loss_factor: Dict[str, float],
    with_clip: bool = True,
    constants: PhysicalConstants = DEFAULT_CONSTANTS,
) -> Dict[str, jnp.ndarray]:
    """Fused vectorized assembly: (primal, tang) -> per-equation losses."""
    fields, derivs = packed_physical_from_primal_tangents(
        primal, tang, obs_specs, with_clip)
    return residual_losses_packed(fields, derivs, coriolis_f, loss_factor, constants)


def packed_residual_losses_from_primal_tangents_t(
    primal_t: jnp.ndarray,  # [6, N] var-major
    tang_t: jnp.ndarray,  # [3, 6, N] var-major
    coriolis_f: jnp.ndarray,
    obs_specs,
    loss_factor: Dict[str, float],
    with_clip: bool = True,
    constants: PhysicalConstants = DEFAULT_CONSTANTS,
) -> Dict[str, jnp.ndarray]:
    """Var-major twin: consumes the v4t kernel's layout with zero transposes."""
    fields, derivs = packed_physical_from_primal_tangents_t(
        primal_t, tang_t, obs_specs, with_clip)
    return residual_losses_packed(fields, derivs, coriolis_f, loss_factor, constants)


def fused_kernel_fields_t(
    model,
    params,
    tokens: jnp.ndarray,  # [T, D]
    coords: jnp.ndarray,  # [N, 3] physical
    coord_data: jnp.ndarray,  # [N, 6] normalized conditioning values
    fore_h: jnp.ndarray,  # [1]
    coord_spec,
    interpret: bool = False,
    version: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Var-major trainable decode: ``(primal_t [6, N], tang_t [3, 6, N])``.

    The layout twin of ``fused_kernel_fields(trainable=True, raw_tangents=
    True, version=4)``: the custom-vjp pair runs the [6, N]-output Pallas
    kernels so the packed residual assembly and the (elementwise) data loss
    consume kernel outputs directly — no lane-padded [N, 6] buffer on the
    grad path (docs/PERF.md round 4 (e)).  The only [N, 6]-layout op left is
    the forward-only transpose of the stop-gradient'd conditioning values.

    ``version=7`` selects the dpe-free v4s kernel pair: the channel-major
    trig operand feeds primal AND tangent layer-1 matmuls (PE derivative
    folded into the per-window weights, fuse_v6_from_v4), deleting the dpe
    prep + input stream at identical MXU cost (docs/PERF.md round 5).
    """
    from deepphysinet_tpu.ops.decode_kernel import (
        fuse_decode_weights, fuse_v6_from_v4, fused_decode_jvp_v4s_kbwd,
        fused_decode_jvp_v4t_kbwd)

    if version == 7:
        weights, pe_cm, cd_pe = _kernel_inputs_s(
            model, params, tokens, coords, coord_data, fore_h, coord_spec)
        ref_t = jax.lax.stop_gradient(coord_data).T
        fw6 = fuse_v6_from_v4(fuse_decode_weights(weights), coord_spec)
        return fused_decode_jvp_v4s_kbwd(fw6, pe_cm, cd_pe, ref_t, 256,
                                         model.compute_dtype, interpret)
    weights, pe, dpe, cd_pe = _kernel_inputs(
        model, params, tokens, coords, coord_data, fore_h, coord_spec)
    ref_t = jax.lax.stop_gradient(coord_data).T
    fw = fuse_decode_weights(weights)
    return fused_decode_jvp_v4t_kbwd(fw, pe, dpe, cd_pe, ref_t, 256,
                                     model.compute_dtype, interpret)


def _kernel_inputs(model, params, tokens, coords, coord_data, fore_h, coord_spec):
    # pe/dpe/cd_pe only ever feed compute-dtype matmuls in the kernels and
    # their XLA twins, so the prep emits compute_dtype directly: the cast
    # fuses into the single flat sin() pass instead of costing a separate
    # relayout of the lane-padded f32 form (docs/PERF.md round 4 (j))
    from deepphysinet_tpu.ops.decode_kernel import extract_decode_weights, pe_and_tangents
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe_flat

    weights = extract_decode_weights(model, params, tokens, fore_h)
    pe, dpe = pe_and_tangents(coords, coord_spec, dtype=model.compute_dtype)
    in_ch = model.net_cfg["in_channels"]
    cd_freqs = make_freq_bands(in_ch // 2 // 6, max_freq=4.0)
    cd_pe = sinecos_pe_flat(coord_data, cd_freqs, dtype=model.compute_dtype)
    return weights, pe, dpe, cd_pe


def _kernel_inputs_s(model, params, tokens, coords, coord_data, fore_h, coord_spec):
    """v4s (dpe-free) kernel inputs: channel-major trig operand + cd PE."""
    from deepphysinet_tpu.ops.decode_kernel import extract_decode_weights, trig_cm_inputs
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe_flat

    weights = extract_decode_weights(model, params, tokens, fore_h)
    pe_cm = trig_cm_inputs(coords, coord_spec, dtype=model.compute_dtype)
    in_ch = model.net_cfg["in_channels"]
    cd_freqs = make_freq_bands(in_ch // 2 // 6, max_freq=4.0)
    cd_pe = sinecos_pe_flat(coord_data, cd_freqs, dtype=model.compute_dtype)
    return weights, pe_cm, cd_pe


def fused_kernel_fields(
    model,
    params,
    tokens: jnp.ndarray,  # [T, D]
    coords: jnp.ndarray,  # [N, 3] physical
    coord_data: jnp.ndarray,  # [N, 6] normalized conditioning values
    fore_h: jnp.ndarray,  # [1]
    coord_spec,
    obs_specs,
    with_clip: bool = True,
    interpret: bool = False,
    trainable: bool = False,
    version: int = 4,
    in_kernel_pe: bool = False,
    raw_tangents: bool = False,
) -> Tuple[jnp.ndarray, FieldDerivatives]:
    """``(primal_norm [N, 6], FieldDerivatives)`` via the fused Pallas kernel.

    With ``raw_tangents=True`` the normalized ``tang [3, N, 6]`` is returned
    instead of the assembled FieldDerivatives (for the packed vectorized
    assembly path, ``packed_residual_losses_from_primal_tangents``).

    The normalized primal is returned alongside the physical fields so the
    training step can reuse it as the data-loss prediction instead of paying
    a second full decode of the margin points (same contract as
    ``jvp_fields``).  ``trainable=True`` routes through the custom-VJP wrapper
    so the result can sit inside a differentiated training loss (Pallas
    forward + fused Pallas backward); otherwise the plain eval kernel runs.
    ``version=4`` (default) uses the collapsed-algebra kernel
    (ops/decode_kernel.py:FusedDecodeWeights, ~2.3x fewer MXU FLOPs);
    ``version=2`` keeps the round-1 kernel.
    """
    from deepphysinet_tpu.ops.decode_kernel import (
        extract_decode_weights, fuse_decode_weights, fuse_v6_from_v4,
        fused_decode_jvp, fused_decode_jvp_trainable, fused_decode_jvp_v4,
        fused_decode_jvp_v4_kbwd, fused_decode_jvp_v4pe,
        fused_decode_jvp_v6, fused_decode_jvp_v6_kbwd, trig3_inputs)

    if version == 7:
        # v4s is a var-major kernel-IO variant (fused_kernel_fields_t); on
        # this [N, 6]-layout path a shared kernel_version=7 config value
        # means "the v4 algebra" -- same dispatch rule as jvp_fields
        version = 4
    if version == 6:
        # v6: the PE derivative is folded into the per-window weight prep
        # (fuse_v6_from_v4), so the only per-point prep is the trig blocks --
        # no dpe array, half the point-stream input traffic (docs/PERF.md
        # round 3 (l)).  Same math as v4.
        from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe

        weights = extract_decode_weights(model, params, tokens, fore_h)
        trig = trig3_inputs(coords, coord_spec)
        in_ch = model.net_cfg["in_channels"]
        cd_freqs = make_freq_bands(in_ch // 2 // 6, max_freq=4.0)
        cd_pe = sinecos_pe(coord_data, cd_freqs, include_input=False)
        coord_data = jax.lax.stop_gradient(coord_data)
        fw6 = fuse_v6_from_v4(fuse_decode_weights(weights), coord_spec)
        if trainable:
            primal, tang = fused_decode_jvp_v6_kbwd(
                fw6, trig, cd_pe, coord_data, 256, model.compute_dtype,
                interpret)
        else:
            primal, tang = fused_decode_jvp_v6(
                fw6, trig, cd_pe, coord_data, interpret=interpret,
                compute_dtype=model.compute_dtype)
        if raw_tangents:
            return primal, tang
        return primal, fields_from_primal_tangents(primal, tang, obs_specs, with_clip)

    if in_kernel_pe and version == 4 and not trainable:
        # v4pe: raw coordinates in, PE on the VPU inside the kernel -- no XLA
        # prep pipeline at all (eval/inference path; see docs/PERF.md for the
        # measured comparison)
        weights = extract_decode_weights(model, params, tokens, fore_h)
        coord_data = jax.lax.stop_gradient(coord_data)
        fw = fuse_decode_weights(weights)
        primal, tang = fused_decode_jvp_v4pe(
            fw, coords, coord_data, coord_spec, interpret=interpret,
            compute_dtype=model.compute_dtype)
        if raw_tangents:
            return primal, tang
        return primal, fields_from_primal_tangents(primal, tang, obs_specs, with_clip)

    weights, pe, dpe, cd_pe = _kernel_inputs(
        model, params, tokens, coords, coord_data, fore_h, coord_spec)
    coord_data = jax.lax.stop_gradient(coord_data)
    # pe/dpe/cd_pe are functions of data only (coords + stop-gradient'd
    # conditioning), so the kbwd op's zero input-cotangent contract holds
    if version == 4:
        fw = fuse_decode_weights(weights)
        if trainable:
            primal, tang = fused_decode_jvp_v4_kbwd(
                fw, pe, dpe, cd_pe, coord_data, 256, model.compute_dtype,
                interpret)
        else:
            primal, tang = fused_decode_jvp_v4(fw, pe, dpe, cd_pe, coord_data,
                                               interpret=interpret,
                                               compute_dtype=model.compute_dtype)
    elif trainable:
        primal, tang = fused_decode_jvp_trainable(
            weights, pe, dpe, cd_pe, coord_data, 512, model.compute_dtype)
    else:
        primal, tang = fused_decode_jvp(weights, pe, dpe, cd_pe, coord_data,
                                        interpret=interpret,
                                        compute_dtype=model.compute_dtype)
    if raw_tangents:
        return primal, tang
    return primal, fields_from_primal_tangents(primal, tang, obs_specs, with_clip)


def jvp_fields(
    model,
    params,
    tokens: jnp.ndarray,  # [T, D]
    coords: jnp.ndarray,  # [N, 3] physical
    coord_data: jnp.ndarray,  # [N, 6] normalized conditioning values
    fore_h: jnp.ndarray,  # [1]
    coord_spec,
    obs_specs,
    with_clip: bool = True,
    version: int = 4,
    raw_tangents: bool = False,
) -> Tuple[jnp.ndarray, FieldDerivatives]:
    """Pure-XLA analytic-tangent fields via the collapsed v4 algebra.

    Returns ``(primal_norm [N, 6], FieldDerivatives)``: the normalized primal
    doubles as the data-loss prediction, so margin points are decoded once for
    both losses.  Fully differentiable (no custom VJP) -- this is the
    ``pde_engine='jvp'`` training path: same forward-mode math as
    jax.linearize over the model decode, but with the analytic PE tangents
    and the f2/c collapse, so XLA sees ~2.3x fewer matmul FLOPs.
    ``version=6`` uses the trig-input formulation (PE derivative folded into
    the weight prep -- no dpe array; same math).  ``version=7`` (the v4s
    Pallas variant) is a kernel-IO layout choice with no meaning for this
    pure-XLA path -- it is accepted and treated as 4 so a shared
    ``kernel_version`` config value works across engines.
    """
    from deepphysinet_tpu.ops.decode_kernel import (
        decode_jvp_xla_v4, decode_jvp_xla_v6, fuse_decode_weights,
        fuse_v6_from_v4, trig3_inputs)

    if version == 7:
        version = 4
    if version == 6:
        from deepphysinet_tpu.ops.decode_kernel import extract_decode_weights
        from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe

        weights = extract_decode_weights(model, params, tokens, fore_h)
        trig = trig3_inputs(coords, coord_spec)
        in_ch = model.net_cfg["in_channels"]
        cd_freqs = make_freq_bands(in_ch // 2 // 6, max_freq=4.0)
        cd_pe = sinecos_pe(coord_data, cd_freqs, include_input=False)
        coord_data = jax.lax.stop_gradient(coord_data)
        fw6 = fuse_v6_from_v4(fuse_decode_weights(weights), coord_spec)
        primal, tang = decode_jvp_xla_v6(fw6, trig, cd_pe, coord_data,
                                         model.compute_dtype)
        if raw_tangents:
            return primal, tang
        return primal, fields_from_primal_tangents(primal, tang, obs_specs, with_clip)

    weights, pe, dpe, cd_pe = _kernel_inputs(
        model, params, tokens, coords, coord_data, fore_h, coord_spec)
    coord_data = jax.lax.stop_gradient(coord_data)
    fw = fuse_decode_weights(weights)
    primal, tang = decode_jvp_xla_v4(fw, pe, dpe, cd_pe, coord_data,
                                     model.compute_dtype)
    if raw_tangents:
        return primal, tang
    return primal, fields_from_primal_tangents(primal, tang, obs_specs, with_clip)


def collapsed_decode(
    model,
    params,
    tokens: jnp.ndarray,  # [T, D]
    coords: jnp.ndarray,  # [N, 3] physical
    coord_data: jnp.ndarray,  # [N, 6] normalized conditioning values
    fore_h: jnp.ndarray,  # [1]
    coord_spec,
) -> jnp.ndarray:
    """Normalized primal decode [N, 6] via the collapsed v4 algebra.

    Identical function (and gradients) to ``PhysicsNet.decode`` at ~2.3x
    fewer matmul FLOPs -- the pure-decode hot path for inference sweeps and
    the full-grid RMSE scan (0.97 vs 1.21 ms per 37K-point frame on v5e).
    Forward-only by policy: training's data-only branch keeps the plain
    decode because this path's VJP measured slower (docs/PERF.md negative
    results).  The tangent prep inside ``_kernel_inputs`` is unused here and
    dead-code-eliminated by XLA under jit."""
    from deepphysinet_tpu.ops.decode_kernel import (
        decode_xla_v4_primal, fuse_decode_weights)

    weights, pe, _dpe, cd_pe = _kernel_inputs(
        model, params, tokens, coords, coord_data, fore_h, coord_spec)
    fw = fuse_decode_weights(weights)
    return decode_xla_v4_primal(fw, pe, cd_pe, coord_data, model.compute_dtype)


def collapsed_decode_t(
    model,
    params,
    tokens: jnp.ndarray,  # [T, D]
    coords: jnp.ndarray,  # [N, 3] physical
    coord_data: jnp.ndarray,  # [N, 6] normalized conditioning values
    fore_h: jnp.ndarray,  # [1]
    coord_spec,
    use_kernel: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Var-major primal decode [6, N]: ``collapsed_decode`` with row output.

    Same collapsed v4 algebra; by default the XLA var-major twin
    (``decode_xla_v4t_primal``) -- measured IDENTICAL to the [N, 6] XLA form
    on TPU (0.900 vs 0.900 ms per 37265-pt grid frame) while handing the
    inference sweeps (predict_grid/predict_points) and the full-grid RMSE
    scan full lane-major rows with no minor-dim-6 buffer.  The primal-only
    Pallas kernel (``decode_primal_v4t``, ``use_kernel=True``) is a measured
    NEGATIVE for this forward-only op -- 1.131 ms @ block 512 / 1.192 @ 1024
    / VMEM-OOM @ 2048 (docs/PERF.md round 4 (k)): at ~2 MFLOP/pt with no
    tangent reuse there is nothing for manual blocking to win back, and XLA
    schedules the 6 small per-variable matmuls better.  Kept selectable and
    parity-tested.  Forward-only by policy like ``collapsed_decode``."""
    from deepphysinet_tpu.ops.decode_kernel import (
        decode_primal_v4t, decode_xla_v4t_primal, fuse_decode_weights)
    weights, pe, _dpe, cd_pe = _kernel_inputs(
        model, params, tokens, coords, coord_data, fore_h, coord_spec)
    fw = fuse_decode_weights(weights)
    ref_t = jax.lax.stop_gradient(coord_data).T
    if use_kernel:
        return decode_primal_v4t(fw, pe, cd_pe, ref_t, interpret=interpret,
                                 compute_dtype=model.compute_dtype)
    return decode_xla_v4t_primal(fw, pe, cd_pe, ref_t, model.compute_dtype)


# Round-3 measured a crossover at 49152 points where the in-kernel residual
# assembly (ops/residual_kernel.py) overtook the split path: the split's
# [3, N, 6] tangent round-trip is 21x lane-padded in HBM, which made it fall
# off past ~49K.  The var-major (v4t) split path's [3, 6, N] tangents are
# sublane-padded only (1.33x), and the round-4 re-sweep shows it beating the
# in-kernel assembly at EVERY point count (20.3-20.8M vs 17.6-18.0M evals/s,
# flat 24K..131K -- scripts/perf_assembly_crossover_v4t.py, docs/PERF.md
# round 4 (i)), so v4 never dispatches to the in-kernel assembly anymore.
# Non-v4 versions keep the old crossover (their split path is still [N, 6]).
FUSED_ASSEMBLY_MIN_N = 49152


def fused_residual_losses(
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
    version: int = 4,
) -> Dict[str, jnp.ndarray]:
    """Forward-only residual losses via the fused Pallas path (MSE criterion).

    Auto-dispatches between the split decode-kernel + XLA assembly and the
    in-kernel residual assembly (ops/residual_kernel.py) at the measured
    point-count crossover.  Not differentiable w.r.t. params (eval/bench
    path); training uses the custom-VJP kernel pair through train_step.
    """
    if version == 7:
        # v4s split path: dpe-free var-major kernel + packed [6, N] assembly
        # (docs/PERF.md round 5)
        from deepphysinet_tpu.ops.decode_kernel import (
            fuse_decode_weights, fuse_v6_from_v4, fused_decode_jvp_v4s)

        weights, pe_cm, cd_pe = _kernel_inputs_s(
            model, params, tokens, coords, coord_data, fore_h, coord_spec)
        ref_t = jax.lax.stop_gradient(coord_data).T
        fw6 = fuse_v6_from_v4(fuse_decode_weights(weights), coord_spec)
        primal_t, tang_t = fused_decode_jvp_v4s(
            fw6, pe_cm, cd_pe, ref_t, interpret=interpret,
            compute_dtype=model.compute_dtype)
        return packed_residual_losses_from_primal_tangents_t(
            primal_t, tang_t, coriolis_f, obs_specs, loss_factor,
            with_clip=with_clip, constants=constants)
    if version != 4 and coords.shape[0] >= FUSED_ASSEMBLY_MIN_N:
        from deepphysinet_tpu.ops.residual_kernel import kernel_residual_losses

        return kernel_residual_losses(
            model, params, tokens, coords, coord_data, fore_h, coriolis_f,
            coord_spec, obs_specs, loss_factor, with_clip=with_clip,
            constants=constants, interpret=interpret, version=version)
    if version == 4:
        # var-major split path: the v4t kernel writes each variable's
        # lane-major row straight to its [6, N] sublane slot (no in-kernel
        # lane->sublane relayout) and the packed assembly consumes that
        # layout directly -- 20.86M vs 18.07M evals/s at the 40960-pt bench
        # shape, and faster than the in-kernel assembly at every N
        # (docs/PERF.md round 4 (g)/(i), scripts/perf_varmajor_ab.py,
        # scripts/perf_assembly_crossover_v4t.py)
        from deepphysinet_tpu.ops.decode_kernel import (
            fuse_decode_weights, fused_decode_jvp_v4t)

        weights, pe, dpe, cd_pe = _kernel_inputs(
            model, params, tokens, coords, coord_data, fore_h, coord_spec)
        ref_t = jax.lax.stop_gradient(coord_data).T
        primal_t, tang_t = fused_decode_jvp_v4t(
            fuse_decode_weights(weights), pe, dpe, cd_pe, ref_t,
            interpret=interpret, compute_dtype=model.compute_dtype)
        return packed_residual_losses_from_primal_tangents_t(
            primal_t, tang_t, coriolis_f, obs_specs, loss_factor,
            with_clip=with_clip, constants=constants)
    _, fd = fused_kernel_fields(model, params, tokens, coords, coord_data,
                                fore_h, coord_spec, obs_specs,
                                with_clip=with_clip, interpret=interpret,
                                version=version)
    return residual_losses_from_fields(fd, coriolis_f, loss_factor, constants)


def pde_residual_losses(
    phys_fn: Callable[[jnp.ndarray], jnp.ndarray],
    coords: jnp.ndarray,  # [N, 3] physical (x m, y m, t s)
    coriolis_f: jnp.ndarray,  # [N, 1]
    loss_factor: Dict[str, float],
    constants: PhysicalConstants = DEFAULT_CONSTANTS,
    criterion: Optional[Callable] = None,
) -> Dict[str, jnp.ndarray]:
    """All six equation losses for one collocation batch.

    Mirrors place_one_batch (interface_physics.py:271-320): each residual is
    evaluated against its balance term with the configured pde criterion
    (MSE by default) and scaled by the configured factor
    (configs/DeepPhysiNet_NCEP_cfg.py:139-148).  Returns per-equation losses
    plus their sum under ``"total"``.
    """
    fd = linearized_fields(phys_fn, coords)
    return residual_losses_from_fields(fd, coriolis_f, loss_factor, constants, criterion)

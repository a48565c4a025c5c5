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
from typing import Callable, Dict, Tuple

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
) -> Dict[str, jnp.ndarray]:
    """Assemble the six equation losses from already-computed fields/derivs."""
    fields, derivs = fd.fields, fd.derivs
    losses = {}
    diff, const = eqs.momentum_u_residual(fields, derivs, coriolis_f, constants)
    losses["montion_u_loss"] = _mse(diff, const) * loss_factor["motion_u_factor"]
    diff, const = eqs.momentum_v_residual(fields, derivs, coriolis_f, constants)
    losses["montion_v_loss"] = _mse(diff, const) * loss_factor["motion_v_factor"]
    diff, const = eqs.continuity_residual(fields, derivs, constants)
    losses["continous_loss"] = _mse(diff, const) * loss_factor["continuous_factor"]
    diff, const = eqs.energy_residual(fields, derivs, constants)
    losses["energy_loss"] = _mse(diff, const) * loss_factor["energy_factor"]
    diff, const = eqs.vapor_residual(fields, derivs, constants)
    losses["vapor_loss"] = _mse(diff, const) * loss_factor["vapor_factor"]
    diff, const = eqs.gas_residual(fields, constants)
    losses["gas_loss"] = _mse(diff, const) * loss_factor["gas_factor"]
    losses["total"] = (
        losses["montion_u_loss"] + losses["montion_v_loss"] + losses["energy_loss"]
        + losses["continous_loss"] + losses["vapor_loss"] + losses["gas_loss"]
    )
    return losses


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
) -> FieldDerivatives:
    """Fields + derivatives via the fused Pallas decode kernel (eval path).

    The kernel returns normalized-unit primal and d/d(physical) tangents; the
    inverse-normalization chain rule (d phys = std * d norm for mean_norm) and
    the clip's zero-gradient-outside-bounds masking are applied here, so the
    result matches the jax.linearize path bit-for-bit in structure.
    """
    from deepphysinet_tpu.ops.decode_kernel import (
        extract_decode_weights, fused_decode_jvp, pe_and_tangents)
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe
    from deepphysinet_tpu.ops.normalization import inverse_normalize

    weights = extract_decode_weights(model, params, tokens, fore_h)
    pe, dpe = pe_and_tangents(coords, coord_spec)
    in_ch = model.net_cfg["in_channels"]
    cd_freqs = make_freq_bands(in_ch // 2 // 6, max_freq=4.0)
    cd_pe = sinecos_pe(coord_data, cd_freqs, include_input=False)
    primal, tang = fused_decode_jvp(weights, pe, dpe, cd_pe, coord_data,
                                    interpret=interpret,
                                    compute_dtype=model.compute_dtype)

    clipped = (False, False, True, True, True, True)  # u, v never clip
    fields, derivs = {}, {}
    for i, key in enumerate(FIELD_KEYS):
        spec = obs_specs[i]
        p_norm = primal[:, i : i + 1]
        clip = with_clip and clipped[i] and spec.bound is not None
        p_phys = inverse_normalize(p_norm, spec, with_clip=clip)
        # mean_norm chain rule; zero tangent where the clip is active
        std = jnp.asarray(spec.norm_factor[1], jnp.float32)
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


def pde_residual_losses(
    phys_fn: Callable[[jnp.ndarray], jnp.ndarray],
    coords: jnp.ndarray,  # [N, 3] physical (x m, y m, t s)
    coriolis_f: jnp.ndarray,  # [N, 1]
    loss_factor: Dict[str, float],
    constants: PhysicalConstants = DEFAULT_CONSTANTS,
) -> Dict[str, jnp.ndarray]:
    """All six equation losses for one collocation batch.

    Mirrors place_one_batch (interface_physics.py:271-320): each residual is an
    MSE against its balance term, scaled by the configured factor
    (configs/DeepPhysiNet_NCEP_cfg.py:139-148).  Returns per-equation losses
    plus their sum under ``"total"``.
    """
    fd = linearized_fields(phys_fn, coords)
    return residual_losses_from_fields(fd, coriolis_f, loss_factor, constants)

"""Atmospheric primitive-equation residuals as pure functions of fields + derivatives.

Each function maps already-computed physical-unit fields (u, v, P, T, q, rho)
and their space-time derivatives to the (diff_term, const_term) pair of one
governing equation, matching the reference formulas line by line:

* u momentum:  u_t + u u_x + v u_y + P_x/rho   = f v      (interface_physics.py:97-104)
* v momentum:  v_t + u v_x + v v_y + P_y/rho   = -f u     (:106-114)
* continuity:  rho_t + u rho_x + v rho_y + rho (u_x+v_y) = 0  (:116-124)
* energy:      c_p DT/Dt - (1/(rho+eps)) Dp/Dt + L Dq/Dt = 0  (:126-144)
* vapor:       Dq/Dt - delta F / (p+eps) Dp/Dt = 0, with q_s (Tetens), delta and
               F held out of the gradient (stop_gradient), matching the
               reference's .detach() calls (:146-175, :181-185)
* gas/state:   P = rho (1 + 0.608 q) R_d T               (:177-179)

Derivatives arrive from the forward-mode engine (physics/engine.py); the
reference instead issues 19 reverse-mode ``torch.autograd.grad`` calls per
batch (:90-95).  Residual assembly is always float32.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from deepphysinet_tpu.physics.constants import DEFAULT_CONSTANTS, PhysicalConstants

Pair = Tuple[jnp.ndarray, jnp.ndarray]


def momentum_u_residual(fields, derivs, f, const: PhysicalConstants = DEFAULT_CONSTANTS) -> Pair:
    u, v, p, rho = fields["u"], fields["v"], fields["p"], fields["rio"]
    diff = derivs["u"]["t"] + u * derivs["u"]["x"] + v * derivs["u"]["y"] + derivs["p"]["x"] / rho
    return diff, f * v


def momentum_v_residual(fields, derivs, f, const: PhysicalConstants = DEFAULT_CONSTANTS) -> Pair:
    u, v, p, rho = fields["u"], fields["v"], fields["p"], fields["rio"]
    diff = derivs["v"]["t"] + u * derivs["v"]["x"] + v * derivs["v"]["y"] + derivs["p"]["y"] / rho
    return diff, -f * u


def continuity_residual(fields, derivs, const: PhysicalConstants = DEFAULT_CONSTANTS) -> Pair:
    u, v, rho = fields["u"], fields["v"], fields["rio"]
    d = derivs
    diff = (
        d["rio"]["t"]
        + u * d["rio"]["x"]
        + v * d["rio"]["y"]
        + rho * d["u"]["x"]
        + rho * d["v"]["y"]
    )
    return diff, jnp.zeros_like(diff)


def energy_residual(fields, derivs, const: PhysicalConstants = DEFAULT_CONSTANTS) -> Pair:
    u, v, rho = fields["u"], fields["v"], fields["rio"]
    d = derivs
    t_term = const.c_p * (d["T"]["t"] + u * d["T"]["x"] + v * d["T"]["y"])
    p_term = -(d["p"]["t"] + u * d["p"]["x"] + v * d["p"]["y"]) / (rho + const.eps_rho)
    q_term = const.latent_heat * (d["q"]["t"] + u * d["q"]["x"] + v * d["q"]["y"])
    diff = t_term + p_term + q_term
    return diff, jnp.zeros_like(diff)


def saturation_specific_humidity(p: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Tetens formula, matching get_qs (interface_physics.py:181-185)."""
    t = T - 273.15
    e_s = 6.112 * jnp.exp(17.67 * t / (t + 243.5)) * 100.0
    return 0.622 * e_s / (p - 0.378 * e_s)


def vapor_residual(fields, derivs, const: PhysicalConstants = DEFAULT_CONSTANTS) -> Pair:
    u, v, p, T, q = fields["u"], fields["v"], fields["p"], fields["T"], fields["q"]
    d = derivs
    dp = d["p"]["t"] + u * d["p"]["x"] + v * d["p"]["y"]
    dq = d["q"]["t"] + u * d["q"]["x"] + v * d["q"]["y"]

    q_s = jax.lax.stop_gradient(saturation_specific_humidity(p, T))
    q_s = jnp.maximum(q_s, 1e-6)
    # delta = 1 where the parcel is ascending-saturated (interface_physics.py:147-149).
    delta = jax.lax.stop_gradient(
        jnp.where(jnp.logical_and(dp < 0, q >= q_s), jnp.ones_like(dp), jnp.zeros_like(dp))
    )
    # F factor (interface_physics.py:151-155); faithfully ported as written.
    r_moist = (1.0 + 0.608 * q) * const.r_d
    f_fac = (const.latent_heat * r_moist - const.c_p * const.r_v * T) / (
        const.c_p * const.r_v + T * T + const.latent_heat**2 * q_s
    )
    f_fac = jax.lax.stop_gradient(f_fac * q_s * T)

    p_term = -dp * delta * f_fac / (p + const.eps_rho)
    diff = p_term + dq
    return diff, jnp.zeros_like(diff)


def gas_residual(fields, const: PhysicalConstants = DEFAULT_CONSTANTS) -> Pair:
    p, T, q, rho = fields["p"], fields["T"], fields["q"], fields["rio"]
    return p, rho * (1.0 + 0.608 * q) * const.r_d * T


def air_density(p: jnp.ndarray, T: jnp.ndarray, q: jnp.ndarray, r_d: float = 287.0) -> jnp.ndarray:
    """rho from the equation of state -- NOTE: matches calc_rio
    (interface_physics.py:265-268) exactly, including its inverted form."""
    return jax.lax.stop_gradient((1.0 + 0.608 * q) * r_d * T / p)

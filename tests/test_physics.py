"""PDE residual engine tests against analytic fields with closed-form derivatives.

These replace the reference's nonexistent test suite (SURVEY section 4): the
forward-mode engine must reproduce hand-computed residuals, and physically
balanced fields must yield (near-)zero residuals.
"""

import numpy as np
import jax
import jax.numpy as jnp

from deepphysinet_tpu.physics.engine import linearized_fields, pde_residual_losses
from deepphysinet_tpu.physics.equations import saturation_specific_humidity
from deepphysinet_tpu.physics.constants import DEFAULT_CONSTANTS

FACTORS = dict(
    margin_factor=1e6, motion_u_factor=1.0, motion_v_factor=1.0,
    continuous_factor=1.0, energy_factor=1.0, vapor_factor=1.0, gas_factor=1.0,
)


def _analytic_fn(coeffs):
    """fields = A @ [x, y, t, 1]; linear in space-time -> exact derivatives."""

    def fn(coords):  # [N, 3]
        ext = jnp.concatenate([coords, jnp.ones((coords.shape[0], 1))], axis=-1)
        return ext @ coeffs.T  # [N, 6]

    return fn


def test_linearized_fields_match_closed_form(rng):
    coeffs = jnp.array(rng.randn(6, 4), jnp.float32)
    fn = _analytic_fn(coeffs)
    coords = jnp.array(rng.randn(32, 3), jnp.float32)
    fd = linearized_fields(fn, coords)
    for i, key in enumerate(("u", "v", "p", "T", "q", "rio")):
        np.testing.assert_allclose(np.asarray(fd.derivs[key]["x"][:, 0]),
                                   np.full(32, float(coeffs[i, 0])), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(fd.derivs[key]["y"][:, 0]),
                                   np.full(32, float(coeffs[i, 1])), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(fd.derivs[key]["t"][:, 0]),
                                   np.full(32, float(coeffs[i, 2])), rtol=1e-5)


def test_geostrophic_balance_zeroes_momentum(rng):
    """Constant wind + linear pressure in exact geostrophic balance ->
    both momentum residual losses vanish; unbalanced pressure does not."""
    f0 = 1e-4
    rho0 = 1.2
    u0, v0 = 5.0, -3.0
    # u_t = u_x = u_y = 0; residual_u = p_x / rho = f*v  ->  p_x = rho*f0*v0
    coeffs = np.zeros((6, 4), np.float32)
    coeffs[0, 3] = u0
    coeffs[1, 3] = v0
    coeffs[2, 0] = rho0 * f0 * v0  # p_x
    coeffs[2, 1] = -rho0 * f0 * u0  # p_y
    coeffs[2, 3] = 1e5
    coeffs[3, 3] = 288.0
    coeffs[4, 3] = 0.005
    coeffs[5, 3] = rho0
    fn = _analytic_fn(jnp.array(coeffs))
    coords = jnp.array(rng.rand(64, 3) * 1000, jnp.float32)
    f = jnp.full((64, 1), f0)
    losses = pde_residual_losses(fn, coords, f, FACTORS)
    assert float(losses["montion_u_loss"]) < 1e-8
    assert float(losses["montion_v_loss"]) < 1e-8
    # continuity: all derivatives zero for constant rho and constant wind
    assert float(losses["continous_loss"]) < 1e-8

    # unbalance the pressure gradient -> nonzero residual
    coeffs[2, 0] *= 2.0
    losses2 = pde_residual_losses(_analytic_fn(jnp.array(coeffs)), coords, f, FACTORS)
    assert float(losses2["montion_u_loss"]) > 1e-10


def test_gas_law_residual():
    const = DEFAULT_CONSTANTS
    rho0, T0, q0 = 1.1, 290.0, 0.004
    p0 = rho0 * (1 + 0.608 * q0) * const.r_d * T0
    coeffs = np.zeros((6, 4), np.float32)
    coeffs[2, 3] = p0
    coeffs[3, 3] = T0
    coeffs[4, 3] = q0
    coeffs[5, 3] = rho0
    coords = jnp.zeros((8, 3))
    losses = pde_residual_losses(_analytic_fn(jnp.array(coeffs)), coords,
                                 jnp.zeros((8, 1)), FACTORS)
    assert float(losses["gas_loss"]) < 1e-4  # p0 ~ 1e5, relative error ~1e-5


def test_continuity_advection_balance(rng):
    """rho(x) linear, u chosen so u*rho_x + rho*u_x = -rho_t ... simple case:
    steady constant wind with linear density field advected: residual =
    u*rho_x + rho*0 + rho_t; choose rho_t = -u0*rho_x -> zero."""
    u0 = 7.0
    rho_x = 0.001
    coeffs = np.zeros((6, 4), np.float32)
    coeffs[0, 3] = u0
    coeffs[5, 0] = rho_x
    coeffs[5, 2] = -u0 * rho_x  # rho_t
    coeffs[5, 3] = 1.0
    coords = jnp.array(rng.rand(32, 3) * 100, jnp.float32)
    losses = pde_residual_losses(_analytic_fn(jnp.array(coeffs)), coords,
                                 jnp.zeros((32, 1)), FACTORS)
    assert float(losses["continous_loss"]) < 1e-8


def test_energy_equation_closed_form(rng):
    """Check the energy residual value against a hand computation."""
    const = DEFAULT_CONSTANTS
    coeffs = np.array(rng.randn(6, 4), np.float32) * 0.01
    coeffs[2, 3] = 9e4  # p offset
    coeffs[3, 3] = 280.0
    coeffs[5, 3] = 1.1
    fn = _analytic_fn(jnp.array(coeffs))
    coords = jnp.array(rng.randn(16, 3), jnp.float32)
    losses = pde_residual_losses(fn, coords, jnp.zeros((16, 1)), FACTORS)

    ext = np.concatenate([np.asarray(coords), np.ones((16, 1))], -1)
    fields = ext @ coeffs.T
    u, v = fields[:, 0], fields[:, 1]
    rho = fields[:, 5]
    DT = coeffs[3, 2] + u * coeffs[3, 0] + v * coeffs[3, 1]
    Dp = coeffs[2, 2] + u * coeffs[2, 0] + v * coeffs[2, 1]
    Dq = coeffs[4, 2] + u * coeffs[4, 0] + v * coeffs[4, 1]
    resid = const.c_p * DT - Dp / (rho + const.eps_rho) + const.latent_heat * Dq
    np.testing.assert_allclose(float(losses["energy_loss"]), np.mean(resid**2), rtol=1e-3)


def test_saturation_specific_humidity_values():
    # ~288K at sea level: q_s around 10 g/kg
    qs = float(saturation_specific_humidity(jnp.array(101325.0), jnp.array(288.15)))
    assert 0.009 < qs < 0.012


def test_stop_gradient_in_vapor_term(rng):
    """The vapor residual's q_s/delta/F must not contribute parameter gradients
    (matching the reference's .detach() at interface_physics.py:165-169)."""

    def loss_of_scale(s):
        def fn(coords):
            base = jnp.concatenate(
                [5.0 + 0 * coords[:, :1], 1.0 + 0 * coords[:, :1],
                 9e4 + coords[:, :1] * s, 290.0 + 0.001 * coords[:, 1:2] * s,
                 0.01 + 1e-6 * coords[:, 2:3], 1.1 + 0 * coords[:, :1]],
                axis=-1,
            )
            return base

        coords = jnp.array(rng.rand(8, 3) * 10, jnp.float32)
        losses = pde_residual_losses(fn, coords, jnp.zeros((8, 1)), FACTORS)
        return losses["vapor_loss"]

    g = jax.grad(loss_of_scale)(1.0)
    assert np.isfinite(float(g))

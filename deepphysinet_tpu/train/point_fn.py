"""The differentiable point function: physical coords -> physical fields.

This is the object the PDE engine linearizes.  It bundles, for one window:
coordinate encoding (interface_physics.py:322-332), the hypernet decode, and
inverse normalization to physical units (interface_physics.py:256-261 -- u, v
are never clipped; P, T, q, rho clip to their bounds when ``with_clip``).

The interpolated-NWP conditioning values (``coord_data``) are treated as
constants under differentiation, matching the reference where they are
precomputed dataloader outputs with no graph attached: derivatives of the
model's ``+ ref_data`` residual head contribute zero, exactly as
``torch.autograd.grad`` sees it.  When conditioning values are produced by the
on-device interpolator instead, a ``stop_gradient`` preserves these semantics
(set ``differentiate_ref=True`` to include the piecewise-linear interpolant's
derivative -- a documented divergence, off by default).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.ops.coords import CoordSpec, encode_coord
from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, NormSpec, inverse_normalize

# obs_norm_cfg keys in output-column order (interface_physics.py:256-261).
_CLIPPED = (False, False, True, True, True, True)  # u, v never clip


def inverse_norm_stack(
    out_norm: jnp.ndarray,  # [N, 6] normalized model outputs
    obs_specs: Sequence[NormSpec],  # in OBS_NAME_ORDER
    with_clip: bool,
) -> jnp.ndarray:
    cols = []
    for i, spec in enumerate(obs_specs):
        clip = with_clip and _CLIPPED[i]
        cols.append(inverse_normalize(out_norm[:, i : i + 1], spec, with_clip=clip))
    return jnp.concatenate(cols, axis=-1)


def inverse_norm_stack_t(
    out_norm_t: jnp.ndarray,  # [6, N] var-major normalized model outputs
    obs_specs: Sequence[NormSpec],  # in OBS_NAME_ORDER
    with_clip: bool,
) -> jnp.ndarray:
    """Var-major twin of ``inverse_norm_stack``: [6, N] in, [6, N] physical out.

    Consumes the var-major decode kernel's layout directly (each variable is
    a full lane-major row), so the forward-only inference/eval paths never
    materialize a lane-padded minor-dim-6 buffer.  Same per-variable math
    (mean_norm inverse + torch.clip semantics, u/v never clipped)."""
    rows = []
    for i, spec in enumerate(obs_specs):
        clip = with_clip and _CLIPPED[i]
        # inverse_normalize is elementwise with scalar factors, so it applies
        # to a [1, N] row exactly as it does to an [N, 1] column
        rows.append(inverse_normalize(out_norm_t[i : i + 1, :], spec,
                                      with_clip=clip))
    return jnp.concatenate(rows, axis=0)


def make_phys_fn(
    model: PhysicsNet,
    params,
    tokens: jnp.ndarray,  # [T, D] one window
    coord_data: jnp.ndarray,  # [N, 6] conditioning values at the points
    fore_h: jnp.ndarray,  # [1] normalized lead
    coord_spec: CoordSpec,
    obs_specs: Sequence[NormSpec],
    with_clip: bool = True,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build ``phys_fn([N, 3] physical xyt) -> [N, 6] physical fields``."""
    coord_data = jax.lax.stop_gradient(coord_data)

    def phys_fn(coords: jnp.ndarray) -> jnp.ndarray:
        pe = encode_coord(coords[:, 0], coords[:, 1], coords[:, 2], coord_spec)
        out_norm = model.apply(params, tokens, pe, coord_data, fore_h, method=PhysicsNet.decode)
        return inverse_norm_stack(out_norm, obs_specs, with_clip)

    return phys_fn

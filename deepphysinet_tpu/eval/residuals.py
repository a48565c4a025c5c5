"""Physics-consistency diagnostics: PDE residual magnitudes of a checkpoint.

The training objective balances data fit against the six primitive-equation
residuals (reference interface_physics.py:271-320); this module measures how
well a trained model actually satisfies the physics AFTER training — the
paper's physics-consistency check, which the reference repo never implemented
as a tool (its only residual numbers are the TensorBoard loss curves).

Two surfaces:

* ``evaluate_residuals`` — per-equation mean-squared residuals (raw physical
  units AND training-weighted) over the full label grid at every labeled
  hour, swept with an on-device lax.scan like the full-grid RMSE evaluator
  (eval/rmse.py::evaluate_rmse_fullgrid); one [6] fetch per window.
* ``residual_field_maps`` — per-point squared-residual fields [H, W] for one
  window/hour, for rendering spatial maps of where the physics breaks.

On TPU the point sweep runs through the fused Pallas residual path
(engine.fused_residual_losses: the in-kernel assembly above its measured
crossover); off-TPU it uses the analytic-tangent XLA twin (jvp_fields) —
same math, parity-tested in tests/test_residual_kernel.py.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepphysinet_tpu.models.physics_net import PhysicsNet

EQ_NAMES = ("momentum_u", "momentum_v", "continuity", "energy", "vapor", "gas")
_LOSS_KEYS = ("montion_u_loss", "montion_v_loss", "continous_loss",
              "energy_loss", "vapor_loss", "gas_loss")
_FACTOR_KEYS = ("motion_u_factor", "motion_v_factor", "continuous_factor",
                "energy_factor", "vapor_factor", "gas_factor")
_UNIT_FACTORS = {k: 1.0 for k in _FACTOR_KEYS}


def _residual_mses(model, params, tokens, coords, nwp, fore_h, f, cfg,
                   use_kernel: bool, interpret: bool = False) -> jnp.ndarray:
    """Raw per-equation MSE [6] at the given points (unit loss factors)."""
    if use_kernel:
        from deepphysinet_tpu.physics.engine import fused_residual_losses

        losses = fused_residual_losses(
            model, params, tokens, coords, nwp, fore_h, f,
            cfg.coord_spec, cfg.obs_specs, _UNIT_FACTORS, with_clip=True,
            interpret=interpret)
    else:
        from deepphysinet_tpu.physics.engine import (
            jvp_fields, residual_losses_from_fields)

        _, fd = jvp_fields(model, params, tokens, coords, nwp, fore_h,
                           cfg.coord_spec, cfg.obs_specs, with_clip=True)
        losses = residual_losses_from_fields(fd, f, _UNIT_FACTORS)
    return jnp.stack([losses[k] for k in _LOSS_KEYS])


def _grid_geometry(dataset):
    H, W = dataset.label_lat_size, dataset.label_lon_size
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    xf, yf = xs.reshape(-1), ys.reshape(-1)
    lon = dataset.begin_lon + xf * float(dataset.out_lon[1] - dataset.out_lon[0])
    lat = dataset.begin_lat + yf * float(dataset.out_lat[1] - dataset.out_lat[0])
    return H, W, xf, yf, lon, lat


def evaluate_residuals(
    model: PhysicsNet,
    params,
    cfg,  # StepConfig
    dataset,
    max_windows: Optional[int] = None,
    use_kernel: Optional[bool] = None,
    interpret: bool = False,
) -> Dict[str, float]:
    """Mean per-equation squared residuals over held-out windows.

    Returns ``residual_mse_<eq>`` (raw physical-unit MSE), ``weighted_<eq>``
    (scaled by the training loss factors, comparable to logged training
    metrics) and ``weighted_total``.
    """
    from deepphysinet_tpu.ops.coords import coriolis
    from deepphysinet_tpu.ops.interp import trilinear_interp_cube

    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    H, W, xf, yf, lon, lat = _grid_geometry(dataset)
    x_m = jnp.asarray(xf * dataset.dx, jnp.float32)
    y_m = jnp.asarray(yf * dataset.dy, jnp.float32)
    lon_d = jnp.asarray(lon, jnp.float32)
    f = coriolis(jnp.asarray(lat, jnp.float32))  # [N, 1]
    lts = int(dataset.label_time_step)
    window_h = dataset.input_time_step * dataset.input_time_step_nums
    n_hours = window_h // lts + 1
    in_lon0, in_dlon = float(dataset.in_lon[0]), float(dataset.in_lon[1] - dataset.in_lon[0])
    in_lat0, in_dlat = float(dataset.in_lat[0]), float(dataset.in_lat[1] - dataset.in_lat[0])
    in_dt = float(dataset.input_time_step)
    lat_d = jnp.asarray(lat, jnp.float32)

    @jax.jit
    def run_window(params, field, fh_norm, cube6):
        tokens = model.apply(params, field, fh_norm[None, :],
                             method=PhysicsNet.encode)

        def body(acc, t_hour):
            nwp = trilinear_interp_cube(
                cube6, lon_d, lat_d, jnp.full_like(lon_d, t_hour),
                lon0=in_lon0, dlon=in_dlon, lat0=in_lat0, dlat=in_dlat,
                t0=0.0, dt=in_dt,
            ).T  # [H*W, 6]
            coords = jnp.stack(
                [x_m, y_m, jnp.full_like(x_m, 3600.0) * t_hour], axis=-1)
            mses = _residual_mses(model, params, tokens[0], coords, nwp,
                                  fh_norm, f, cfg, use_kernel, interpret)
            return acc + mses, None

        t_hours = jnp.arange(n_hours, dtype=jnp.float32) * lts
        acc, _ = jax.lax.scan(body, jnp.zeros(6), t_hours)
        return acc / n_hours

    sums = np.zeros(6, np.float64)
    n_windows = len(dataset) if max_windows is None else min(max_windows, len(dataset))
    for w in range(n_windows):
        input_file = dataset.input_files[w]
        field = jnp.asarray(np.concatenate(
            [dataset.get_item_input(input_file), dataset.constant_variables],
            axis=0)[None], jnp.float32)
        _, _, forecast_h, _ = dataset._parse_item(input_file)
        fh_norm = jnp.asarray([forecast_h / dataset.forecast_time_period],
                              jnp.float32)
        cube6 = dataset._nwp_cube(input_file)
        sums += np.asarray(jax.device_get(run_window(
            params, field, fh_norm, jnp.asarray(cube6, jnp.float32))),
            np.float64)  # one [6] fetch per window
    mean = sums / max(n_windows, 1)

    out = {f"residual_mse_{k}": float(mean[i]) for i, k in enumerate(EQ_NAMES)}
    weighted_total = 0.0
    for i, (k, fk) in enumerate(zip(EQ_NAMES, _FACTOR_KEYS)):
        wv = float(mean[i]) * float(cfg.loss_factor[fk])
        out[f"weighted_{k}"] = wv
        weighted_total += wv
    out["weighted_total"] = weighted_total
    out["n_points_per_hour"] = float(H * W)
    out["n_hours"] = float(n_hours)
    out["n_windows"] = float(n_windows)
    return out


def residual_field_maps(
    model: PhysicsNet,
    params,
    cfg,  # StepConfig
    dataset,
    window: int = 0,
    hour: int = 0,
    use_kernel: Optional[bool] = None,
) -> Dict[str, np.ndarray]:
    """Squared-residual field [H, W] per equation at one window/hour.

    Always goes through the fields path (the per-point diffs are the output,
    so the sum-only fused assembly does not apply); on TPU the decode runs
    the fused decode+jvp kernel, off-TPU the analytic XLA twin.
    """
    from deepphysinet_tpu.ops.coords import coriolis
    from deepphysinet_tpu.ops.interp import trilinear_interp_cube
    from deepphysinet_tpu.physics import equations as eqs
    from deepphysinet_tpu.physics.engine import fused_kernel_fields, jvp_fields

    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    H, W, xf, yf, lon, lat = _grid_geometry(dataset)
    in_lon0, in_dlon = float(dataset.in_lon[0]), float(dataset.in_lon[1] - dataset.in_lon[0])
    in_lat0, in_dlat = float(dataset.in_lat[0]), float(dataset.in_lat[1] - dataset.in_lat[0])
    in_dt = float(dataset.input_time_step)

    input_file = dataset.input_files[window]
    field = jnp.asarray(np.concatenate(
        [dataset.get_item_input(input_file), dataset.constant_variables],
        axis=0)[None], jnp.float32)
    _, _, forecast_h, _ = dataset._parse_item(input_file)
    fh_norm = jnp.asarray([forecast_h / dataset.forecast_time_period], jnp.float32)
    cube6 = jnp.asarray(dataset._nwp_cube(input_file), jnp.float32)

    @jax.jit
    def run(params, field, fh_norm, cube6):
        tokens = model.apply(params, field, fh_norm[None, :],
                             method=PhysicsNet.encode)
        lon_d = jnp.asarray(lon, jnp.float32)
        lat_d = jnp.asarray(lat, jnp.float32)
        nwp = trilinear_interp_cube(
            cube6, lon_d, lat_d, jnp.full_like(lon_d, float(hour)),
            lon0=in_lon0, dlon=in_dlon, lat0=in_lat0, dlat=in_dlat,
            t0=0.0, dt=in_dt).T
        coords = jnp.stack([
            jnp.asarray(xf * dataset.dx, jnp.float32),
            jnp.asarray(yf * dataset.dy, jnp.float32),
            jnp.full((H * W,), hour * 3600.0, jnp.float32)], axis=-1)
        fields_fn = fused_kernel_fields if use_kernel else jvp_fields
        _, fd = fields_fn(model, params, tokens[0], coords, nwp, fh_norm,
                          cfg.coord_spec, cfg.obs_specs, with_clip=True)
        f = coriolis(jnp.asarray(lat, jnp.float32))
        pairs = (
            eqs.momentum_u_residual(fd.fields, fd.derivs, f),
            eqs.momentum_v_residual(fd.fields, fd.derivs, f),
            eqs.continuity_residual(fd.fields, fd.derivs),
            eqs.energy_residual(fd.fields, fd.derivs),
            eqs.vapor_residual(fd.fields, fd.derivs),
            eqs.gas_residual(fd.fields),
        )
        maps = [jnp.square(d - c)[:, 0].reshape(H, W) for d, c in pairs]
        return jnp.stack(maps)

    stacked = np.asarray(jax.device_get(run(params, field, fh_norm, cube6)))
    return {k: stacked[i] for i, k in enumerate(EQ_NAMES)}

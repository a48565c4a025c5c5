"""Off-lattice generalization evaluation on synthetic trees.

The product's headline claim is CONTINUOUS downscaling -- the hypernet MLP
can be queried at arbitrary coordinates and times, not just the label
lattice (reference README; the reference's station inference does exactly
this).  On real archives that claim is untestable without truth between
lattice points; the synthetic tree's truth (data/synthetic.py::_field) is a
closed-form function of (lon, lat, hours), computable ANYWHERE, so here we
can actually score it.

``evaluate_offlattice`` draws paired query sets per window:

* on-lattice:  integer fine-grid points at labeled whole hours (the training
  distribution);
* off-lattice: the SAME draws shifted by half a fine-grid cell in lon/lat
  (0.125 deg on the production 0.25 deg grid) and half a label time step
  (:30) -- maximally far from every training label.

Both sets are decoded on device through the production collapsed-v4 primal
(physics/engine.py::collapsed_decode, the same function behind
predict_points), compared in PHYSICAL units against the closed-form truth.
A model that merely interpolates its label lattice shows off/on RMSE ratios
far above 1; a model that learned the field shows ratios near 1.
"""

from __future__ import annotations

import datetime
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.train.point_fn import inverse_norm_stack

# decode output column order (u, v, P, T, q, rho) -> synthetic field names
SYNTH_NAMES = ("u10", "v10", "PSFC", "t2", "q2", "rio")
# metric keys, matching eval/rmse.py::VAR_NAMES
VAR_NAMES = ("u10", "v10", "pres", "t2", "q2", "rio")

_DATE_FMT = "%Y-%m-%d-%H-%M-%S"


def _truth_at(lon: np.ndarray, lat: np.ndarray, abs_hours: float,
              synth_seed: int) -> np.ndarray:
    """Closed-form synthetic truth [N, 6] (physical units) at one instant."""
    from deepphysinet_tpu.data.synthetic import _field

    cols = [
        _field(name, lon[:, None], lat[:, None], abs_hours, 1, synth_seed)[:, 0, 0]
        for name in SYNTH_NAMES
    ]
    return np.stack(cols, axis=-1)


def evaluate_offlattice(
    model: PhysicsNet,
    params,
    cfg,  # StepConfig
    dataset,
    n_points: int = 16384,
    times_per_window: int = 4,
    max_windows: Optional[int] = None,
    seed: int = 0,
    synth_start: str = "2008-01-01_00_00_00",
    synth_seed: int = 0,
) -> Dict[str, float]:
    """Paired on-lattice / off-lattice RMSE vs the closed-form truth.

    Only meaningful on synthetic trees (``synth_start``/``synth_seed`` must
    match the generator call that built ``dataset``'s files -- the defaults
    are ``ensure_synthetic_tree``'s defaults).  Returns
    ``rmse_<var>`` (off-lattice), ``rmse_<var>_ongrid`` (paired on-lattice),
    and ``ratio_<var>`` = off/on.
    """
    from deepphysinet_tpu.ops.interp import trilinear_interp_cube
    from deepphysinet_tpu.physics.engine import collapsed_decode

    H, W = dataset.label_lat_size, dataset.label_lon_size
    fine_lon = float(dataset.out_lon[1] - dataset.out_lon[0])
    fine_lat = float(dataset.out_lat[1] - dataset.out_lat[0])
    in_lon0, in_dlon = float(dataset.in_lon[0]), float(dataset.in_lon[1] - dataset.in_lon[0])
    in_lat0, in_dlat = float(dataset.in_lat[0]), float(dataset.in_lat[1] - dataset.in_lat[0])
    in_dt = float(dataset.input_time_step)
    lts = int(dataset.label_time_step)
    window_h = dataset.input_time_step * dataset.input_time_step_nums
    start_dt = datetime.datetime.strptime(synth_start, "%Y-%m-%d_%H_%M_%S")

    times_per_window = max(1, min(times_per_window, window_h // lts))
    n_per_t = max(1, n_points // times_per_window)
    rng = np.random.RandomState(seed)

    @jax.jit
    def run(params, field, fh_norm, cube6, x_m, y_m, t_sec, lon_d, lat_d, t_h):
        tokens = model.apply(params, field, fh_norm[None, :],
                             method=PhysicsNet.encode)
        nwp = trilinear_interp_cube(
            cube6, lon_d, lat_d, t_h,
            lon0=in_lon0, dlon=in_dlon, lat0=in_lat0, dlat=in_dlat,
            t0=0.0, dt=in_dt,
        ).T  # [N, 6]
        coords = jnp.stack([x_m, y_m, t_sec], axis=-1)
        out = collapsed_decode(model, params, tokens[0], coords, nwp,
                               fh_norm, cfg.coord_spec)
        return inverse_norm_stack(out, cfg.obs_specs, with_clip=True)

    sq = {"on": np.zeros(6, np.float64), "off": np.zeros(6, np.float64)}
    counts = {"on": 0, "off": 0}
    n_windows = len(dataset) if max_windows is None else min(max_windows, len(dataset))
    for w in range(n_windows):
        input_file = dataset.input_files[w]
        field = jnp.asarray(np.concatenate(
            [dataset.get_item_input(input_file), dataset.constant_variables],
            axis=0)[None], jnp.float32)
        _, date_str, forecast_h, _ = dataset._parse_item(input_file)
        init = datetime.datetime.strptime(date_str, _DATE_FMT)
        base_hours = ((init - start_dt).total_seconds() / 3600.0
                      + float(forecast_h))
        fh_norm = jnp.asarray([forecast_h / dataset.forecast_time_period],
                              jnp.float32)
        cube6 = jnp.asarray(dataset._nwp_cube(input_file), jnp.float32)

        # labeled whole hours with room for the +0.5*lts shift
        hour_slots = rng.choice(max(window_h // lts, 1),
                                size=times_per_window, replace=False)
        # dispatch every (slot, on/off) decode asynchronously and fetch the
        # whole window in ONE device_get: per-fetch tunnel cost varies by
        # day (CLAUDE.md), so 2*times_per_window blocking round trips per
        # window would dominate on bad days — same one-fetch-per-window
        # discipline as eval/rmse.py and eval/residuals.py.
        jobs = []  # (kind, lon, lat, t_h) paired with outs[i]
        outs = []
        for slot in hour_slots:
            # integer lattice draws, away from the +x/+y edges so the paired
            # half-cell shift stays inside the domain
            xs = rng.randint(0, W - 1, n_per_t).astype(np.float64)
            ys = rng.randint(0, H - 1, n_per_t).astype(np.float64)
            t0 = float(slot * lts)
            for kind, fx, fy, ft in (("on", 0.0, 0.0, 0.0),
                                     ("off", 0.5, 0.5, 0.5 * lts)):
                xq, yq = xs + fx, ys + fy
                t_h = t0 + ft
                lon = dataset.begin_lon + xq * fine_lon
                lat = dataset.begin_lat + yq * fine_lat
                outs.append(run(
                    params, field, fh_norm, cube6,
                    jnp.asarray(xq * dataset.dx, jnp.float32),
                    jnp.asarray(yq * dataset.dy, jnp.float32),
                    jnp.asarray(np.full(n_per_t, t_h * 3600.0), jnp.float32),
                    jnp.asarray(lon, jnp.float32),
                    jnp.asarray(lat, jnp.float32),
                    jnp.asarray(np.full(n_per_t, t_h), jnp.float32),
                ))
                jobs.append((kind, lon, lat, t_h))
        fetched = jax.device_get(outs)  # one transfer for the window
        for (kind, lon, lat, t_h), pred in zip(jobs, fetched):
            truth = _truth_at(lon, lat, base_hours + t_h, synth_seed)
            d = np.asarray(pred, np.float64) - truth
            sq[kind] += (d * d).sum(axis=0)
            counts[kind] += n_per_t

    out: Dict[str, float] = {}
    r_on = np.sqrt(sq["on"] / max(counts["on"], 1))
    r_off = np.sqrt(sq["off"] / max(counts["off"], 1))
    for i, k in enumerate(VAR_NAMES):
        out[f"rmse_{k}"] = float(r_off[i])
        out[f"rmse_{k}_ongrid"] = float(r_on[i])
        out[f"ratio_{k}"] = float(r_off[i] / max(r_on[i], 1e-30))
    out["n_points"] = float(counts["off"])
    return out

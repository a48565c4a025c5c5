"""ERA5-validation RMSE evaluation (T2m / U10 / V10 / PSFC / q2 / rho).

The driver's accuracy target is ERA5-val RMSE parity on the surface variables
(BASELINE.json).  This evaluator sweeps a held-out dataset's windows, decodes
the model at every labeled ERA5 grid point over the full window (all hours),
and accumulates per-variable RMSE in physical units.  Evaluation runs through
the same decode the trainer uses; one jit per window shape, one device fetch
per window.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.ops.coords import encode_coord
from deepphysinet_tpu.train.point_fn import inverse_norm_stack

VAR_NAMES = ("u10", "v10", "pres", "t2", "q2", "rio")


def evaluate_rmse(
    model: PhysicsNet,
    params,
    cfg,  # StepConfig
    dataset,
    max_windows: Optional[int] = None,
    points_per_window: int = 20480,
    seed: int = 0,
) -> Dict[str, float]:
    """Per-variable RMSE (physical units) + bias over held-out windows."""
    rng = np.random.RandomState(seed)
    sq_sum = np.zeros(6, np.float64)
    bias_sum = np.zeros(6, np.float64)
    count = 0
    n_windows = len(dataset) if max_windows is None else min(max_windows, len(dataset))

    @jax.jit
    def run_window(params, field, fh_norm, x, y, t, nwp):
        tokens = model.apply(params, field, fh_norm[None, :], method=PhysicsNet.encode)
        pe = encode_coord(x, y, t, cfg.coord_spec)
        out = model.apply(params, tokens[0], pe, nwp, fh_norm, method=PhysicsNet.decode)
        return inverse_norm_stack(out, cfg.obs_specs, with_clip=True)

    for w in range(n_windows):
        item = dataset[w]
        # re-draw the evaluation points deterministically per window
        n = min(points_per_window, len(item["margin_x"]))
        sel = rng.choice(len(item["margin_x"]), n, replace=False)
        field = jnp.asarray(item["field_data"][None], jnp.float32)
        fh_norm = jnp.asarray(
            [item["forecast_h"] / dataset.forecast_time_period], jnp.float32
        )
        pred = run_window(
            params, field, fh_norm,
            jnp.asarray(item["margin_x"][sel]), jnp.asarray(item["margin_y"][sel]),
            jnp.asarray(item["margin_t"][sel]), jnp.asarray(item["margin_input_data"][sel]),
        )
        label_phys = inverse_norm_stack(
            jnp.asarray(item["margin_data"][sel]), cfg.obs_specs, with_clip=True
        )
        d = np.asarray(jax.device_get(pred - label_phys), np.float64)  # one fetch
        sq_sum += (d**2).sum(axis=0)
        bias_sum += d.sum(axis=0)
        count += n

    rmse = np.sqrt(sq_sum / max(count, 1))
    bias = bias_sum / max(count, 1)
    out = {f"rmse_{k}": float(rmse[i]) for i, k in enumerate(VAR_NAMES)}
    out.update({f"bias_{k}": float(bias[i]) for i, k in enumerate(VAR_NAMES)})
    out["n_points"] = float(count)
    out["n_windows"] = float(n_windows)
    return out

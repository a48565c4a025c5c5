"""CLI: station-level point inference at arbitrary continuous coordinates.

  python tools/infer_stations.py --config_file configs/X.py \
      --stations stations.csv [--checkpoint PATH] [--out results.csv]

``stations.csv`` columns: name,lon,lat[,t_hours] (header required; t_hours
defaults to every label hour in the window).  The neural field answers
off-grid positions and fractional hours directly -- no interpolation of grid
products.  Output: one row per (station, window, hour) with the six surface
variables in physical units.
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

# DPN_PLATFORM=cpu forces the JAX backend (the axon sitecustomize pins
# JAX_PLATFORMS, so plain env vars cannot override it)
if os.environ.get("DPN_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["DPN_PLATFORM"])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--stations", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--out", type=str, default="stations_out.csv")
    parser.add_argument("--split", type=str, default="valid_data")
    parser.add_argument("--max_windows", type=int, default=1)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.data.dataset import PhysicsDataset
    from deepphysinet_tpu.inference.runner import predict_points
    from deepphysinet_tpu.interface.build import builder_models
    from deepphysinet_tpu.train import checkpoint as ckpt

    stations = []
    with open(args.stations) as fp:
        for row in csv.DictReader(fp):
            stations.append((row["name"], float(row["lon"]), float(row["lat"]),
                             float(row["t_hours"]) if row.get("t_hours") else None))
    if not stations:
        raise SystemExit("no stations in input csv")

    cfg = Config.fromfile(args.config_file)
    interface = builder_models(**cfg["config"])
    tc = interface.train_cfg
    interface.dx = float(tc["dx"])
    interface.dy = float(tc["dy"])
    ckpt_path = args.checkpoint or tc["checkpoints"]["checkpoints_path"]
    state_dict, _, _ = ckpt.load_model(ckpt_path, prefix="physics")
    if state_dict is None:
        raise SystemExit(f"no checkpoint at {ckpt_path}")
    params = jax.tree.map(jnp.asarray, state_dict["model"])

    dataset = PhysicsDataset(
        **tc[args.split], input_variable_cfg=interface.variable_cfg,
        out_variable_cfg=interface.obs_norm_cfg, dx=interface.dx, dy=interface.dy,
    )
    window_h = dataset.input_time_step * dataset.input_time_step_nums
    step_cfg = interface._step_cfg(float(window_h * 3600), dataset.forecast_time_period)

    rows = []
    for w in range(min(args.max_windows, len(dataset))):
        input_file = dataset.input_files[w]
        from deepphysinet_tpu.data.dataset import parse_input_filename
        from deepphysinet_tpu.utils import path_utils

        name = path_utils.get_filename(input_file, is_suffix=False)
        _, date_str, fh, _ = parse_input_filename(name)
        field = np.concatenate(
            [dataset.get_item_input(input_file), dataset.constant_variables], 0)[None]
        # expand stations x hours
        lons, lats, ts, names = [], [], [], []
        for sname, lon, lat, t in stations:
            hours = [t] if t is not None else list(range(0, window_h + 1))
            for h in hours:
                names.append(sname)
                lons.append(lon)
                lats.append(lat)
                ts.append(float(h))
        out = predict_points(
            interface.physics_net, params, step_cfg, dataset, input_file,
            jnp.asarray(field, jnp.float32), float(fh),
            np.asarray(lons), np.asarray(lats), np.asarray(ts),
        )
        for i in range(len(names)):
            rows.append({
                "station": names[i], "window": f"{date_str}_f{fh:03d}",
                "lon": lons[i], "lat": lats[i], "t_hours": ts[i],
                "u10": out[i, 0], "v10": out[i, 1], "psfc": out[i, 2],
                "t2": out[i, 3], "q2": out[i, 4], "rho": out[i, 5],
            })

    with open(args.out, "w", newline="") as fp:
        writer = csv.DictWriter(fp, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {len(rows)} rows to {args.out}")


if __name__ == "__main__":
    main()

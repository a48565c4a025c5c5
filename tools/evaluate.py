"""CLI: ERA5-validation RMSE of a trained checkpoint.

  python tools/evaluate.py --config_file configs/X.py [--checkpoint PATH]
                           [--max_windows N] [--split valid_data]

Prints a JSON dict of per-variable RMSE/bias in physical units.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# DPN_PLATFORM=cpu forces the JAX backend (the axon sitecustomize pins
# JAX_PLATFORMS, so plain env vars cannot override it)
if os.environ.get("DPN_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["DPN_PLATFORM"])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--max_windows", type=int, default=None)
    parser.add_argument("--split", type=str, default="valid_data",
                        choices=["train_data", "valid_data"])
    parser.add_argument("--points_per_window", type=int, default=20480)
    parser.add_argument("--full_grid", action="store_true",
                        help="exhaustive sweep: every labeled grid point at "
                             "every labeled hour (headline RMSE mode)")
    parser.add_argument("--per_lead", action="store_true",
                        help="with --full_grid: also report RMSE per absolute "
                             "forecast lead hour (rmse_<var>_f<lead> keys -- "
                             "the skill-vs-lead verification curve)")
    parser.add_argument("--off_lattice", action="store_true",
                        help="synthetic trees only: paired on/off-lattice "
                             "RMSE vs the closed-form truth (0.125-deg / "
                             ":30 offsets) -- the continuous-downscaling "
                             "generalization check")
    parser.add_argument("--synth_start", type=str, default="2008-01-01_00_00_00")
    parser.add_argument("--synth_seed", type=int, default=0)
    parser.add_argument("--residuals", action="store_true",
                        help="physics-consistency mode: per-equation PDE "
                             "residual MSEs over the full label grid instead "
                             "of RMSE vs labels")
    parser.add_argument("--save_maps", type=str, default=None, metavar="DIR",
                        help="with --residuals: also render per-equation "
                             "squared-residual maps (log10) for one window/"
                             "hour as jpgs into DIR")
    parser.add_argument("--map_window", type=int, default=0)
    parser.add_argument("--map_hour", type=int, default=0)
    args = parser.parse_args()

    import jax.numpy as jnp
    import jax

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.data.dataset import PhysicsDataset
    from deepphysinet_tpu.eval.rmse import evaluate_rmse, evaluate_rmse_fullgrid
    from deepphysinet_tpu.interface.build import builder_models
    from deepphysinet_tpu.train import checkpoint as ckpt

    cfg = Config.fromfile(args.config_file)
    interface = builder_models(**cfg["config"])
    tc = interface.train_cfg
    interface.dx = float(tc["dx"])
    interface.dy = float(tc["dy"])

    ckpt_path = args.checkpoint or tc["checkpoints"]["checkpoints_path"]
    state_dict, epoch, step = ckpt.load_checkpoint(
        ckpt_path, prefix="physics", backend=interface.ckpt_backend)
    if state_dict is None:
        raise SystemExit(f"no checkpoint at {ckpt_path}")
    params = jax.tree.map(jnp.asarray, state_dict["model"])

    dataset = PhysicsDataset(
        **tc[args.split], input_variable_cfg=interface.variable_cfg,
        out_variable_cfg=interface.obs_norm_cfg, dx=interface.dx, dy=interface.dy,
    )
    window_h = dataset.input_time_step * dataset.input_time_step_nums
    step_cfg = interface._step_cfg(float(window_h * 3600), dataset.forecast_time_period)

    if args.off_lattice:
        from deepphysinet_tpu.eval.offlattice import evaluate_offlattice

        metrics = evaluate_offlattice(
            interface.physics_net, params, step_cfg, dataset,
            max_windows=args.max_windows,
            n_points=args.points_per_window,
            synth_start=args.synth_start, synth_seed=args.synth_seed,
        )
    elif args.residuals:
        from deepphysinet_tpu.eval.residuals import evaluate_residuals

        metrics = evaluate_residuals(
            interface.physics_net, params, step_cfg, dataset,
            max_windows=args.max_windows,
        )
        if args.save_maps:
            import numpy as np

            from deepphysinet_tpu.eval.residuals import residual_field_maps
            from deepphysinet_tpu.utils.vis import VisUtils

            maps = residual_field_maps(
                interface.physics_net, params, step_cfg, dataset,
                window=args.map_window, hour=args.map_hour)
            vis_cfg = dict(tc["log"].get("vis_downscale_cfg", {}))
            vis_cfg.setdefault("landsea_file", os.path.join(
                dataset.constant_path, "landsea.tiff"))
            vis = VisUtils(**vis_cfg)
            for eq, m in maps.items():
                out = os.path.join(args.save_maps, f"residual_{eq}.jpg")
                # squared residuals span many decades -> log10 render
                vis.forward(np.log10(m + 1e-30), out,
                            title=f"log10 squared {eq} residual "
                                  f"(w{args.map_window} h{args.map_hour})")
            metrics["maps_dir"] = os.path.abspath(args.save_maps)
    elif args.full_grid:
        metrics = evaluate_rmse_fullgrid(
            interface.physics_net, params, step_cfg, dataset,
            max_windows=args.max_windows, per_lead=args.per_lead,
        )
    else:
        metrics = evaluate_rmse(
            interface.physics_net, params, step_cfg, dataset,
            max_windows=args.max_windows, points_per_window=args.points_per_window,
        )
    metrics["epoch"] = epoch - 1
    metrics["global_step"] = step
    print(json.dumps({k: round(v, 6) if isinstance(v, float) else v
                      for k, v in metrics.items()}))


if __name__ == "__main__":
    main()

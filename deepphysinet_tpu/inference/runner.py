"""Inference: continuous grid / point queries + product export.

A WORKING implementation of the reference's inference intent.  The reference's
``run_inference_interface`` is unfinished (calls the 4-argument forward with
one argument, interface_physics.py:1483; README flags inference as TODO --
SURVEY Q4); its clear intent (:1466-1527) is: load checkpoint + stored
metadata, loop hourly over [start_time, end_time], sweep the full (x, y)
output grid at each time, inverse-normalize, and export jpg renders and
GeoTIFF rasters per variable.

This module provides that, plus what the broken path was missing: the NWP
conditioning inputs, sourced through a PhysicsDataset over the inference
window files.  ``predict_points`` additionally serves station-style queries at
arbitrary continuous (lon, lat, t) -- the model is a neural field, so the
same decode answers any coordinate (continuous downscaling 1deg -> 0.25deg ->
arbitrary, 6h -> 1h -> arbitrary).
"""

from __future__ import annotations

import datetime
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.train.point_fn import inverse_norm_stack_t
from deepphysinet_tpu.train import checkpoint as ckpt

_VAR_KEYS = ("u", "v", "P", "T", "q", "rio")
_DATE_FMT = "%Y-%m-%d_%H_%M_%S"


from collections import OrderedDict

# jitted encode/decode per (model, step-config) -- inference calls these in a
# loop over frames/queries; unjitted flax applies dispatch op-by-op, which is
# ~1000x slower through the tunneled backend (measured 2.9 s/frame -> ms).
# LRU-bounded: each cached fn closes over (and so pins) its model, which keeps
# id(model) keys stable while cached but would leak every model ever used if
# the cache were unbounded.
_JIT_CACHE: "OrderedDict" = OrderedDict()
_JIT_CACHE_CAP = 8


def _cached_jit(kind, model, key_extra, build):
    key = (kind, id(model)) + key_extra
    fn = _JIT_CACHE.get(key)
    if fn is not None:
        _JIT_CACHE.move_to_end(key)
        return fn
    fn = jax.jit(build())
    _JIT_CACHE[key] = fn
    if len(_JIT_CACHE) > _JIT_CACHE_CAP:
        _JIT_CACHE.popitem(last=False)
    return fn


def _jitted_encode(model):
    def build():
        def fn(params, field, fh_norm):
            return model.apply(params, field, fh_norm, method=PhysicsNet.encode)
        return fn
    return _cached_jit("encode", model, (), build)


# Queries larger than this decode in fixed-size chunks: the decode pipeline's
# throughput peaks on a ~24K-49K-point plateau and falls off above ~50K when
# its XLA intermediates stop fitting in VMEM (docs/PERF.md batch-size curve).
# Fixed chunks also mean ONE remote compile serves any query size, instead of
# a fresh ~30 s tunnel compile per distinct N.
_DECODE_CHUNK = 40960
# Small (station-style) queries edge-pad up to one of these fixed bucket
# sizes (then trim), so sessions with varying point counts share at most a
# few compiled programs instead of paying a fresh ~30 s remote trace per
# distinct N.  Grid-sized queries above the largest bucket run at their
# exact shape: sweeps repeat the same N every frame, so they compile once
# anyway and padding would tax every frame's steady state.
_DECODE_BUCKETS = (256, 1024, 8192)


def _decode_points(model, params, cfg, tokens, x, y, t, nwp, fh_norm, with_clip,
                   chunk: int = _DECODE_CHUNK):
    """Physical fields at arbitrary points, VAR-MAJOR: returns [6, N].

    The decode runs the var-major primal path (collapsed v4 algebra, XLA
    var-major twin -- physics/engine.py:collapsed_decode_t) and the inverse
    normalization consumes its [6, N] rows directly, so no lane-padded
    [N, 6] buffer appears anywhere on the inference hot path."""
    def build():
        def fn(params, tokens, x, y, t, nwp, fh_arr):
            from deepphysinet_tpu.physics.engine import collapsed_decode_t

            coords = jnp.stack([x, y, t], axis=-1)
            out_t = collapsed_decode_t(model, params, tokens, coords, nwp,
                                       fh_arr, cfg.coord_spec)
            return inverse_norm_stack_t(out_t, cfg.obs_specs, with_clip=with_clip)
        return fn

    fn = _cached_jit("decode", model,
                     (cfg.coord_spec, cfg.obs_specs, bool(with_clip)), build)
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    t = np.asarray(t, np.float32)
    nwp = np.asarray(nwp, np.float32)
    fh_arr = jnp.asarray([fh_norm], jnp.float32)
    n = x.shape[0]
    if n == 0:
        return jnp.zeros((len(cfg.obs_specs), 0), jnp.float32)
    if n <= chunk:
        bucket = n  # grid-sized: exact shape (one compile per sweep size)
        for b in _DECODE_BUCKETS:
            if b <= chunk and n <= b:
                bucket = b
                break
        pad = bucket - n
        if pad:  # edge-pad to the bucket's compiled shape, trimmed below
            x = np.pad(x, (0, pad), mode="edge")
            y = np.pad(y, (0, pad), mode="edge")
            t = np.pad(t, (0, pad), mode="edge")
            nwp = np.pad(nwp, ((0, pad), (0, 0)), mode="edge")
        out = fn(params, tokens, jnp.asarray(x), jnp.asarray(y),
                 jnp.asarray(t), jnp.asarray(nwp), fh_arr)
        return out[:, :n]
    outs = []
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        pad = chunk - (e - s)
        xs, ys, ts, ns = x[s:e], y[s:e], t[s:e], nwp[s:e]
        if pad:  # last chunk: edge-pad to the compiled shape, trimmed below
            xs = np.pad(xs, (0, pad), mode="edge")
            ys = np.pad(ys, (0, pad), mode="edge")
            ts = np.pad(ts, (0, pad), mode="edge")
            ns = np.pad(ns, ((0, pad), (0, 0)), mode="edge")
        outs.append(fn(params, tokens, jnp.asarray(xs), jnp.asarray(ys),
                       jnp.asarray(ts), jnp.asarray(ns), fh_arr))
    return jnp.concatenate(outs, axis=1)[:, :n]


def predict_grid(
    model: PhysicsNet,
    params,
    cfg,
    dataset,
    input_file: str,
    field: jnp.ndarray,  # [1, L, enc_in]
    forecast_h: float,
    time_id_hours: float,
    with_clip: bool = True,
    out_size: Optional[tuple] = None,
) -> Dict[str, np.ndarray]:
    """Full output-grid sweep at one time offset -> {var: [lat, lon] physical}.

    Mirrors the vis path (interface_physics.py:538-591) and the intended
    inference sweep (:1466-1517).  ``out_size=(lat, lon)`` resamples the
    neural field over the same study area at a different output resolution
    (the model is continuous in (x, y), so any grid density is a valid
    query); default is the training grid.
    """
    lon_size = cfg.coord_spec.lon_size
    lat_size = cfg.coord_spec.lat_size
    if out_size is None:
        out_lat_n, out_lon_n = lat_size, lon_size
        x_ax = np.arange(lon_size, dtype=np.float64)
        y_ax = np.arange(lat_size, dtype=np.float64)
    else:
        out_lat_n, out_lon_n = int(out_size[0]), int(out_size[1])
        # linspace(0, n-1, n) is exact integers, so out_size == the training
        # grid reproduces the default path bitwise
        x_ax = np.linspace(0.0, lon_size - 1.0, out_lon_n)
        y_ax = np.linspace(0.0, lat_size - 1.0, out_lat_n)
    xs, ys = np.meshgrid(x_ax, y_ax)
    x_list = xs.reshape(-1)
    y_list = ys.reshape(-1)
    # float dtype: fractional time offsets must survive (continuous time axis)
    t_list = np.full(x_list.shape, float(time_id_hours), dtype=np.float64)

    px, py, pt, nwp, _f = dataset.get_margin_grid(input_file, x_list, y_list, t_list)
    fh_norm = forecast_h / cfg.forecast_time_period
    tokens = _jitted_encode(model)(
        params, field, jnp.asarray([[fh_norm]], jnp.float32)
    )
    phys = _decode_points(model, params, cfg, tokens[0], px, py, pt, nwp, fh_norm, with_clip)
    phys = np.asarray(jax.device_get(phys))  # one transfer

    out: Dict[str, np.ndarray] = {}
    for i, name in enumerate(_VAR_KEYS):
        # row-major meshgrid flattening: reshape IS the (y, x) scatter
        out[name] = phys[i].reshape(out_lat_n, out_lon_n).astype(np.float32)
    return out


def predict_points(
    model: PhysicsNet,
    params,
    cfg,
    dataset,
    input_file: str,
    field: jnp.ndarray,
    forecast_h: float,
    lon: np.ndarray,
    lat: np.ndarray,
    t_hours: np.ndarray,
    with_clip: bool = True,
) -> np.ndarray:
    """Continuous (station) queries -> [N, 6] physical values."""
    # degrees -> fractional fine-grid index -> model coords; the spacing is
    # the dataset's derived label-grid step (0.25 deg on the reference grid,
    # correct on any other resolution — same convention as eval/rmse.py and
    # the device path's fine_step)
    x = (np.asarray(lon) - dataset.begin_lon) / dataset.fine_lon_step * dataset.dx
    y = (np.asarray(lat) - dataset.begin_lat) / dataset.fine_lat_step * dataset.dy
    t = np.asarray(t_hours) * 3600.0
    cube6 = dataset._nwp_cube(input_file)
    nwp = dataset._interp_cube_at(cube6, np.asarray(lon), np.asarray(lat), np.asarray(t_hours))
    fh_norm = forecast_h / cfg.forecast_time_period
    tokens = _jitted_encode(model)(
        params, field, jnp.asarray([[fh_norm]], jnp.float32)
    )
    phys = _decode_points(model, params, cfg, tokens[0], x, y, t, nwp, fh_norm, with_clip)
    return np.asarray(jax.device_get(phys)).T  # host-side [6, N] -> [N, 6]


def run_inference(interface, **kwargs):
    """Checkpoint-driven hourly grid inference + export (intent of :1407-1527)."""
    from deepphysinet_tpu.data.dataset import PhysicsDataset
    from deepphysinet_tpu.data.geotiff import save_full_image
    from deepphysinet_tpu.utils.vis import VisUtils

    inf_cfg = dict(interface.inference_cfg)
    # inference_cfg.img_size selects the OUTPUT resolution: the neural field
    # resamples continuously over the study area, so any (lat, lon) density
    # is a valid sweep; omit (or match the training grid) for the default.
    img_size = inf_cfg.get("img_size")
    if img_size is None:
        out_size = None
    elif isinstance(img_size, (int, float)):
        out_size = (int(img_size), int(img_size))
    else:
        out_size = (int(img_size[0]), int(img_size[1]))

    dt = float(inf_cfg.get("dt", 3600))
    start_time = datetime.datetime.strptime(inf_cfg["start_time"], _DATE_FMT)
    end_time = datetime.datetime.strptime(inf_cfg["end_time"], _DATE_FMT)
    checkpoint_path = kwargs.get("checkpoint_path") or inf_cfg["checkpoints"]["checkpoints_path"]
    log_cfg = dict(inf_cfg.get("log", {}))
    with_vis = log_cfg.get("with_vis", False)
    vis_path = log_cfg.get("vis_path", "")
    write_source = log_cfg.get("write_source", False)
    export_variable = log_cfg.get("export_variable", ["T"])
    # reference exports at beijing time = ref_time + 6h (:1520); configurable here
    time_offset_h = float(log_cfg.get("time_offset_hours", 6))

    state_dict, current_epoch, global_step = ckpt.load_checkpoint(
        checkpoint_path, prefix="physics",
        backend=getattr(interface, "ckpt_backend", "pickle"))
    if state_dict is None:
        raise FileNotFoundError(checkpoint_path)
    print(f"resume from epoch {current_epoch} global_step {global_step}")
    params = jax.tree.map(jnp.asarray, state_dict["model"])

    interface.dx = ckpt.gather_key_from_state("dx", state_dict, float(interface.train_cfg.get("dx", 27000)))
    interface.dy = ckpt.gather_key_from_state("dy", state_dict, float(interface.train_cfg.get("dy", 27000)))
    pred_t_span = ckpt.gather_key_from_state("pred_t_span", state_dict, 86400.0)
    obs_norm_cfg = ckpt.gather_key_from_state("obs_norm_cfg", state_dict, interface.obs_norm_cfg)
    interface.obs_norm_cfg = obs_norm_cfg
    forecast_time_period = interface.train_cfg.get("train_data", {}).get("forecast_time_period", 360)
    cfg = interface._step_cfg(float(pred_t_span), forecast_time_period)

    data_cfg = inf_cfg.get("inference_data") or interface.train_cfg.get("valid_data")
    if data_cfg is None:
        raise ValueError("inference needs inference_cfg.inference_data (dataset cfg)")
    dataset = PhysicsDataset(
        **data_cfg, input_variable_cfg=interface.variable_cfg,
        out_variable_cfg=obs_norm_cfg, dx=interface.dx, dy=interface.dy,
    )
    if len(dataset) == 0:
        raise RuntimeError("no input windows found for inference period")

    vis_cfg = dict(log_cfg.get("vis_downscale_cfg", {}))
    vis_cfg.setdefault("landsea_file",
                       os.path.join(dataset.constant_path, "landsea.tiff"))
    vis_utils = VisUtils(**vis_cfg) if with_vis else None
    if (with_vis or write_source) and vis_path:
        # write_source rasters land in vis_path too; geotiff's writer does
        # not create directories
        os.makedirs(vis_path, exist_ok=True)

    window_h = dataset.input_time_step * dataset.input_time_step_nums
    results = []
    ref_time = start_time
    while ref_time <= end_time:
        # find a window whose [init+lead, +window_h] covers ref_time
        chosen = None
        for input_file in dataset.input_files:
            from deepphysinet_tpu.data.dataset import parse_input_filename
            from deepphysinet_tpu.utils import path_utils

            name = path_utils.get_filename(input_file, is_suffix=False)
            _, date_str, fh, _ = parse_input_filename(name)
            init = datetime.datetime.strptime(date_str, "%Y-%m-%d-%H-%M-%S")
            t0 = init + datetime.timedelta(hours=fh)
            off = (ref_time - t0).total_seconds() / 3600.0
            if 0 <= off <= window_h:
                chosen = (input_file, fh, off)
                break
        if chosen is None:
            ref_time += datetime.timedelta(seconds=dt)
            continue
        input_file, fh, off = chosen
        field = np.concatenate(
            [dataset.get_item_input(input_file), dataset.constant_variables], axis=0
        )[None]
        grids = predict_grid(
            interface.physics_net, params, cfg, dataset, input_file,
            jnp.asarray(field, jnp.float32), float(fh), off, with_clip=True,
            out_size=out_size,
        )
        out_time = ref_time + datetime.timedelta(hours=time_offset_h)
        stamp = out_time.strftime(_DATE_FMT)
        for variable_name in export_variable:
            key = {"U": "u", "V": "v", "P": "P", "T": "T", "Q": "q", "RIO": "rio"}[
                variable_name.upper()
            ]
            img = grids[key]
            if with_vis and vis_utils is not None:
                vis_utils.forward(img, os.path.join(vis_path, f"{stamp}_{variable_name}_vis.jpg"))
            if write_source:
                # grids are south-up (row 0 = begin_lat); flip to the standard
                # north-up GeoTIFF orientation with a matching geo-transform.
                # Pixel sizes come from the respective axes (lon != lat
                # spacing on non-square grids); an img_size resample rescales
                # them by the model-grid/output-grid ratio.
                h, w = img.shape
                step_x = float(dataset.fine_lon_step) * \
                    (cfg.coord_spec.lon_size - 1) / max(w - 1, 1)
                step_y = float(dataset.fine_lat_step) * \
                    (cfg.coord_spec.lat_size - 1) / max(h - 1, 1)
                geo = (dataset.begin_lon, step_x, 0.0,
                       dataset.begin_lat + step_y * (h - 1), 0.0, -step_y)
                save_full_image(os.path.join(vis_path, f"{stamp}_{variable_name}.tiff"),
                                img[::-1], geo_transform=geo,
                                projection="EPSG:4326",  # lat/lon study grid
                                compression="deflate", tiled=True)
        results.append((ref_time, grids))
        ref_time += datetime.timedelta(seconds=dt)
    return results

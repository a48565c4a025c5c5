"""Locate the device-sampling e2e fps gap (soak: 72-88 fps vs bench 204/s).

Breakdown, median-of-5 slopes on the real chip, fullscale synthetic dims:
  1. device-sampling step alone (fixed key)      -> its true device cost
  2. + jax.random.split per step                 -> per-step tiny-dispatch tax
  3. + PrefetchLoader iteration + cube cache     -> host pipeline tax

Run ALONE on an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_device_loop.py
"""

import statistics
import time


def median_slope(timed, reps: int = 5, k1: int = 10, k2: int = 110) -> float:
    timed(20)
    return statistics.median(
        (timed(k2) - timed(k1)) / (k2 - k1) for _ in range(reps))


def main() -> None:
    import os

    os.environ.setdefault("DPN_FULLSYNTH_DATA", "/tmp/dpn_fullsynth_data")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.data.dataset import PhysicsDataset
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.train.device_sampling import (
        CubeBatch, SamplerConfig, make_device_sampling_train_step)
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import StepConfig, create_train_state, Batch, PointBatch

    print(f"backend: {jax.default_backend()}", flush=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(os.path.join(here, "configs", "synthetic_fullscale_cfg.py")).config
    tc = cfg["train_cfg"]
    ds = PhysicsDataset(**tc["train_data"], input_variable_cfg=cfg["variable_cfg"],
                        out_variable_cfg=cfg["obs_norm_cfg"],
                        dx=float(tc["dx"]), dy=float(tc["dy"]))
    meta = {k: v for k, v in cfg["meta_cfg"].items() if k != "name"}
    net = {k: v for k, v in cfg["net_cfg"].items() if k != "name"}
    model = PhysicsNet(meta_cfg=meta, net_cfg=net, compute_dtype=jnp.bfloat16)
    specs = norm_specs_from_cfg(cfg["obs_norm_cfg"])
    lat_size, lon_size = cfg["train_cfg"]["img_size"]
    window_h = ds.input_time_step * ds.input_time_step_nums
    step_cfg = StepConfig(
        coord_spec=CoordSpec(lon_size=lon_size, lat_size=lat_size, dx=ds.dx,
                             dy=ds.dy, pred_t_span=float(window_h * 3600)),
        obs_specs=tuple(specs[k] for k in OBS_NAME_ORDER),
        loss_factor=dict(cfg["train_cfg"]["losses"]["loss_factor"]),
        pde_engine="kernel",
    )
    scfg = SamplerConfig(
        n_margin=ds.label_batch_size, n_inter=ds.inter_batch_size,
        window_h=window_h, input_time_step=ds.input_time_step,
        label_time_step=int(ds.label_time_step), begin_lat=ds.begin_lat,
        begin_lon=ds.begin_lon,
        fine_step=float(ds.out_lon[1] - ds.out_lon[0]),
        coarse_step=float(ds.in_lon[1] - ds.in_lon[0]),
    )
    tx = build_optimizer("Adam", lr=1e-4, weight_decay=1e-4)
    step = make_device_sampling_train_step(model, tx, step_cfg, scfg)

    item = ds.get_cube_item(0)
    cube = CubeBatch(
        field=jnp.asarray(np.asarray(item["field_data"], np.float32)[None]),
        forecast_h=jnp.asarray(np.asarray(item["forecast_h"], np.float32).reshape(-1)),
        nwp_cube=jnp.asarray(np.asarray(item["nwp_cube"], np.float32)[None]),
        label_cube=jnp.asarray(np.asarray(item["label_cube"], np.float32)[None]),
    )
    rng = np.random.RandomState(0)
    n_m, n_i = ds.label_batch_size, ds.inter_batch_size
    sample_batch = Batch(
        field=cube.field, forecast_h=cube.forecast_h,
        margin=PointBatch(
            x=jnp.zeros((1, n_m)), y=jnp.zeros((1, n_m)), t=jnp.zeros((1, n_m)),
            f=jnp.zeros((1, n_m, 1)), nwp=jnp.zeros((1, n_m, 6)),
            labels=jnp.zeros((1, n_m, 6))),
        inter=PointBatch(
            x=jnp.zeros((1, n_i)), y=jnp.zeros((1, n_i)), t=jnp.zeros((1, n_i)),
            f=jnp.zeros((1, n_i, 1)), nwp=jnp.zeros((1, n_i, 6)),
            labels=jnp.zeros((1, n_i, 6))),
    )
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample_batch)
    key0 = jax.random.PRNGKey(1)

    # 1. step alone, fixed key
    st = jax.tree.map(lambda x: x.copy(), state)
    st, m = step(st, cube, key0, True)
    _ = float(m["total_loss"])

    def timed1(k):
        nonlocal st
        t0 = time.monotonic()
        for _ in range(k):
            st, m = step(st, cube, key0, True)
        _ = float(m["total_loss"])
        return time.monotonic() - t0

    s1 = median_slope(timed1)
    print(f"1. ds step alone: {s1*1e3:.3f} ms ({1/s1:.1f} fps)", flush=True)

    # 2. + split per step
    st = jax.tree.map(lambda x: x.copy(), state)
    st, m = step(st, cube, key0, True)
    key = key0

    def timed2(k):
        nonlocal st, key
        t0 = time.monotonic()
        for _ in range(k):
            key, sub = jax.random.split(key)
            st, m = step(st, cube, sub, True)
        _ = float(m["total_loss"])
        return time.monotonic() - t0

    s2 = median_slope(timed2)
    print(f"2. + split/step: {s2*1e3:.3f} ms ({1/s2:.1f} fps)", flush=True)

    # 3. + loader + device cube cache (the real loop body, no logging)
    from collections import OrderedDict

    from deepphysinet_tpu.data.pipeline import PrefetchLoader

    class _CubeView:
        def __init__(self, d):
            self.ds = d

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            return self.ds.get_cube_item(i)

    cache: OrderedDict = OrderedDict()

    def to_device_cube(data):
        k_ = tuple(data["input_file"])
        if k_ in cache:
            cache.move_to_end(k_)
            return cache[k_]
        c = CubeBatch(
            field=jnp.asarray(np.asarray(data["field_data"], np.float32)),
            forecast_h=jnp.asarray(np.asarray(data["forecast_h"], np.float32).reshape(-1)),
            nwp_cube=jnp.asarray(np.asarray(data["nwp_cube"], np.float32)),
            label_cube=jnp.asarray(np.asarray(data["label_cube"], np.float32)),
        )
        cache[k_] = c
        if len(cache) > 8:
            cache.popitem(last=False)
        return c

    st = jax.tree.map(lambda x: x.copy(), state)
    st, m = step(st, cube, key0, True)

    def timed3(k):
        nonlocal st, key
        done = 0
        t0 = time.monotonic()
        while done < k:
            loader = PrefetchLoader(_CubeView(ds), 1, shuffle=True,
                                    drop_last=True, num_workers=2)
            for data in loader:
                c = to_device_cube(data)
                key, sub = jax.random.split(key)
                st, m = step(st, c, sub, True)
                done += 1
                if done >= k:
                    break
        _ = float(m["total_loss"])
        return time.monotonic() - t0

    timed3(len(ds) + 2)  # warm the caches across all windows
    s3 = median_slope(timed3)
    print(f"3. + loader+cache: {s3*1e3:.3f} ms ({1/s3:.1f} fps)", flush=True)
    print(f"windows={len(ds)} n_margin={n_m} n_inter={n_i}", flush=True)


if __name__ == "__main__":
    main()

"""Can splitting on-device sampling out of the fused ds train step beat it?

docs/PERF.md round-3 (h): the fused device-sampling step costs 6.85 ms vs
4.88 ms for the host-mode step, yet the sampling block standalone is only
~0.5 ms -- ~1.5 ms is XLA scheduling of the gather/interp block inside the
big fused program.  Hypothesis: two programs (sample -> PointBatch, then
the host-mode train step) dispatch back-to-back for ~5.4 ms total, because
the small sampling program schedules cleanly on its own.

Run ALONE on an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_split_sampling.py
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
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.data.dataset import PhysicsDataset
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.train.device_sampling import (
        CubeBatch, SamplerConfig, make_device_sampling_train_step,
        sample_window_points)
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import (
        Batch, PointBatch, StepConfig, create_train_state, make_train_step)

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

    from deepphysinet_tpu.train.device_sampling import cube_batch_from_items

    cube = CubeBatch(*(jnp.asarray(x)
                       for x in cube_batch_from_items([ds.get_cube_item(0)])))
    n_m, n_i = ds.label_batch_size, ds.inter_batch_size
    dummy = Batch(
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
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0), dummy)
    key0 = jax.random.PRNGKey(1)

    # ---- A. fused ds step (current production path) ----
    fused = make_device_sampling_train_step(model, tx, step_cfg, scfg)
    st = jax.tree.map(lambda x: x.copy(), state0)
    st, m = fused(st, cube, key0, True)
    _ = float(m["total_loss"])

    def timed_fused(k):
        nonlocal st
        t0 = time.monotonic()
        for _ in range(k):
            st, m = fused(st, cube, key0, True)
        _ = float(m["total_loss"])
        return time.monotonic() - t0

    sA = median_slope(timed_fused)
    print(f"A. fused ds step: {sA*1e3:.3f} ms ({1/sA:.1f} fps)", flush=True)

    # ---- B. split: sample program -> host-mode train step ----
    @jax.jit
    def sample_prog(batch: CubeBatch, key):
        keys = jax.random.split(key, batch.field.shape[0])

        def one(nwp_b, label_b, key_b):
            return sample_window_points(key_b, nwp_b, label_b, scfg,
                                        step_cfg.coord_spec)

        margin, inter = jax.vmap(one)(batch.nwp_cube, batch.label_cube, keys)
        return Batch(field=batch.field, forecast_h=batch.forecast_h,
                     margin=margin, inter=inter)

    host_step = make_train_step(model, tx, step_cfg)
    st = jax.tree.map(lambda x: x.copy(), state0)
    pb = sample_prog(cube, key0)
    st, m = host_step(st, pb, True)
    _ = float(m["total_loss"])

    def timed_split(k):
        nonlocal st
        t0 = time.monotonic()
        for _ in range(k):
            pb = sample_prog(cube, key0)
            st, m = host_step(st, pb, True)
        _ = float(m["total_loss"])
        return time.monotonic() - t0

    sB = median_slope(timed_split)
    print(f"B. split sample+step: {sB*1e3:.3f} ms ({1/sB:.1f} fps)", flush=True)

    # ---- C. sample program alone ----
    def timed_sample(k):
        t0 = time.monotonic()
        pb = None
        for _ in range(k):
            pb = sample_prog(cube, key0)
        _ = float(jnp.sum(pb.margin.x))
        return time.monotonic() - t0

    sC = median_slope(timed_sample)
    print(f"C. sample prog alone: {sC*1e3:.3f} ms", flush=True)

    # ---- D. host-mode step alone on pre-sampled points ----
    st = jax.tree.map(lambda x: x.copy(), state0)
    pb = sample_prog(cube, key0)
    st, m = host_step(st, pb, True)
    _ = float(m["total_loss"])

    def timed_host(k):
        nonlocal st
        t0 = time.monotonic()
        for _ in range(k):
            st, m = host_step(st, pb, True)
        _ = float(m["total_loss"])
        return time.monotonic() - t0

    sD = median_slope(timed_host)
    print(f"D. host-mode step alone: {sD*1e3:.3f} ms", flush=True)
    print(f"n_margin={n_m} n_inter={n_i}", flush=True)


if __name__ == "__main__":
    main()

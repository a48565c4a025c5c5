"""2-D row-table cubes vs legacy 5-D cubes (docs/PERF.md round-3 (k)).

scripts/perf_gather_shape.py isolated the mechanism: XLA assigns >2-D
runtime parameters a tiled device layout, so the sampler's in-program
``reshape(-1, 6)`` of a 5-D cube is a ~1 ms relayout copy of the 22 MB
label cube -- ~10x the 20480-row gather it feeds.  CubeBatch now ships
cubes as 2-D window-major row tables ([B*H*W*T, 6]) with the grid geometry
static; this script measures the effect at production sizes, B=1:

  1. the isolated iid sampling block, 5-D vs table;
  2. the full iid ds train step ('kernel' engine), 5-D vs table;
  3. the pool ds train step (its coarse NWP cube also becomes a table).

Run ALONE on an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_row_tables.py
"""

import statistics
import time

import numpy as np


def median_slope(timed, reps: int = 5, k1: int = 20, k2: int = 220) -> float:
    timed(30)
    return statistics.median(
        (timed(k2) - timed(k1)) / (k2 - k1) for _ in range(reps))


def bench(name, fn, *args, reps=5, k1=20, k2=220):
    import jax

    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]

    def timed(k):
        o = None
        t0 = time.monotonic()
        for _ in range(k):
            o = jfn(*args)
        _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
        return time.monotonic() - t0

    s = median_slope(timed, reps=reps, k1=k1, k2=k2)
    print(f"{name}: {s*1e6:.1f} us", flush=True)
    return s


def main() -> None:
    import jax
    import jax.numpy as jnp

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.normalization import (
        OBS_NAME_ORDER, norm_specs_from_cfg)
    from deepphysinet_tpu.train.device_sampling import (
        CubeBatch, SamplerConfig, attach_pool_nwp, build_pool,
        make_device_sampling_train_step, sample_window_points_batched)
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import (
        Batch, PointBatch, StepConfig, create_train_state)

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    Hl, Wl, Tl = 145, 257, 25
    nm, ni = 20480, 4096
    scfg = SamplerConfig(n_margin=nm, n_inter=ni, window_h=24,
                         input_time_step=6, label_time_step=1,
                         begin_lat=18.0, begin_lon=72.0, fine_step=0.25,
                         coarse_step=1.0)
    spec = CoordSpec(lon_size=Wl, lat_size=Hl, dx=27000.0, dy=27000.0,
                     pred_t_span=86400.0)
    label5 = jnp.asarray((rng.randn(1, Hl, Wl, Tl, 6) * 0.1).astype(np.float32))
    nwp5 = jnp.asarray(rng.randn(1, 37, 65, 5, 6).astype(np.float32) * 0.1)
    label_t = jnp.asarray(np.asarray(label5).reshape(-1, 6))
    nwp_t = jnp.asarray(np.asarray(nwp5).reshape(-1, 6))
    keys = jax.random.split(jax.random.PRNGKey(0), 1)

    # ---- 1. isolated sampling block ----
    bench("iid block 5-D cubes (legacy)",
          lambda l, n, k: sample_window_points_batched(k, n, l, scfg, spec),
          label5, nwp5, keys)
    bench("iid block row tables",
          lambda l, n, k: sample_window_points_batched(k, n, l, scfg, spec),
          label_t, nwp_t, keys)

    # ---- 2./3. full ds train step ----
    cfgd = Config.fromfile("/root/repo/configs/DeepPhysiNet_NCEP_cfg.py").config
    meta = {k: v for k, v in cfgd["meta_cfg"].items() if k != "name"}
    net = {k: v for k, v in cfgd["net_cfg"].items() if k != "name"}
    model = PhysicsNet(meta_cfg=meta, net_cfg=net, compute_dtype=jnp.bfloat16)
    specs = norm_specs_from_cfg(cfgd["obs_norm_cfg"])
    step_cfg = StepConfig(
        coord_spec=spec,
        obs_specs=tuple(specs[k] for k in OBS_NAME_ORDER),
        loss_factor=dict(cfgd["train_cfg"]["losses"]["loss_factor"]),
        pde_engine="kernel",
    )
    field = jnp.asarray(rng.randn(1, 159, 2405).astype(np.float32) * 0.3)
    fh = jnp.asarray([24.0], jnp.float32)

    rows_np, idx_np = build_pool(np.asarray(label5[0]), nm, 7)
    pcube = CubeBatch(field, fh, nwp_t, None,
                      jnp.asarray(rows_np)[None], jnp.asarray(idx_np)[None])
    pcube = attach_pool_nwp(pcube, scfg, spec)

    batches = [
        ("iid 5-D (legacy)", CubeBatch(field, fh, nwp5, label5)),
        ("iid tables", CubeBatch(field, fh, nwp_t, label_t)),
        ("pool tables", pcube),
    ]

    def pts(n):
        return PointBatch(
            x=jnp.zeros((1, n)), y=jnp.zeros((1, n)), t=jnp.zeros((1, n)),
            f=jnp.zeros((1, n, 1)), nwp=jnp.zeros((1, n, 6)),
            labels=jnp.zeros((1, n, 6)))

    dummy = Batch(field=field, forecast_h=fh, margin=pts(8), inter=pts(4))
    tx = build_optimizer("Adam", lr=1e-4, weight_decay=1e-4)

    for name, batch in batches:
        state = create_train_state(model, tx, jax.random.PRNGKey(0), dummy)
        step = make_device_sampling_train_step(model, tx, step_cfg, scfg)
        key = jax.random.PRNGKey(1)
        state, m = step(state, batch, key, True)  # compile
        float(m["total_loss"])

        def timed(k):
            nonlocal state
            m = None
            t0 = time.monotonic()
            for _ in range(k):
                state, m = step(state, batch, key, True)
            float(m["total_loss"])
            return time.monotonic() - t0

        s = median_slope(timed, reps=5, k1=10, k2=110)
        print(f"ds train step [{name}]: {s*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Pool sampler vs iid sampler on the real chip (docs/PERF.md round-3 (j)).

Measures, at production sizes (nm=20480, ni=4096, label 145x257x25):
  1. isolated sampling block: iid (random row gathers) vs pool (contiguous
     slices at a random offset);
  2. the full device-sampling train step both ways ('kernel' engine);
  3. the one-time per-window costs the pool amortizes: host build_pool and
     the on-device attach_pool_nwp pass.

Run ALONE on an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_pool_sampler.py
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

    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.train.device_sampling import (
        CubeBatch, SamplerConfig, attach_pool_nwp, build_pool,
        sample_window_points_batched, sample_window_points_pooled_batched)

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
    label_np = (rng.randn(1, Hl, Wl, Tl, 6) * 0.1).astype(np.float32)
    label = jnp.asarray(label_np)
    nwp = jnp.asarray(rng.randn(1, 37, 65, 5, 6).astype(np.float32) * 0.1)
    keys = jax.random.split(jax.random.PRNGKey(0), 1)

    # one-time pool build (host numpy, as the loader runs it -- do NOT pass
    # a device array here or the timing measures a 22 MB tunnel fetch)
    t0 = time.monotonic()
    rows_np, idx_np = build_pool(label_np[0], nm, 7)
    print(f"host build_pool: {(time.monotonic()-t0)*1e3:.1f} ms", flush=True)
    rows = jnp.asarray(rows_np)[None]
    idx = jnp.asarray(idx_np)[None]

    # one-time device conditioning pass
    cube = CubeBatch(None, None, nwp, None, rows, idx)
    t0 = time.monotonic()
    cube = attach_pool_nwp(cube, scfg, spec)
    cube.pool_nwp.block_until_ready()
    print(f"attach_pool_nwp (compile+run): {(time.monotonic()-t0)*1e3:.1f} ms",
          flush=True)
    t0 = time.monotonic()
    cube2 = CubeBatch(None, None, nwp, None, rows, idx)
    cube2 = attach_pool_nwp(cube2, scfg, spec)
    cube2.pool_nwp.block_until_ready()
    print(f"attach_pool_nwp (cached): {(time.monotonic()-t0)*1e3:.1f} ms",
          flush=True)

    bench("iid sampling block (B=1)",
          lambda l, n, k: sample_window_points_batched(k, n, l, scfg, spec),
          label, nwp, keys)
    bench("pool sampling block (B=1)",
          lambda n, r, i, p, k: sample_window_points_pooled_batched(
              k, n, r, i, p, scfg, spec),
          nwp, rows, idx, cube.pool_nwp, keys)

    # ---- full ds train step, both samplers, 'kernel' engine ----
    import dataclasses
    import sys

    sys.path.insert(0, "/root/repo")
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.normalization import (
        OBS_NAME_ORDER, norm_specs_from_cfg)
    from deepphysinet_tpu.train.device_sampling import (
        make_device_sampling_train_step)
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import (
        Batch, PointBatch, StepConfig, create_train_state)
    from deepphysinet_tpu.config import Config

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
    full_iid = CubeBatch(field, fh, nwp, label)
    full_pool = CubeBatch(field, fh, nwp, None, rows, idx, cube.pool_nwp)

    def pts(n):
        return PointBatch(
            x=jnp.zeros((1, n)), y=jnp.zeros((1, n)), t=jnp.zeros((1, n)),
            f=jnp.zeros((1, n, 1)), nwp=jnp.zeros((1, n, 6)),
            labels=jnp.zeros((1, n, 6)))

    dummy = Batch(field=field, forecast_h=fh, margin=pts(8), inter=pts(4))
    tx = build_optimizer("Adam", lr=1e-4, weight_decay=1e-4)

    for name, batch in [("iid", full_iid), ("pool", full_pool)]:
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

"""Lean A/B for slow-compile days: v4 vs v6 at the bench shape + train step.

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_v6_lean.py
"""

from __future__ import annotations

import statistics
import time

import numpy as np


def median_slope(timed, reps: int = 5, k1: int = 50, k2: int = 1050) -> float:
    timed(60)  # warmup: absorb post-compile tunnel stalls
    return statistics.median(
        (timed(k2) - timed(k1)) / (k2 - k1) for _ in range(reps))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import os

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.physics.engine import fused_kernel_fields, residual_losses_from_fields
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import (
        Batch, PointBatch, StepConfig, create_train_state, make_train_step)

    cfg_file = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "configs", "DeepPhysiNet_NCEP_cfg.py")
    cfg = Config.fromfile(cfg_file).config
    meta = {k: v for k, v in cfg["meta_cfg"].items() if k != "name"}
    net = {k: v for k, v in cfg["net_cfg"].items() if k != "name"}
    model = PhysicsNet(meta_cfg=meta, net_cfg=net, compute_dtype=jnp.bfloat16)
    specs = norm_specs_from_cfg(cfg["obs_norm_cfg"])
    lat_size, lon_size = cfg["train_cfg"]["img_size"]
    coord_spec = CoordSpec(lon_size=lon_size, lat_size=lat_size, dx=27000.0,
                           dy=27000.0, pred_t_span=86400.0)
    obs_specs = tuple(specs[k] for k in OBS_NAME_ORDER)
    factors = dict(cfg["train_cfg"]["losses"]["loss_factor"])
    rng = np.random.RandomState(0)

    B, n_margin, n_inter = 1, 20480, 4096

    def pts(n):
        return PointBatch(
            x=jnp.asarray(rng.rand(B, n) * 27000 * (lon_size - 1), jnp.float32),
            y=jnp.asarray(rng.rand(B, n) * 27000 * (lat_size - 1), jnp.float32),
            t=jnp.asarray(rng.randint(0, 25, (B, n)) * 3600.0, jnp.float32),
            f=jnp.asarray(1e-4 * rng.rand(B, n, 1), jnp.float32),
            nwp=jnp.asarray(rng.randn(B, n, 6) * 0.1, jnp.float32),
            labels=jnp.asarray(rng.randn(B, n, 6) * 0.1, jnp.float32),
        )

    batch = Batch(
        field=jnp.asarray(rng.randn(B, 159, 2405) * 0.5, jnp.float32),
        forecast_h=jnp.asarray([24.0], jnp.float32),
        margin=pts(n_margin),
        inter=pts(n_inter),
    )
    tx = build_optimizer("Adam", lr=1e-4, weight_decay=1e-4)
    fh_norm = jnp.asarray([24.0 / 360.0], jnp.float32)
    t0 = time.monotonic()
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    jax.block_until_ready(state.params)
    print(f"init: {time.monotonic()-t0:.0f}s", flush=True)

    n_eval = 40960
    coords = jnp.asarray(
        np.stack([rng.rand(n_eval) * 27000 * (lon_size - 1),
                  rng.rand(n_eval) * 27000 * (lat_size - 1),
                  rng.randint(0, 25, n_eval) * 3600.0], -1), jnp.float32)
    cf = jnp.asarray(1e-4 * rng.rand(n_eval, 1), jnp.float32)
    nwp = jnp.asarray(rng.randn(n_eval, 6) * 0.1, jnp.float32)

    for version in ():
        @jax.jit
        def residual_eval(params, coords, nwp, f, _v=version):
            tokens = model.apply(params, batch.field, jnp.asarray([[24.0 / 360.0]]),
                                 method=PhysicsNet.encode)
            _, fd = fused_kernel_fields(
                model, params, tokens[0], coords, nwp, fh_norm,
                coord_spec, obs_specs, with_clip=True, version=_v)
            return residual_losses_from_fields(fd, f, factors)["total"]

        t0 = time.monotonic()
        _ = float(residual_eval(state.params, coords, nwp, cf))
        print(f"compile eval v{version}: {time.monotonic()-t0:.0f}s", flush=True)

        def timed(k):
            t0 = time.monotonic()
            out = None
            for _ in range(k):
                out = residual_eval(state.params, coords, nwp, cf)
            _ = float(out)
            return time.monotonic() - t0

        dt = median_slope(timed)
        print(f"eval n={n_eval} v{version}: {dt*1e3:.3f} ms "
              f"({n_eval/dt/1e6:.2f}M evals/s)", flush=True)

    for version in (4, 6):
        step_cfg = StepConfig(coord_spec=coord_spec, obs_specs=obs_specs,
                              loss_factor=factors, pde_engine="kernel",
                              kernel_version=version)
        st = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
        step = make_train_step(model, tx, step_cfg)
        t0 = time.monotonic()
        st, m = step(st, batch, with_pde=True)
        _ = float(m["total_loss"])
        print(f"compile step v{version}: {time.monotonic()-t0:.0f}s", flush=True)

        def timed_run(k):
            nonlocal st
            t0 = time.monotonic()
            for _ in range(k):
                st, m = step(st, batch, with_pde=True)
            _ = float(m["total_loss"])
            return time.monotonic() - t0

        dt = median_slope(timed_run, k1=20, k2=220)
        print(f"train step v{version}: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Dissect the kernel_version=7 (v4s) training-step regression (round 5).

perf_v4s.py measured E7 1.757 vs E4 1.964 ms (fwd eval −10.5%) but STEP7
3.800 vs STEP4 3.585 ms (+6%), while perf_bwd_v4t.py puts the isolated bwd
kernels within 0.034 ms.  This script times the loss forward and the full
step body IN-SCAN for both kernel versions so the backward-side delta
(step − loss − adam) is isolated.

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_v4s_step.py
"""

from __future__ import annotations

import statistics
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    import os

    from deepphysinet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(os.environ.get("DPN_XLA_CACHE", "/tmp/dpn_xla_cache"))

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import (
        Batch, PointBatch, StepConfig, create_train_state, make_loss_fn,
        make_train_step_impl)

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
        margin=pts(n_margin), inter=pts(n_inter))
    tx = build_optimizer("Adam", lr=1e-4, weight_decay=1e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    jax.block_until_ready(state.params)

    def median_slope(fn, args, reps=5, k1=4, k2=16):
        def timed(k):
            t0 = time.monotonic()
            out = None
            for _ in range(k):
                out = fn(*args)
            _ = float(jax.tree.leaves(out)[0].ravel()[0])
            return time.monotonic() - t0
        timed(1)
        timed(10)
        return statistics.median((timed(k2) - timed(k1)) / (k2 - k1)
                                 for _ in range(reps))

    for kv in (4, 7):
        scfg = StepConfig(coord_spec=coord_spec, obs_specs=obs_specs,
                          loss_factor=factors, pde_engine="kernel",
                          kernel_version=kv)
        loss_fn = make_loss_fn(model, scfg)
        step_impl = make_train_step_impl(model, tx, scfg)

        def scan_loss(k):
            def f(params):
                def body(c, _):
                    total, _aux = loss_fn(params, batch._replace(
                        field=batch.field + c), True)
                    return (total * 1e-20).astype(jnp.float32), ()
                c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
                return c[None]
            return f

        def scan_step(k):
            def f(state0):
                def body(st, _):
                    st2, _m = step_impl(st, batch, True)
                    return st2, ()
                st, _ = jax.lax.scan(body, state0, None, length=k)
                return st
            return f

        rows = {}
        for name, builder, args in (("loss", scan_loss, (state.params,)),
                                    ("step", scan_step, (state,))):
            t1 = median_slope(jax.jit(builder(4)), args)
            t2 = median_slope(jax.jit(builder(16)), args)
            rows[name] = (t2 - t1) / 12
            print(f"v{kv} {name}: {rows[name]*1e3:.3f} ms/iter", flush=True)
        print(f"v{kv} backward-side (step - loss): "
              f"{(rows['step'] - rows['loss'])*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()

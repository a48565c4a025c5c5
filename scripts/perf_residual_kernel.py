"""A/B: in-kernel residual assembly (ops/residual_kernel.py) vs the split
decode-kernel + XLA assembly eval path, at the bench geometry.

Run on the real TPU with an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
      scripts/perf_residual_kernel.py
"""

from __future__ import annotations

import statistics
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.ops.residual_kernel import kernel_residual_losses
    from deepphysinet_tpu.physics.engine import (
        fused_kernel_fields, residual_losses_from_fields)
    from deepphysinet_tpu.train.train_step import StepConfig
    import os

    cfg_file = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "configs", "DeepPhysiNet_NCEP_cfg.py")
    cfg = Config.fromfile(cfg_file).config
    meta = {k: v for k, v in cfg["meta_cfg"].items() if k != "name"}
    net = {k: v for k, v in cfg["net_cfg"].items() if k != "name"}
    model = PhysicsNet(meta_cfg=meta, net_cfg=net, compute_dtype=jnp.bfloat16)
    specs = norm_specs_from_cfg(cfg["obs_norm_cfg"])
    lat_size, lon_size = cfg["train_cfg"]["img_size"]
    step_cfg = StepConfig(
        coord_spec=CoordSpec(lon_size=lon_size, lat_size=lat_size, dx=27000.0,
                             dy=27000.0, pred_t_span=86400.0),
        obs_specs=tuple(specs[k] for k in OBS_NAME_ORDER),
        loss_factor=dict(cfg["train_cfg"]["losses"]["loss_factor"]),
    )

    rng = np.random.RandomState(0)
    field = jnp.asarray(rng.randn(1, 159, 2405) * 0.5, jnp.float32)
    fh_enc = jnp.asarray([[24.0 / 360.0]], jnp.float32)
    fh_norm = jnp.asarray([24.0 / 360.0], jnp.float32)
    factors = dict(cfg["train_cfg"]["losses"]["loss_factor"])
    params = model.init(jax.random.PRNGKey(0), field,
                        jnp.zeros((8, net["in_channels"]), jnp.float32),
                        jnp.zeros((8, 6), jnp.float32), fh_enc)

    def inputs(n):
        coords = jnp.asarray(
            np.stack([
                rng.rand(n) * 27000 * (lon_size - 1),
                rng.rand(n) * 27000 * (lat_size - 1),
                rng.randint(0, 25, n) * 3600.0,
            ], axis=-1), jnp.float32)
        f = jnp.asarray(1e-4 * rng.rand(n, 1), jnp.float32)
        nwp = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
        return coords, nwp, f

    @jax.jit
    def eval_split(params, coords, nwp, f):
        tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
        _, fd = fused_kernel_fields(model, params, tokens[0], coords, nwp,
                                    fh_norm, step_cfg.coord_spec,
                                    step_cfg.obs_specs, with_clip=True)
        return residual_losses_from_fields(fd, f, factors)["total"]

    @jax.jit
    def eval_fused(params, coords, nwp, f):
        tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
        return kernel_residual_losses(
            model, params, tokens[0], coords, nwp, fh_norm, f,
            step_cfg.coord_spec, step_cfg.obs_specs, factors,
            with_clip=True)["total"]

    def median_slope(fn, args, reps=5, k1=50, k2=1050):
        _ = float(fn(*args))
        t0 = time.monotonic(); _ = float(fn(*args))
        if time.monotonic() - t0 > 5.0:
            reps = 3

        def timed(k):
            t0 = time.monotonic()
            out = None
            for _ in range(k):
                out = fn(*args)
            _ = float(out)
            return time.monotonic() - t0

        timed(60)
        return statistics.median((timed(k2) - timed(k1)) / (k2 - k1)
                                 for _ in range(reps))

    for n in (24576, 40960, 49152, 65536, 98304):
        coords, nwp, f = inputs(n)
        a = float(eval_split(params, coords, nwp, f))
        b = float(eval_fused(params, coords, nwp, f))
        rel = abs(a - b) / max(abs(a), 1e-30)
        t_split = median_slope(eval_split, (params, coords, nwp, f))
        t_fused = median_slope(eval_fused, (params, coords, nwp, f))
        print(f"n={n:6d}  split {t_split*1e3:7.3f} ms ({n/t_split/1e6:6.2f}M/s)"
              f"  fused {t_fused*1e3:7.3f} ms ({n/t_fused/1e6:6.2f}M/s)"
              f"  value rel-diff {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()

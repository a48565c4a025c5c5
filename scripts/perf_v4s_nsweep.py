"""Batch-size sweep of the v4s fused residual eval (round 5 continuation).

The bench's 40960-pt sweet spot (plateau 24K-49K with a >49K cliff,
docs/PERF.md round-2 curve) was measured in the v4 regime; round 4 (i)
identified the cliff as the old split path's 21x lane-padded [3, N, 6]
tangent outputs and showed the v4t decode split flat through 131K.  This
sweeps the FULL shipping workload — encode + prep + v4s kernel pair +
assembly (exactly what bench.py times, kernel_version=7) — over N to
confirm the flat plateau holds end-to-end (docs/PERF.md round 5 (g)).

Run on an IDLE host (tunnel timing rules, CLAUDE.md):
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
      scripts/perf_v4s_nsweep.py
"""

from __future__ import annotations

import statistics
import time

import numpy as np


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    from deepphysinet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(os.environ.get("DPN_XLA_CACHE", "/tmp/dpn_xla_cache"))

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.physics.engine import fused_residual_losses
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import (
        Batch, PointBatch, create_train_state)

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

    field = jnp.asarray(rng.randn(1, 159, 2405) * 0.5, jnp.float32)
    fh_enc = jnp.asarray([[24.0 / 360.0]], jnp.float32)
    fh_norm = jnp.asarray([24.0 / 360.0], jnp.float32)

    def pts(n):
        return PointBatch(
            x=jnp.asarray(rng.rand(1, n) * 27000 * (lon_size - 1), jnp.float32),
            y=jnp.asarray(rng.rand(1, n) * 27000 * (lat_size - 1), jnp.float32),
            t=jnp.asarray(rng.randint(0, 25, (1, n)) * 3600.0, jnp.float32),
            f=jnp.asarray(1e-4 * rng.rand(1, n, 1), jnp.float32),
            nwp=jnp.asarray(rng.randn(1, n, 6) * 0.1, jnp.float32),
            labels=jnp.asarray(rng.randn(1, n, 6) * 0.1, jnp.float32),
        )

    init_batch = Batch(field=field, forecast_h=jnp.asarray([24.0], jnp.float32),
                       margin=pts(256), inter=pts(256))
    tx = build_optimizer("Adam", lr=1e-4, weight_decay=1e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), init_batch)
    params = state.params
    jax.block_until_ready(params)

    def eval_fn(coords, nwp, coriolis_f):
        tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
        return fused_residual_losses(
            model, params, tokens[0], coords, nwp, fh_norm, coriolis_f,
            coord_spec, obs_specs, factors, with_clip=True, version=7)["total"]

    jitted = jax.jit(eval_fn)

    def median_slope(args, reps=5, k1=50, k2=350):
        def timed(k):
            t0 = time.monotonic()
            out = None
            for _ in range(k):
                out = jitted(*args)
            _ = float(out)
            return time.monotonic() - t0
        timed(1)
        timed(60)
        return statistics.median((timed(k2) - timed(k1)) / (k2 - k1)
                                 for _ in range(reps))

    for n in (24576, 32768, 40960, 49152, 57344, 65536, 81920, 98304, 131072):
        coords = jnp.asarray(np.stack([
            rng.rand(n) * 27000 * (lon_size - 1),
            rng.rand(n) * 27000 * (lat_size - 1),
            rng.randint(0, 25, n) * 3600.0,
        ], axis=-1), jnp.float32)
        coriolis_f = jnp.asarray(1e-4 * rng.rand(n, 1), jnp.float32)
        nwp = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
        jax.block_until_ready((coords, coriolis_f, nwp))
        t = median_slope((coords, nwp, coriolis_f))
        print(f"N={n:7d}: {t*1e3:.3f} ms = {n/t/1e6:.2f}M evals/s", flush=True)


if __name__ == "__main__":
    main()

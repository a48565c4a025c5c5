"""A/B the forward-only decode paths on real TPU (round 4, inference hot op).

Round-2 established collapsed_decode (XLA v4 algebra, [N, 6] out) at
~0.97 ms per 37265-pt grid frame.  Round 4's var-major campaign built
collapsed_decode_t: the SAME collapsed algebra as a primal-only var-major
Pallas kernel ([6, N] out, no tangent buffers, block 512) feeding a
var-major inverse normalization — no lane-padded [N, 6] buffer anywhere.

Rungs (warmup + median-of-5 slopes, per frame):
  X      : collapsed_decode + inverse_norm_stack        (the shipping path)
  T      : collapsed_decode_t + inverse_norm_stack_t    (candidate)
  X_raw  : collapsed_decode only (no inverse norm)
  T_raw  : collapsed_decode_t only

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
     scripts/perf_primal_decode.py
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
    from deepphysinet_tpu.physics.engine import collapsed_decode, collapsed_decode_t
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.point_fn import (
        inverse_norm_stack, inverse_norm_stack_t)
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
    rng = np.random.RandomState(0)

    field = jnp.asarray(rng.randn(1, 159, 2405) * 0.5, jnp.float32)
    fh_enc = jnp.asarray([[24.0 / 360.0]], jnp.float32)
    fh_norm = jnp.asarray([24.0 / 360.0], jnp.float32)

    init_batch = Batch(
        field=field, forecast_h=jnp.asarray([24.0], jnp.float32),
        margin=PointBatch(
            x=jnp.zeros((1, 256)), y=jnp.zeros((1, 256)), t=jnp.zeros((1, 256)),
            f=jnp.zeros((1, 256, 1)), nwp=jnp.zeros((1, 256, 6)),
            labels=jnp.zeros((1, 256, 6))),
        inter=PointBatch(
            x=jnp.zeros((1, 256)), y=jnp.zeros((1, 256)), t=jnp.zeros((1, 256)),
            f=jnp.zeros((1, 256, 1)), nwp=jnp.zeros((1, 256, 6)),
            labels=jnp.zeros((1, 256, 6))),
    )
    tx = build_optimizer("Adam", lr=1e-4, weight_decay=1e-4)
    params = create_train_state(model, tx, jax.random.PRNGKey(0), init_batch).params
    tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)[0]
    jax.block_until_ready(tokens)

    n = lat_size * lon_size  # one full grid frame (37265 at 145x257)
    coords = jnp.asarray(np.stack([
        rng.rand(n) * 27000 * (lon_size - 1),
        rng.rand(n) * 27000 * (lat_size - 1),
        np.full(n, 6 * 3600.0),
    ], axis=-1), jnp.float32)
    nwp = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
    jax.block_until_ready((coords, nwp))

    def x_full(tokens, coords, nwp):
        out = collapsed_decode(model, params, tokens, coords, nwp,
                               fh_norm, coord_spec)
        return inverse_norm_stack(out, obs_specs, with_clip=True).sum()

    def t_full(tokens, coords, nwp):
        out = collapsed_decode_t(model, params, tokens, coords, nwp,
                                 fh_norm, coord_spec)
        return inverse_norm_stack_t(out, obs_specs, with_clip=True).sum()

    def x_raw(tokens, coords, nwp):
        return collapsed_decode(model, params, tokens, coords, nwp,
                                fh_norm, coord_spec).sum()

    def t_raw(tokens, coords, nwp):
        return collapsed_decode_t(model, params, tokens, coords, nwp,
                                  fh_norm, coord_spec).sum()

    def median_slope(fn, args, reps=5, k1=50, k2=350):
        def timed(k):
            t0 = time.monotonic()
            out = None
            for _ in range(k):
                out = fn(*args)
            _ = float(out)
            return time.monotonic() - t0
        timed(1)
        timed(60)
        return statistics.median((timed(k2) - timed(k1)) / (k2 - k1)
                                 for _ in range(reps))

    args = (tokens, coords, nwp)
    for name, fn in [("X     ", x_full), ("T     ", t_full),
                     ("X_raw ", x_raw), ("T_raw ", t_raw)]:
        jfn = jax.jit(fn)
        t = median_slope(jfn, args)
        print(f"{name}: {t*1e3:.3f} ms/frame @ {n} pts = {n/t/1e6:.2f}M pts/s "
              f"(chk {float(jfn(*args)):.6g})", flush=True)


if __name__ == "__main__":
    main()

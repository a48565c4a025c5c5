"""Follow-up to perf_primal_decode.py: XLA var-major twin + kernel block sweep.

First run showed the primal Pallas kernel losing to the XLA [N, 6] path
(1.135 vs 0.890 ms/frame raw).  Disambiguate: is it the var-major layout or
the kernel?  Rungs:

  X_raw   : collapsed_decode, XLA [N, 6]              (shipping baseline)
  TX_raw  : collapsed_decode_t use_kernel=False (XLA var-major twin)
  TK_b512 : Pallas primal kernel, block 512 (first run's default)
  TK_b1024 / TK_b2048 : block sweep

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
     scripts/perf_primal_decode2.py
"""

from __future__ import annotations

import functools
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
    from deepphysinet_tpu.ops.decode_kernel import decode_primal_v4t, fuse_decode_weights
    from deepphysinet_tpu.physics.engine import (
        _kernel_inputs, collapsed_decode, collapsed_decode_t)
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import (
        Batch, PointBatch, create_train_state)

    cfg_file = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "configs", "DeepPhysiNet_NCEP_cfg.py")
    cfg = Config.fromfile(cfg_file).config
    meta = {k: v for k, v in cfg["meta_cfg"].items() if k != "name"}
    net = {k: v for k, v in cfg["net_cfg"].items() if k != "name"}
    model = PhysicsNet(meta_cfg=meta, net_cfg=net, compute_dtype=jnp.bfloat16)
    lat_size, lon_size = cfg["train_cfg"]["img_size"]
    coord_spec = CoordSpec(lon_size=lon_size, lat_size=lat_size, dx=27000.0,
                           dy=27000.0, pred_t_span=86400.0)
    rng = np.random.RandomState(0)

    field = jnp.asarray(rng.randn(1, 159, 2405) * 0.5, jnp.float32)
    fh_enc = jnp.asarray([[24.0 / 360.0]], jnp.float32)
    fh_norm = jnp.asarray([24.0 / 360.0], jnp.float32)

    def zpts(n):
        return PointBatch(
            x=jnp.zeros((1, n)), y=jnp.zeros((1, n)), t=jnp.zeros((1, n)),
            f=jnp.zeros((1, n, 1)), nwp=jnp.zeros((1, n, 6)),
            labels=jnp.zeros((1, n, 6)))

    init_batch = Batch(field=field, forecast_h=jnp.asarray([24.0], jnp.float32),
                       margin=zpts(256), inter=zpts(256))
    tx = build_optimizer("Adam", lr=1e-4, weight_decay=1e-4)
    params = create_train_state(model, tx, jax.random.PRNGKey(0), init_batch).params
    tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)[0]
    jax.block_until_ready(tokens)

    n = lat_size * lon_size
    coords = jnp.asarray(np.stack([
        rng.rand(n) * 27000 * (lon_size - 1),
        rng.rand(n) * 27000 * (lat_size - 1),
        np.full(n, 6 * 3600.0),
    ], axis=-1), jnp.float32)
    nwp = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
    jax.block_until_ready((coords, nwp))

    def x_raw(tokens, coords, nwp):
        return collapsed_decode(model, params, tokens, coords, nwp,
                                fh_norm, coord_spec).sum()

    def tx_raw(tokens, coords, nwp):
        return collapsed_decode_t(model, params, tokens, coords, nwp,
                                  fh_norm, coord_spec, use_kernel=False).sum()

    def tk_raw(tokens, coords, nwp, block_n):
        weights, pe, _dpe, cd_pe = _kernel_inputs(
            model, params, tokens, coords, nwp, fh_norm, coord_spec)
        fw = fuse_decode_weights(weights)
        return decode_primal_v4t(fw, pe, cd_pe, nwp.T, block_n=block_n,
                                 compute_dtype=model.compute_dtype).sum()

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
    rungs = [("X_raw  ", jax.jit(x_raw)), ("TX_raw ", jax.jit(tx_raw))]
    # block 2048 measured: VMEM scoped-allocation OOM at compile (17.86M vs
    # 16M limit -- the [block, 256] f32 relu temporaries dominate), so the
    # sweep tops out at 1024
    for b in (512, 1024):
        rungs.append((f"TK_b{b}", jax.jit(functools.partial(
            lambda t_, c_, n_, block_n: tk_raw(t_, c_, n_, block_n),
            block_n=b))))
    for name, jfn in rungs:
        t = median_slope(jfn, args)
        print(f"{name}: {t*1e3:.3f} ms/frame @ {n} pts = {n/t/1e6:.2f}M pts/s "
              f"(chk {float(jfn(*args)):.6g})", flush=True)


if __name__ == "__main__":
    main()

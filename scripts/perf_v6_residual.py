"""A/B: in-kernel residual assembly v4 vs v6 (kernel_residual_losses) at the
bench geometry, plus block_n sensitivity for v6.

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_v6_residual.py
"""

from __future__ import annotations

import statistics
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    import os

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.ops.residual_kernel import kernel_residual_losses

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
    params = model.init(jax.random.PRNGKey(0), field,
                        jnp.zeros((8, net["in_channels"]), jnp.float32),
                        jnp.zeros((8, 6), jnp.float32), fh_enc)

    n = 40960
    coords = jnp.asarray(
        np.stack([rng.rand(n) * 27000 * (lon_size - 1),
                  rng.rand(n) * 27000 * (lat_size - 1),
                  rng.randint(0, 25, n) * 3600.0], -1), jnp.float32)
    f = jnp.asarray(1e-4 * rng.rand(n, 1), jnp.float32)
    nwp = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)

    def median_slope(fn, reps=5, k1=50, k2=1050):
        def timed(k):
            t0 = time.monotonic()
            out = None
            for _ in range(k):
                out = fn()
            _ = float(out)
            return time.monotonic() - t0

        timed(60)
        return statistics.median((timed(k2) - timed(k1)) / (k2 - k1)
                                 for _ in range(reps))

    vals = {}
    for version, block_n in ((4, 256), (6, 256), (6, 128), (6, 512)):
        @jax.jit
        def eval_fused(params, coords, nwp, f, _v=version, _b=block_n):
            tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
            return kernel_residual_losses(
                model, params, tokens[0], coords, nwp, fh_norm, f,
                coord_spec, obs_specs, factors, with_clip=True,
                block_n=_b, version=_v)["total"]

        t0 = time.monotonic()
        vals[(version, block_n)] = float(eval_fused(params, coords, nwp, f))
        print(f"compile v{version} b{block_n}: {time.monotonic()-t0:.0f}s", flush=True)
        dt = median_slope(lambda: eval_fused(params, coords, nwp, f))
        print(f"residual-fused v{version} block={block_n}: {dt*1e3:.3f} ms "
              f"({n/dt/1e6:.2f}M evals/s)", flush=True)
    ref = vals[(4, 256)]
    for k, v in vals.items():
        print(f"value v{k}: rel-diff vs v4 {abs(v-ref)/max(abs(ref),1e-30):.2e}",
              flush=True)


if __name__ == "__main__":
    main()

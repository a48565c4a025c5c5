"""A/B: fused whole-encoder Pallas kernel vs the XLA encoder at flagship dims,
plus its effect on the full 40960-point residual evaluation.

Run on the real TPU with an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
      scripts/perf_encoder_kernel.py
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
    from deepphysinet_tpu.ops.encoder_kernel import encode_fused
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.physics.engine import fused_residual_losses
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

    n = 40960
    coords = jnp.asarray(
        np.stack([
            rng.rand(n) * 27000 * (lon_size - 1),
            rng.rand(n) * 27000 * (lat_size - 1),
            rng.randint(0, 25, n) * 3600.0,
        ], axis=-1), jnp.float32)
    f = jnp.asarray(1e-4 * rng.rand(n, 1), jnp.float32)
    nwp = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)

    @jax.jit
    def enc_xla(params, field):
        return jnp.sum(model.apply(params, field, fh_enc,
                                   method=PhysicsNet.encode))

    @jax.jit
    def enc_kernel(params, field):
        return jnp.sum(encode_fused(model, params, field, fh_enc))

    # numerical check first (bf16 rounding differences only)
    a = np.asarray(model.apply(params, field, fh_enc, method=PhysicsNet.encode),
                   np.float32)
    b = np.asarray(encode_fused(model, params, field, fh_enc), np.float32)
    err = np.abs(a - b).max() / max(1.0, np.abs(a).max())
    print(f"encode rel-max-diff (bf16 rounding): {err:.3e}", flush=True)

    @jax.jit
    def eval_xla_enc(params, coords, nwp, f):
        tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
        return fused_residual_losses(
            model, params, tokens[0], coords, nwp, fh_norm, f,
            step_cfg.coord_spec, step_cfg.obs_specs, factors)["total"]

    @jax.jit
    def eval_kernel_enc(params, coords, nwp, f):
        tokens = encode_fused(model, params, field, fh_enc)
        return fused_residual_losses(
            model, params, tokens[0], coords, nwp, fh_norm, f,
            step_cfg.coord_spec, step_cfg.obs_specs, factors)["total"]

    va = float(eval_xla_enc(params, coords, nwp, f))
    vb = float(eval_kernel_enc(params, coords, nwp, f))
    print(f"residual-eval values: xla-enc {va:.6e}  kernel-enc {vb:.6e} "
          f"(rel {abs(va-vb)/max(abs(va),1e-30):.2e})", flush=True)

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

    t_exla = median_slope(enc_xla, (params, field), k1=50, k2=2050)
    t_eker = median_slope(enc_kernel, (params, field), k1=50, k2=2050)
    print(f"encode: xla {t_exla*1e6:.1f} us   kernel {t_eker*1e6:.1f} us",
          flush=True)

    t_a = median_slope(eval_xla_enc, (params, coords, nwp, f))
    t_b = median_slope(eval_kernel_enc, (params, coords, nwp, f))
    print(f"residual eval @ {n}: xla-enc {t_a*1e3:.3f} ms ({n/t_a/1e6:.2f}M/s)"
          f"   kernel-enc {t_b*1e3:.3f} ms ({n/t_b/1e6:.2f}M/s)", flush=True)


if __name__ == "__main__":
    main()

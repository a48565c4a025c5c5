"""Re-site the split-vs-in-kernel-assembly crossover after var-major (v4t).

Round-3 (e) measured the [N, 6] split path falling off past ~49K points
(the [3, N, 6] tangent round-trip is 21x lane-padded in HBM) and set
``FUSED_ASSEMBLY_MIN_N = 49152`` where the in-kernel residual assembly
(ops/residual_kernel.py) takes over.  The v4t split path's [3, 6, N]
tangents are sublane-padded only (8/6 = 1.33x), so the falloff mechanism
is gone — this sweep re-measures both arms across the old crossover to
re-site (or retire) the constant.

Arms at each N in {24576, 40960, 49152, 65536, 98304, 131072}:
  A: v4t split  — fused_decode_jvp_v4t + packed [6, N] assembly
     (engine.fused_residual_losses version=4 path, forced)
  B: in-kernel  — kernel_residual_losses (fused_residual_sums_v4)

Warmup + median-of-5 slopes per the repo timing protocol (CLAUDE.md).
Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
     scripts/perf_assembly_crossover_v4t.py
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
    from deepphysinet_tpu.ops.decode_kernel import (
        extract_decode_weights, fuse_decode_weights, fused_decode_jvp_v4t,
        pe_and_tangents)
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe
    from deepphysinet_tpu.ops.residual_kernel import kernel_residual_losses
    from deepphysinet_tpu.physics.engine import (
        packed_residual_losses_from_primal_tangents_t)

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

    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import Batch, PointBatch, create_train_state

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
    params = create_train_state(model, tx, jax.random.PRNGKey(0), init_batch).params
    jax.block_until_ready(params)
    in_ch = net["in_channels"]
    cd_freqs = make_freq_bands(in_ch // 2 // 6, max_freq=4.0)

    def make_inputs(n):
        coords = jnp.asarray(np.stack([
            rng.rand(n) * 27000 * (lon_size - 1),
            rng.rand(n) * 27000 * (lat_size - 1),
            rng.randint(0, 25, n) * 3600.0,
        ], axis=-1), jnp.float32)
        return (coords,
                jnp.asarray(1e-4 * rng.rand(n, 1), jnp.float32),
                jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32))

    def split_fn(coords, coriolis_f, nwp):
        def f(params):
            tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
            w = extract_decode_weights(model, params, tokens[0], fh_norm)
            pe, dpe = pe_and_tangents(coords, coord_spec)
            cd_pe = sinecos_pe(nwp, cd_freqs, include_input=False)
            primal, tang = fused_decode_jvp_v4t(
                fuse_decode_weights(w), pe, dpe, cd_pe, nwp.T,
                compute_dtype=model.compute_dtype)
            return packed_residual_losses_from_primal_tangents_t(
                primal, tang, coriolis_f, obs_specs, factors)["total"]
        return jax.jit(f)

    def inkernel_fn(coords, coriolis_f, nwp):
        def f(params):
            tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
            return kernel_residual_losses(
                model, params, tokens[0], coords, nwp, fh_norm, coriolis_f,
                coord_spec, obs_specs, factors)["total"]
        return jax.jit(f)

    def median_slope(fn, reps=5, k1=30, k2=180):
        def timed(k):
            t0 = time.monotonic()
            out = None
            for _ in range(k):
                out = fn(params)
            _ = float(out)
            return time.monotonic() - t0
        timed(1)
        timed(30)
        return statistics.median((timed(k2) - timed(k1)) / (k2 - k1)
                                 for _ in range(reps))

    for n in (24576, 40960, 49152, 65536, 98304, 131072):
        coords, cf, nwp = make_inputs(n)
        for name, maker in (("v4t-split", split_fn), ("in-kernel", inkernel_fn)):
            fn = maker(coords, cf, nwp)
            t = median_slope(fn)
            print(f"N={n:6d} {name:10s}: {t*1e3:7.3f} ms = "
                  f"{n/t/1e6:6.2f}M evals/s (loss {float(fn(params)):.6g})",
                  flush=True)


if __name__ == "__main__":
    main()

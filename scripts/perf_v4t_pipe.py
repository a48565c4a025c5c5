"""A/B the software-pipelined v4t forward kernel on real TPU (round 4 (j)).

Round 4 (f) measured the v4t fwd kernel at ~59% MFU vs the bwd kernel's
83.5% on the same matmul mix; roofline arithmetic puts its pure-VPU
epilogue at ~44% of VPU capacity, which under full MXU/VPU serialization
reproduces the observed rate.  ``_decode_kernel_v4t_pipe`` emits variable
v's epilogue after variable v+1's matmuls so the units can overlap.

Measures the raw kernel (inputs prebuilt, bench geometry) and the full
fused residual eval, baseline vs pipelined.  Warmup + median-of-5 slopes.

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
     scripts/perf_v4t_pipe.py
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
    from deepphysinet_tpu.physics.engine import (
        packed_residual_losses_from_primal_tangents_t)
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
    params = create_train_state(model, tx, jax.random.PRNGKey(0), init_batch).params
    jax.block_until_ready(params)

    n = 40960
    coords = jnp.asarray(np.stack([
        rng.rand(n) * 27000 * (lon_size - 1),
        rng.rand(n) * 27000 * (lat_size - 1),
        rng.randint(0, 25, n) * 3600.0,
    ], axis=-1), jnp.float32)
    coriolis_f = jnp.asarray(1e-4 * rng.rand(n, 1), jnp.float32)
    nwp = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
    in_ch = net["in_channels"]
    cd_freqs = make_freq_bands(in_ch // 2 // 6, max_freq=4.0)

    # prebuilt kernel inputs (raw-kernel arm)
    tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
    w = extract_decode_weights(model, params, tokens[0], fh_norm)
    fwts = jax.tree.map(lambda x: jax.device_put(x), fuse_decode_weights(w))
    pe, dpe = pe_and_tangents(coords, coord_spec)
    cd_pe = sinecos_pe(nwp, cd_freqs, include_input=False)
    ref_t = nwp.T
    jax.block_until_ready((fwts, pe, dpe, cd_pe, ref_t))

    def raw_fn(pipeline):
        def f(pe, dpe, cd_pe, ref_t):
            p, t = fused_decode_jvp_v4t(fwts, pe, dpe, cd_pe, ref_t,
                                        compute_dtype=model.compute_dtype,
                                        pipeline=pipeline)
            return p.sum() + t.sum()
        return jax.jit(f)

    def eval_fn(pipeline):
        def f(params):
            tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
            w = extract_decode_weights(model, params, tokens[0], fh_norm)
            pe, dpe = pe_and_tangents(coords, coord_spec)
            cd_pe = sinecos_pe(nwp, cd_freqs, include_input=False)
            primal, tang = fused_decode_jvp_v4t(
                fuse_decode_weights(w), pe, dpe, cd_pe, nwp.T,
                compute_dtype=model.compute_dtype, pipeline=pipeline)
            return packed_residual_losses_from_primal_tangents_t(
                primal, tang, coriolis_f, obs_specs, factors)["total"]
        return jax.jit(f)

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

    for pipeline in (False, True):
        fn = raw_fn(pipeline)
        t = median_slope(fn, (pe, dpe, cd_pe, ref_t))
        print(f"raw kernel pipeline={pipeline}: {t*1e3:.3f} ms @ {n} pts = "
              f"{n/t/1e6:.2f}M pts/s (chk {float(fn(pe, dpe, cd_pe, ref_t)):.6g})",
              flush=True)
    for pipeline in (False, True):
        fn = eval_fn(pipeline)
        t = median_slope(fn, (params,))
        print(f"fused eval pipeline={pipeline}: {t*1e3:.3f} ms @ {n} pts = "
              f"{n/t/1e6:.2f}M evals/s (loss {float(fn(params)):.6g})",
              flush=True)


if __name__ == "__main__":
    main()

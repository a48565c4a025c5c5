"""Dissect the var-major fused-eval's non-kernel time on real TPU (round 4 (j)).

The raw v4t kernel runs 1.50 ms @ 40960 pts (27.3M pts/s, 68.5% MFU) but the
full fused residual eval is 1.97 ms — a 0.47 ms gap outside the kernel.
Ladder (each rung adds one stage; warmup + median-of-5 slopes):

  K_bf16 : kernel only, inputs pre-cast bf16 (pure kernel floor)
  K_f32  : kernel from f32 inputs (adds the in-graph casts)
  PK     : prep (pe_and_tangents + sinecos_pe) + kernel
  PKA    : + packed [6, N] residual assembly
  E      : full eval from params (+ encode + weight prep/fusion)

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
     scripts/perf_v4t_eval_split.py
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

    tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
    w = extract_decode_weights(model, params, tokens[0], fh_norm)
    fwts = fuse_decode_weights(w)
    pe, dpe = pe_and_tangents(coords, coord_spec)
    cd_pe = sinecos_pe(nwp, cd_freqs, include_input=False)
    ref_t = nwp.T
    bf = jnp.bfloat16
    pe_b, dpe_b, cdpe_b = pe.astype(bf), dpe.astype(bf), cd_pe.astype(bf)
    jax.block_until_ready((fwts, pe, dpe, cd_pe, pe_b, dpe_b, cdpe_b, ref_t))

    def k_fn(a, b, c, r):
        p, t = fused_decode_jvp_v4t(fwts, a, b, c, r, compute_dtype=bf)
        return p.sum() + t.sum()

    from deepphysinet_tpu.ops.position_encoding import sinecos_pe_flat
    from deepphysinet_tpu.physics.engine import fused_residual_losses

    def pk_fn(coords, nwp):
        pe, dpe = pe_and_tangents(coords, coord_spec, dtype=bf)
        cd_pe = sinecos_pe_flat(nwp, cd_freqs, dtype=bf)
        p, t = fused_decode_jvp_v4t(fwts, pe, dpe, cd_pe, nwp.T, compute_dtype=bf)
        return p.sum() + t.sum()

    def pka_fn(coords, nwp):
        pe, dpe = pe_and_tangents(coords, coord_spec, dtype=bf)
        cd_pe = sinecos_pe_flat(nwp, cd_freqs, dtype=bf)
        p, t = fused_decode_jvp_v4t(fwts, pe, dpe, cd_pe, nwp.T, compute_dtype=bf)
        return packed_residual_losses_from_primal_tangents_t(
            p, t, coriolis_f, obs_specs, factors)["total"]

    def e_fn(params):
        # the production path (engine._kernel_inputs handles prep/dtype)
        tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
        return fused_residual_losses(
            model, params, tokens[0], coords, nwp, fh_norm, coriolis_f,
            coord_spec, obs_specs, factors)["total"]

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

    rungs = [
        ("K_bf16", jax.jit(k_fn), (pe_b, dpe_b, cdpe_b, ref_t)),
        ("K_f32 ", jax.jit(k_fn), (pe, dpe, cd_pe, ref_t)),
        ("PK    ", jax.jit(pk_fn), (coords, nwp)),
        ("PKA   ", jax.jit(pka_fn), (coords, nwp)),
        ("E     ", jax.jit(e_fn), (params,)),
    ]
    for name, fn, args in rungs:
        t = median_slope(fn, args)
        print(f"{name}: {t*1e3:.3f} ms @ {n} pts = {n/t/1e6:.2f}M/s "
              f"(chk {float(fn(*args)):.6g})", flush=True)


if __name__ == "__main__":
    main()

"""A/B the dpe-free v4s kernel pair against shipping v4t on real TPU (round 5).

v4s = v6's folded tangent weights on v4's single wide-K primal pass: the
channel-major trig operand [N, 192] feeds the primal matmul whole and the
three tangent matmuls as contiguous 2F-lane slices — identical MXU slot
count to v4t, but the dpe prep (two [N, F, 3] multiplies + stack + moveaxis)
and the [3, N, 2F] kernel input stream disappear.

Rungs (warmup + median-of-5 slopes, 40960-pt bench shape):
  K4_bf16 / K7_bf16 : raw kernels, pre-cast bf16 inputs (pure kernel floor)
  PK4 / PK7         : prep + kernel
  E4 / E7           : full fused_residual_losses (version=4 vs 7)
  STEP4 / STEP7     : full production 'kernel' train step (kernel_version)

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_v4s.py
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
        extract_decode_weights, fuse_decode_weights, fuse_v6_from_v4,
        fused_decode_jvp_v4s, fused_decode_jvp_v4t, pe_and_tangents,
        trig_cm_inputs)
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe_flat
    from deepphysinet_tpu.physics.engine import fused_residual_losses
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import (
        Batch, PointBatch, StepConfig, create_train_state, make_train_step)

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
    bf = jnp.bfloat16

    tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
    w = extract_decode_weights(model, params, tokens[0], fh_norm)
    fw4 = fuse_decode_weights(w)
    fw6 = fuse_v6_from_v4(fw4, coord_spec)
    pe, dpe = pe_and_tangents(coords, coord_spec, dtype=bf)
    pe_cm = trig_cm_inputs(coords, coord_spec, dtype=bf)
    cd_pe = sinecos_pe_flat(nwp, cd_freqs, dtype=bf)
    ref_t = nwp.T
    jax.block_until_ready((fw4, fw6, pe, dpe, pe_cm, cd_pe, ref_t))

    def k4_fn(a, b, c, r):
        p, t = fused_decode_jvp_v4t(fw4, a, b, c, r, compute_dtype=bf)
        return p.sum() + t.sum()

    def k7_fn(a, c, r):
        p, t = fused_decode_jvp_v4s(fw6, a, c, r, compute_dtype=bf)
        return p.sum() + t.sum()

    def pk4_fn(coords, nwp):
        pe, dpe = pe_and_tangents(coords, coord_spec, dtype=bf)
        cd = sinecos_pe_flat(nwp, cd_freqs, dtype=bf)
        p, t = fused_decode_jvp_v4t(fw4, pe, dpe, cd, nwp.T, compute_dtype=bf)
        return p.sum() + t.sum()

    def pk7_fn(coords, nwp):
        pe_cm = trig_cm_inputs(coords, coord_spec, dtype=bf)
        cd = sinecos_pe_flat(nwp, cd_freqs, dtype=bf)
        p, t = fused_decode_jvp_v4s(fw6, pe_cm, cd, nwp.T, compute_dtype=bf)
        return p.sum() + t.sum()

    def e_fn(version):
        def f(params):
            tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
            return fused_residual_losses(
                model, params, tokens[0], coords, nwp, fh_norm, coriolis_f,
                coord_spec, obs_specs, factors, version=version)["total"]
        return f

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
        ("K4_bf16", jax.jit(k4_fn), (pe, dpe, cd_pe, ref_t)),
        ("K7_bf16", jax.jit(k7_fn), (pe_cm, cd_pe, ref_t)),
        ("PK4    ", jax.jit(pk4_fn), (coords, nwp)),
        ("PK7    ", jax.jit(pk7_fn), (coords, nwp)),
        ("E4     ", jax.jit(e_fn(4)), (params,)),
        ("E7     ", jax.jit(e_fn(7)), (params,)),
    ]
    for name, fn, args in rungs:
        t = median_slope(fn, args)
        print(f"{name}: {t*1e3:.3f} ms @ {n} pts = {n/t/1e6:.2f}M/s "
              f"(chk {float(fn(*args)):.6g})", flush=True)

    # ---- full production train step A/B (bench geometry) ----
    batch = Batch(field=field, forecast_h=jnp.asarray([24.0], jnp.float32),
                  margin=pts(20480), inter=pts(4096))

    for kv in (4, 7):
        scfg = StepConfig(coord_spec=coord_spec, obs_specs=obs_specs,
                          loss_factor=factors, pde_engine="kernel",
                          kernel_version=kv)
        step = make_train_step(model, tx, scfg)
        st = create_train_state(model, tx, jax.random.PRNGKey(0), init_batch)

        def run_step():
            nonlocal st
            st, m = step(st, batch, with_pde=True)
            return m["total_loss"]

        def timed_step(k):
            t0 = time.monotonic()
            out = None
            for _ in range(k):
                out = run_step()
            _ = float(out)
            return time.monotonic() - t0

        timed_step(1)
        timed_step(30)
        full = statistics.median(
            (timed_step(220) - timed_step(20)) / 200 for _ in range(5))
        print(f"STEP{kv}: {full*1e3:.3f} ms (chk {float(run_step()):.6g})",
              flush=True)


if __name__ == "__main__":
    main()

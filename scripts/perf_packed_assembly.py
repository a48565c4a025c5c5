"""A/B the packed residual assembly on real TPU (round 4 (d)).

Two measurements, bench geometry (B=1, 20480 margin + 4096 inter, flagship
dims), warmup + median-of-5:

  1. P2-style scan-slope grad program (fwd+bwd kernels + assembly backward),
     dict vs packed assembly -- isolates the assembly-backward delta that
     scripts/perf_bwd_breakdown.py located (~1.0 ms).
  2. Full production 'kernel' train step per-call, packed_assembly on/off.

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_packed_assembly.py
"""

from __future__ import annotations

import statistics
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    import os

    from deepphysinet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(os.environ.get("DPN_XLA_CACHE", "/tmp/dpn_xla_cache"))

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.decode_kernel import (
        extract_decode_weights, fuse_decode_weights, fused_decode_jvp_v4_kbwd,
        pe_and_tangents)
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe
    from deepphysinet_tpu.physics.engine import (
        fields_from_primal_tangents, packed_residual_losses_from_primal_tangents,
        residual_losses_from_fields)
    from deepphysinet_tpu.train.losses import build_loss
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
    B, n_margin, n_inter = 1, 20480, 4096

    def pts(n):
        return PointBatch(
            x=jnp.asarray(rng.rand(B, n) * 27000 * (lon_size - 1), jnp.float32),
            y=jnp.asarray(rng.rand(B, n) * 27000 * (lat_size - 1), jnp.float32),
            t=jnp.asarray(rng.randint(0, 25, (B, n)) * 3600.0, jnp.float32),
            f=jnp.asarray(1e-4 * rng.rand(B, n, 1), jnp.float32),
            nwp=jnp.asarray(rng.randn(B, n, 6) * 0.1, jnp.float32),
            labels=jnp.asarray(rng.randn(B, n, 6) * 0.1, jnp.float32),
        )

    batch = Batch(
        field=jnp.asarray(rng.randn(B, 159, 2405) * 0.5, jnp.float32),
        forecast_h=jnp.asarray([24.0], jnp.float32),
        margin=pts(n_margin), inter=pts(n_inter),
    )
    tx = build_optimizer("Adam", lr=1e-4, weight_decay=1e-4)
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    jax.block_until_ready(state0.params)
    fh_enc = jnp.asarray([[24.0 / 360.0]], jnp.float32)
    fh_norm = jnp.asarray([24.0 / 360.0], jnp.float32)

    in_ch = net["in_channels"]
    cd_freqs = make_freq_bands(in_ch // 2 // 6, max_freq=4.0)

    def kin(p):
        coords = jnp.stack([p.x[0], p.y[0], p.t[0]], -1)
        pe, dpe = pe_and_tangents(coords, coord_spec)
        return pe, dpe, sinecos_pe(p.nwp[0], cd_freqs, include_input=False), p.nwp[0]

    m_in, i_in = kin(batch.margin), kin(batch.inter)
    tokens0 = jax.jit(lambda p: model.apply(p, batch.field, fh_enc,
                                            method=PhysicsNet.encode))(state0.params)
    fw0 = jax.jit(lambda p: fuse_decode_weights(extract_decode_weights(
        model, p, tokens0[0], fh_norm)))(state0.params)
    jax.block_until_ready((fw0, m_in, i_in))

    pred_loss_fn = build_loss("WeightSmoothL1Loss", beta=0.1)

    def p2_loss(fw, packed):
        out = jnp.zeros(())
        for p, (pe, dpe, cdpe, ref) in ((batch.margin, m_in), (batch.inter, i_in)):
            primal, tang = fused_decode_jvp_v4_kbwd(fw, pe, dpe, cdpe, ref)
            if packed:
                losses = packed_residual_losses_from_primal_tangents(
                    primal, tang, p.f[0], obs_specs, factors)
            else:
                fd = fields_from_primal_tangents(primal, tang, obs_specs, True)
                losses = residual_losses_from_fields(fd, p.f[0], factors)
            out = out + losses["total"]
            if p is batch.margin:
                out = out + (pred_loss_fn(primal, p.labels[0])
                             * factors["margin_factor"])
        return out

    def scan_grad(k, packed):
        def f(a):
            def body(c, _):
                g = jax.grad(lambda fw: p2_loss(fw, packed))(
                    jax.tree.map(lambda x: x * (1.0 + c), a))
                s = sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(g))
                return (s * 1e-20).astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
            return c[None]
        return f

    def median_slope(fn, args, reps=5, k1=4, k2=16):
        def timed(k):
            t0 = time.monotonic()
            out = None
            for _ in range(k):
                out = fn(*args)
            _ = float(jax.tree.leaves(out)[0].ravel()[0])
            return time.monotonic() - t0

        t0 = time.monotonic()
        timed(1)
        print(f"  compiled in {time.monotonic()-t0:.0f}s", flush=True)
        timed(10)
        return statistics.median((timed(k2) - timed(k1)) / (k2 - k1)
                                 for _ in range(reps))

    for packed in (False, True):
        t1 = median_slope(jax.jit(scan_grad(4, packed)), (fw0,))
        t2 = median_slope(jax.jit(scan_grad(16, packed)), (fw0,))
        print(f"P2 grad(+assembly) packed={packed}: {(t2-t1)/12*1e3:.3f} ms/iter",
              flush=True)

    # ---- full production step per-call, median-of-5 ----
    def step_time(packed):
        kcfg = StepConfig(coord_spec=coord_spec, obs_specs=obs_specs,
                          loss_factor=factors, pde_engine="kernel",
                          packed_assembly=packed)
        step = make_train_step(model, tx, kcfg)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
        t0 = time.monotonic()
        state, m = step(state, batch, with_pde=True)
        jax.block_until_ready(m["total_loss"])
        print(f"  step compiled in {time.monotonic()-t0:.0f}s", flush=True)
        for _ in range(10):
            state, m = step(state, batch, with_pde=True)
        jax.block_until_ready(m["total_loss"])

        def run(k):
            nonlocal state
            t0 = time.monotonic()
            for _ in range(k):
                state, m = step(state, batch, with_pde=True)
            jax.block_until_ready(m["total_loss"])
            return time.monotonic() - t0

        run(5)
        med = statistics.median((run(40) - run(10)) / 30 for _ in range(5))
        print(f"full 'kernel' step packed={packed}: {med*1e3:.3f} ms "
              f"(loss {float(m['total_loss']):.6g})", flush=True)

    step_time(False)
    step_time(True)


if __name__ == "__main__":
    main()

"""MFU-grounded time budget of the production training step (VERDICT r3 #2).

Ladder of jitted programs on the real TPU, each adding one stage of the
'kernel'-engine step at bench geometry (B=1, margin 20480 + inter 4096);
stage times are ladder differences (median-of-5 slopes).  FLOPs come from
XLA cost analysis of pure-XLA TWIN programs (pde_engine='jvp' math ==
kernel math, parity-tested) because Pallas custom calls are opaque to the
counter; the decode kernel row is cross-checked against the analytic
~4.94 MFLOP/pt formula (utils/flops.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_step_budget.py
"""

from __future__ import annotations

import statistics
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    import os

    # persist compiles across runs: the tunnel's compile service has slow
    # periods; a cached executable skips it entirely on re-runs
    from deepphysinet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(os.environ.get("DPN_XLA_CACHE", "/tmp/dpn_xla_cache"))

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.physics.engine import fused_kernel_fields, jvp_fields
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import (
        Batch, PointBatch, StepConfig, create_train_state, make_loss_fn,
        make_train_step)
    from deepphysinet_tpu.utils.flops import (
        chip_peak_flops, compiled_flops, decode_jvp_v4_flops_per_point)

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
        margin=pts(n_margin),
        inter=pts(n_inter),
    )
    tx = build_optimizer("Adam", lr=1e-4, weight_decay=1e-4)
    t0 = time.monotonic()
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    jax.block_until_ready(state.params)
    print(f"init: {time.monotonic()-t0:.0f}s", flush=True)
    fh_enc = jnp.asarray([[24.0 / 360.0]], jnp.float32)
    fh_norm = jnp.asarray([24.0 / 360.0], jnp.float32)

    kcfg = StepConfig(coord_spec=coord_spec, obs_specs=obs_specs,
                      loss_factor=factors, pde_engine="kernel")
    jcfg = StepConfig(coord_spec=coord_spec, obs_specs=obs_specs,
                      loss_factor=factors, pde_engine="jvp")

    def median_slope(fn, args, reps=5, k1=20, k2=220):
        def timed(k):
            t0 = time.monotonic()
            out = None
            for _ in range(k):
                out = fn(*args)
            _ = float(jax.tree.leaves(out)[0].ravel()[0])
            return time.monotonic() - t0

        t0 = time.monotonic()
        _ = timed(1)  # compile
        print(f"  compiled in {time.monotonic()-t0:.0f}s", flush=True)
        timed(30)     # warmup: absorb post-compile tunnel stalls
        return statistics.median((timed(k2) - timed(k1)) / (k2 - k1)
                                 for _ in range(reps))

    # ---- ladder rungs (production Pallas path) ----
    @jax.jit
    def r1_encode(params):
        return model.apply(params, batch.field, fh_enc,
                           method=PhysicsNet.encode).sum()[None]

    @jax.jit
    def r2_prep(params):
        from deepphysinet_tpu.ops.decode_kernel import (
            extract_decode_weights, fuse_decode_weights)
        tokens = model.apply(params, batch.field, fh_enc, method=PhysicsNet.encode)
        fw = fuse_decode_weights(extract_decode_weights(
            model, params, tokens[0], fh_norm))
        return sum(jnp.sum(x) for x in jax.tree.leaves(fw))[None]

    def _decode_both(params, engine_cfg):
        tokens = model.apply(params, batch.field, fh_enc, method=PhysicsNet.encode)
        out = jnp.zeros(())
        for p in (batch.margin, batch.inter):
            coords = jnp.stack([p.x[0], p.y[0], p.t[0]], -1)
            if engine_cfg.pde_engine == "kernel":
                primal, fd = fused_kernel_fields(
                    model, params, tokens[0], coords, p.nwp[0], fh_norm,
                    coord_spec, obs_specs, with_clip=True)
            else:
                primal, fd = jvp_fields(
                    model, params, tokens[0], coords, p.nwp[0], fh_norm,
                    coord_spec, obs_specs, with_clip=True)
            out = out + primal.sum() + sum(jnp.sum(v) for v in
                                           jax.tree.leaves(fd))
        return out[None]

    r3_decode = jax.jit(lambda params: _decode_both(params, kcfg))

    loss_k = make_loss_fn(model, kcfg)
    r4_fwd = jax.jit(lambda params: loss_k(params, batch, True)[0][None])

    grad_k = jax.value_and_grad(loss_k, has_aux=True)
    r5_grad = jax.jit(
        lambda params: grad_k(params, batch, True)[0][0][None])

    step_k = make_train_step(model, tx, kcfg)

    times = {}
    for name, fn, args in (
        ("encode", r1_encode, (state.params,)),
        ("encode+prep", r2_prep, (state.params,)),
        ("encode+prep+decode_fwd", r3_decode, (state.params,)),
        ("fwd_losses", r4_fwd, (state.params,)),
        ("fwd+bwd", r5_grad, (state.params,)),
    ):
        times[name] = median_slope(fn, args)
        print(f"{name}: {times[name]*1e3:.3f} ms", flush=True)

    # full step (donates state -> time it via its own loop)
    def run_step():
        nonlocal state
        state, m = step_k(state, batch, with_pde=True)
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
    times["full_step"] = statistics.median(
        (timed_step(220) - timed_step(20)) / 200 for _ in range(5))
    print(f"full_step: {times['full_step']*1e3:.3f} ms", flush=True)

    # ---- FLOPs: XLA twins (pure-XLA jvp math == kernel math) ----
    loss_j = make_loss_fn(model, jcfg)
    grad_j = jax.value_and_grad(loss_j, has_aux=True)
    step_j = jax.jit(
        __import__("deepphysinet_tpu.train.train_step",
                   fromlist=["make_train_step_impl"]).make_train_step_impl(
            model, tx, jcfg),
        static_argnames=("with_pde",))
    flops = {
        "encode": compiled_flops(r1_encode, state.params),
        "encode+prep": compiled_flops(r2_prep, state.params),
        "encode+prep+decode_fwd": compiled_flops(
            jax.jit(lambda params: _decode_both(params, jcfg)), state.params),
        "fwd_losses": compiled_flops(
            jax.jit(lambda params: loss_j(params, batch, True)[0][None]),
            state.params),
        "fwd+bwd": compiled_flops(
            jax.jit(lambda params: grad_j(params, batch, True)[0][0][None]),
            state.params),
        "full_step": compiled_flops(step_j, state, batch, with_pde=True),
    }
    for k, v in flops.items():
        print(f"flops[{k}] = {v/1e9:.2f} GFLOP", flush=True)

    analytic_decode = (n_margin + n_inter) * decode_jvp_v4_flops_per_point(
        net["in_channels"], net["hidden_channels"])
    print(f"analytic decode fwd: {analytic_decode/1e9:.2f} GFLOP", flush=True)

    peak = chip_peak_flops()
    print(f"chip peak: {peak/1e12:.0f} TF/s", flush=True)

    # ---- budget table ----
    rows = [
        ("encode (287 tok)", times["encode"], flops["encode"]),
        ("weight prep", times["encode+prep"] - times["encode"],
         flops["encode+prep"] - flops["encode"]),
        ("decode fwd 24576 pts", times["encode+prep+decode_fwd"] - times["encode+prep"],
         flops["encode+prep+decode_fwd"] - flops["encode+prep"]),
        ("assembly+losses", times["fwd_losses"] - times["encode+prep+decode_fwd"],
         flops["fwd_losses"] - flops["encode+prep+decode_fwd"]),
        ("backward", times["fwd+bwd"] - times["fwd_losses"],
         flops["fwd+bwd"] - flops["fwd_losses"]),
        ("adam+clip+metrics", times["full_step"] - times["fwd+bwd"],
         flops["full_step"] - flops["fwd+bwd"]),
        ("FULL STEP", times["full_step"], flops["full_step"]),
    ]
    print(f"{'stage':26s} {'us':>9s} {'GFLOP':>8s} {'TF/s':>7s} {'MFU%':>6s}",
          flush=True)
    for name, t, f in rows:
        tf = f / t / 1e12 if t > 0 else float("nan")
        m = f / t / peak * 100 if t > 0 else float("nan")
        print(f"{name:26s} {t*1e6:9.0f} {f/1e9:8.2f} {tf:7.1f} {m:6.1f}",
              flush=True)


if __name__ == "__main__":
    main()

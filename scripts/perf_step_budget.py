"""MFU-grounded time budget of the production training step (VERDICT r3 #2).

Methodology (v2): per-call ladder differences are USELESS here -- a null
jitted program measures ~1.35 ms/call through the axon tunnel (host dispatch
floor), so every sub-1.5 ms stage is dispatch-bound and rung differences go
negative.  Instead each stage is repeated K times INSIDE one jitted program
via ``lax.scan`` (carry-perturbed input so iterations serialize and cannot be
CSE'd), the program is wall-timed with the stall-robust median-of-5 slope,
and the per-iteration device time is the slope between a K1- and K2-iteration
build of the same program: (t_K2 - t_K1) / (K2 - K1).  Dispatch cost is paid
once per call and cancels exactly.

FLOPs come from XLA cost analysis of pure-XLA TWIN programs (pde_engine='jvp'
math == kernel math, parity-tested) because Pallas custom calls are opaque to
the counter; the decode row is cross-checked against the analytic
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
        Batch, PointBatch, StepConfig, apply_gradient_update, create_train_state,
        make_loss_fn, make_train_step, make_train_step_impl)
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

    def median_slope(fn, args, reps=5, k1=5, k2=45):
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
        timed(10)     # warmup: absorb post-compile tunnel stalls
        return statistics.median((timed(k2) - timed(k1)) / (k2 - k1)
                                 for _ in range(reps))

    # ---- stage bodies (production Pallas path), scan-K builders ----------
    # Each body consumes the scan carry through a tiny input perturbation so
    # the K iterations form a serial chain (no CSE, no overlap beyond what a
    # single step's program enjoys anyway).
    tokens0 = jax.jit(lambda p: model.apply(p, batch.field, fh_enc,
                                            method=PhysicsNet.encode))(state.params)

    def scan_encode(k):
        def f(params):
            def body(c, _):
                tok = model.apply(params, batch.field + c, fh_enc,
                                  method=PhysicsNet.encode)
                return (tok.mean() * 1e-20).astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
            return c[None]
        return f

    def scan_prep(k):
        from deepphysinet_tpu.ops.decode_kernel import (
            extract_decode_weights, fuse_decode_weights)

        def f(params, tokens):
            def body(c, _):
                fw = fuse_decode_weights(extract_decode_weights(
                    model, params, tokens[0] + c, fh_norm))
                s = sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(fw))
                return s * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
            return c[None]
        return f

    def _decode_both(params, tokens_b, engine_cfg):
        out = jnp.zeros(())
        for p in (batch.margin, batch.inter):
            coords = jnp.stack([p.x[0], p.y[0], p.t[0]], -1)
            if engine_cfg.pde_engine == "kernel":
                primal, fd = fused_kernel_fields(
                    model, params, tokens_b, coords, p.nwp[0], fh_norm,
                    coord_spec, obs_specs, with_clip=True)
            else:
                primal, fd = jvp_fields(
                    model, params, tokens_b, coords, p.nwp[0], fh_norm,
                    coord_spec, obs_specs, with_clip=True)
            out = out + primal.sum()
            out = out + sum(jnp.sum(v) for v in fd.fields.values())
            out = out + sum(jnp.sum(v) for d in fd.derivs.values()
                            for v in d.values())
        return out

    def scan_decode(k, engine_cfg):
        def f(params, tokens):
            def body(c, _):
                s = _decode_both(params, tokens[0] + c, engine_cfg)
                return (s * 1e-20).astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
            return c[None]
        return f

    loss_k = make_loss_fn(model, kcfg)

    def scan_loss(k):
        def f(params):
            def body(c, _):
                total, _aux = loss_k(params, batch._replace(
                    field=batch.field + c), True)
                return (total * 1e-20).astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
            return c[None]
        return f

    grad_k = jax.value_and_grad(loss_k, has_aux=True)
    step_impl_k = make_train_step_impl(model, tx, kcfg)

    def scan_step(k):
        # full step body (fwd + backward + clip + adam + metrics) in-scan,
        # carrying the train state -- the natural serial chain.  (A scan of
        # bare value_and_grad hit a pathological >25 min compile on the
        # tunnel; the full step body compiles fine.)
        def f(state0):
            def body(st, _):
                st2, _m = step_impl_k(st, batch, True)
                return st2, ()
            st, _ = jax.lax.scan(body, state0, None, length=k)
            return st
        return f

    grads0 = jax.jit(lambda p: grad_k(p, batch, True)[1])(state.params)
    jax.block_until_ready(grads0)

    def scan_adam(k):
        def f(state0, grads):
            def body(st, _):
                g = jax.tree.map(
                    lambda x: x * (1.0 + 1e-12 * st.step.astype(x.dtype)), grads)
                st2, _m = apply_gradient_update(tx, kcfg, st, g, {})
                return st2, ()
            st, _ = jax.lax.scan(body, state0, None, length=k)
            # return the FULL state: a step-only output lets XLA DCE the
            # params/opt_state update chain out of the loop
            return st
        return f

    # ---- time each stage via the K1/K2 in-jit repetition slope ----------
    stages = {}
    for name, builder, args, (K1, K2) in (
        ("encode", scan_encode, (state.params,), (16, 128)),
        ("prep", scan_prep, (state.params, tokens0), (16, 128)),
        ("prep+decode", lambda k: scan_decode(k, kcfg), (state.params, tokens0), (4, 16)),
        ("loss", scan_loss, (state.params,), (4, 16)),
        ("step", scan_step, (state,), (4, 16)),
        ("adam", scan_adam, (state, grads0), (8, 64)),
    ):
        t1 = median_slope(jax.jit(builder(K1)), args)
        t2 = median_slope(jax.jit(builder(K2)), args)
        stages[name] = (t2 - t1) / (K2 - K1)
        print(f"{name}: {stages[name]*1e3:.3f} ms/iter "
              f"(K{K1} {t1*1e3:.2f} ms, K{K2} {t2*1e3:.2f} ms)", flush=True)

    # full production step (donates state -> time it via its own loop)
    step_k = make_train_step(model, tx, kcfg)

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
    full_step = statistics.median(
        (timed_step(220) - timed_step(20)) / 200 for _ in range(5))
    print(f"full_step: {full_step*1e3:.3f} ms", flush=True)

    # ---- FLOPs: XLA twins (pure-XLA jvp math == kernel math) ----
    loss_j = make_loss_fn(model, jcfg)
    grad_j = jax.value_and_grad(loss_j, has_aux=True)
    step_impl_j = make_train_step_impl(model, tx, jcfg)
    flops = {
        "encode": compiled_flops(
            lambda p: model.apply(p, batch.field, fh_enc,
                                  method=PhysicsNet.encode).sum(), state.params),
        "prep": compiled_flops(scan_prep(1), state.params, tokens0),
        "prep+decode": compiled_flops(
            lambda p, t: _decode_both(p, t[0], jcfg), state.params, tokens0),
        "loss": compiled_flops(lambda p: loss_j(p, batch, True)[0], state.params),
        "grad": compiled_flops(
            lambda p: (lambda r: r[0][0] + sum(jnp.sum(g) for g in
                                               jax.tree.leaves(r[1])))(
                grad_j(p, batch, True)), state.params),
        "adam": compiled_flops(
            lambda st, g: apply_gradient_update(tx, kcfg, st, g, {})[0],
            state, grads0),
        "full_step": compiled_flops(
            lambda st, b: step_impl_j(st, b, True), state, batch),
    }
    for k, v in flops.items():
        print(f"flops[{k}] = {v/1e9:.2f} GFLOP", flush=True)

    analytic_decode = (n_margin + n_inter) * decode_jvp_v4_flops_per_point(
        net["in_channels"], net["hidden_channels"])
    print(f"analytic decode fwd (v4 algebra): {analytic_decode/1e9:.2f} GFLOP",
          flush=True)

    peak = chip_peak_flops()
    print(f"chip peak: {peak/1e12:.0f} TF/s", flush=True)

    # ---- budget table ----
    rows = [
        ("encode (287 tok)", stages["encode"], flops["encode"]),
        ("weight prep", stages["prep"], flops["prep"]),
        ("decode fwd 24576 pts", stages["prep+decode"] - stages["prep"],
         flops["prep+decode"] - flops["prep"]),
        ("assembly+losses", stages["loss"] - stages["prep+decode"] - stages["encode"],
         flops["loss"] - flops["prep+decode"] - flops["encode"]),
        ("backward", stages["step"] - stages["loss"] - stages["adam"],
         flops["grad"] - flops["loss"]),
        ("adam+clip", stages["adam"], flops["adam"]),
        # telescoping: E + P + (PD-P) + (L-PD-E) + (step-L-adam) + adam = step
        ("SUM of stages (= step in-scan)", stages["step"], flops["full_step"]),
        ("FULL STEP (measured)", full_step, flops["full_step"]),
    ]
    print(f"{'stage':26s} {'us':>9s} {'GFLOP':>8s} {'TF/s':>7s} {'MFU%':>6s}",
          flush=True)
    for name, t, f in rows:
        tf = f / t / 1e12 if t > 0 else float("nan")
        m = f / t / peak * 100 if t > 0 else float("nan")
        print(f"{name:26s} {t*1e6:9.0f} {f/1e9:8.2f} {tf:7.1f} {m:6.1f}",
              flush=True)
    print(f"per-call overhead (full_step - in-scan step): "
          f"{(full_step - stages['step'])*1e6:.0f} us", flush=True)


if __name__ == "__main__":
    main()

"""A/B the var-major (v4t) kernel IO on real TPU (round 4 (g)).

Round 4 (d)-(f) located two costs the [N, 6] row layout pays:
  - in-kernel: each variable's lane-major row is relayouted to a [Nb, 1]
    column before the stack (the residual kernel's row-vs-column epilogue
    A/B measured that at ~16%);
  - at the custom-vjp seam: lane-padded [N, 6] primal/tangent buffers
    (6 of 128 lanes used) crossing the boundary and their XLA-side
    transposes in the packed assembly.

The v4t family emits primal [6, N] / tangents [3, 6, N] natively and the
packed assembly consumes them var-major. Two measurements, bench geometry,
warmup + median-of-5 slopes:

  1. fwd-only residual eval @ 40960 pts (the headline bench workload):
     production v4 path vs v4t + packed-t assembly.
  2. full production 'kernel' train step: StepConfig.var_major off vs on.

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_varmajor_ab.py
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
        extract_decode_weights, fuse_decode_weights, fused_decode_jvp_v4,
        fused_decode_jvp_v4t, pe_and_tangents)
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe
    from deepphysinet_tpu.physics.engine import (
        fields_from_primal_tangents, packed_residual_losses_from_primal_tangents_t,
        residual_losses_from_fields)
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

    # ---- 1. fwd-only residual eval @ bench geometry ----
    n_eval = 40960
    coords = jnp.asarray(np.stack([
        rng.rand(n_eval) * 27000 * (lon_size - 1),
        rng.rand(n_eval) * 27000 * (lat_size - 1),
        rng.randint(0, 25, n_eval) * 3600.0,
    ], axis=-1), jnp.float32)
    coriolis_f = jnp.asarray(1e-4 * rng.rand(n_eval, 1), jnp.float32)
    nwp_eval = jnp.asarray(rng.randn(n_eval, 6) * 0.1, jnp.float32)
    in_ch = net["in_channels"]
    cd_freqs = make_freq_bands(in_ch // 2 // 6, max_freq=4.0)

    def eval_fn(var_major):
        def f(params):
            tokens = model.apply(params, batch.field, fh_enc,
                                 method=PhysicsNet.encode)
            w = extract_decode_weights(model, params, tokens[0], fh_norm)
            pe, dpe = pe_and_tangents(coords, coord_spec)
            cd_pe = sinecos_pe(nwp_eval, cd_freqs, include_input=False)
            fw = fuse_decode_weights(w)
            if var_major:
                primal, tang = fused_decode_jvp_v4t(
                    fw, pe, dpe, cd_pe, nwp_eval.T,
                    compute_dtype=model.compute_dtype)
                return packed_residual_losses_from_primal_tangents_t(
                    primal, tang, coriolis_f, obs_specs, factors)["total"]
            primal, tang = fused_decode_jvp_v4(
                fw, pe, dpe, cd_pe, nwp_eval, compute_dtype=model.compute_dtype)
            fd = fields_from_primal_tangents(primal, tang, obs_specs, True)
            return residual_losses_from_fields(fd, coriolis_f, factors)["total"]
        return jax.jit(f)

    def median_slope_call(fn, args, reps=5, k1=50, k2=350):
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
        timed(60)
        return statistics.median((timed(k2) - timed(k1)) / (k2 - k1)
                                 for _ in range(reps))

    for vm in (False, True):
        fn = eval_fn(vm)
        t = median_slope_call(fn, (state0.params,))
        print(f"fwd eval var_major={vm}: {t*1e3:.3f} ms @ {n_eval} pts "
              f"= {n_eval/t/1e6:.2f}M evals/s (loss "
              f"{float(fn(state0.params)):.6g})", flush=True)

    # ---- 2. full production 'kernel' step ----
    def step_time(var_major):
        kcfg = StepConfig(coord_spec=coord_spec, obs_specs=obs_specs,
                          loss_factor=factors, pde_engine="kernel",
                          var_major=var_major)
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
        print(f"full 'kernel' step var_major={var_major}: {med*1e3:.3f} ms "
              f"(loss {float(m['total_loss']):.6g})", flush=True)

    step_time(False)
    step_time(True)


if __name__ == "__main__":
    main()

"""Benchmark: collocation-point PDE-residual evaluation throughput per chip.

The north-star metric (BASELINE.json: >=10M evals/s/chip on v5e) counts
**residual evaluations**: computing all six primitive-equation residuals at a
collocation point, i.e. the forward-mode engine's primal decode + 3 tangent
passes + residual assembly through the flagship PhysicsNet's hypernet decode
(physics/engine.py).  That is the workload the reference implements with 19
reverse-mode autograd graphs per batch (interface_physics.py:285-299).

The full training step (residuals at margin+inter points + data loss +
parameter gradient + Adam) is timed too and reported on stderr as context --
it carries ~6x the FLOPs of pure residual evaluation, so its evals/s is
intrinsically lower.

Timing is slope-based: wall time of K2 iterations minus wall time of K1, each
ended by one scalar device fetch.  On tunneled TPU backends a D2H fetch can
cost tens of seconds; differencing cancels that constant, so the slope is pure
compute time.  The tunnel also has rare multi-second stalls (usually right
after a fresh compile) that poison any single slope sample, so every
measurement takes a warmup run first and the median of several slope
replicates (replicate count adapts to the measured fetch cost so the whole
bench stays inside its time budget on slow-tunnel days).

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import (
        Batch,
        PointBatch,
        StepConfig,
        create_train_state,
        make_train_step,
    )
    import os

    cfg_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
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
        # production default: fused Pallas fwd+bwd on TPU (docs/PERF.md)
        pde_engine="kernel" if jax.default_backend() == "tpu" else "jvp",
    )
    tx = build_optimizer("Adam", lr=1e-4, weight_decay=1e-4)

    B = 1
    n_margin = int(cfg["train_cfg"]["train_data"]["label_batch_size"])  # 20480
    n_inter = int(cfg["train_cfg"]["train_data"]["batch_size_inter"])  # 4096
    rng = np.random.RandomState(0)

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
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, tx, step_cfg)

    # ---- primary: pure residual-evaluation engine ----
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.physics.engine import (
        fused_residual_losses, pde_residual_losses)
    from deepphysinet_tpu.train.point_fn import make_phys_fn

    use_kernel = jax.default_backend() == "tpu"
    n_eval = 40960  # residual-eval batch: on the measured throughput plateau
    # (docs/PERF.md batch-size curves: in the shipping v4s regime the plateau
    # is flat 24K-131K within +/-1% -- the v4-era >49K cliff was the
    # lane-padded [3, N, 6] tangent-output traffic, cured by var-major IO;
    # rounds 4 (i) + 5 (g))
    coords = jnp.asarray(
        np.stack([
            rng.rand(n_eval) * 27000 * (lon_size - 1),
            rng.rand(n_eval) * 27000 * (lat_size - 1),
            rng.randint(0, 25, n_eval) * 3600.0,
        ], axis=-1), jnp.float32)
    coriolis_f = jnp.asarray(1e-4 * rng.rand(n_eval, 1), jnp.float32)
    nwp_eval = jnp.asarray(rng.randn(n_eval, 6) * 0.1, jnp.float32)
    fh_norm = jnp.asarray([24.0 / 360.0], jnp.float32)
    factors = dict(cfg["train_cfg"]["losses"]["loss_factor"])

    @jax.jit
    def residual_eval(params, coords, nwp, f):
        tokens = model.apply(params, batch.field, jnp.asarray([[24.0 / 360.0]]),
                             method=PhysicsNet.encode)
        if use_kernel:  # fused Pallas path (split or in-kernel assembly by N;
            # ops/decode_kernel.py + ops/residual_kernel.py)
            return fused_residual_losses(
                model, params, tokens[0], coords, nwp, fh_norm, f,
                step_cfg.coord_spec, step_cfg.obs_specs, factors,
                with_clip=True, version=step_cfg.kernel_version)["total"]
        phys_fn = make_phys_fn(model, params, tokens[0], nwp, fh_norm,
                               step_cfg.coord_spec, step_cfg.obs_specs, with_clip=True)
        return pde_residual_losses(phys_fn, coords, f, factors)["total"]

    _ = float(residual_eval(state.params, coords, nwp_eval, coriolis_f))  # compile
    t0 = time.monotonic()
    _ = float(residual_eval(state.params, coords, nwp_eval, coriolis_f))
    fetch_cost = time.monotonic() - t0  # ~0.03 s direct, 30-70 s tunneled
    # 3 is the floor: a median of 2 is a mean, which a single stall still
    # shifts by half its size -- slow-fetch days are exactly stall days
    eval_reps = 5 if fetch_cost < 5.0 else 3

    def timed_eval(k: int) -> float:
        t0 = time.monotonic()
        out = None
        for _ in range(k):
            out = residual_eval(state.params, coords, nwp_eval, coriolis_f)
        _ = float(out)
        return time.monotonic() - t0

    import statistics

    def median_slope(timed, reps: int, k1: int = 50, k2: int = 1050) -> float:
        timed(60)  # warmup: absorb post-compile tunnel stalls
        return statistics.median(
            (timed(k2) - timed(k1)) / (k2 - k1) for _ in range(reps))

    eval_time = median_slope(timed_eval, eval_reps)
    evals_per_sec = n_eval / max(eval_time, 1e-9)

    # ---- secondary: full training step (stderr context) ----
    state, m = step(state, batch, with_pde=True)
    _ = float(m["total_loss"])  # compile + sync

    def timed_run(k: int) -> float:
        nonlocal state
        t0 = time.monotonic()
        for _ in range(k):
            state, m = step(state, batch, with_pde=True)
        _ = float(m["total_loss"])  # one fetch forces the whole chain
        return time.monotonic() - t0

    # stderr context only (not the reported metric): one slope is acceptable
    # on slow-fetch days to keep the bench inside its time budget; fast days
    # get the same median-of-5 stall-robust protocol as the headline metric
    # (round-3 VERDICT weak #8)
    step_reps = 5 if fetch_cost < 5.0 else 1
    step_time = median_slope(timed_run, step_reps, k1=20, k2=220)
    train_evals = (n_margin + n_inter) * B / max(step_time, 1e-9)

    # ---- MFU: XLA-counted FLOPs of the pure-XLA twin (same collapsed-v4
    # math as the Pallas path, which the counter can't see into) vs chip peak
    mfu_note = ""
    try:
        from deepphysinet_tpu.physics.engine import (
            jvp_fields, residual_losses_from_fields)
        from deepphysinet_tpu.utils.flops import chip_peak_flops, compiled_flops

        def eval_twin(params, coords, nwp, f):
            tokens = model.apply(params, batch.field,
                                 jnp.asarray([[24.0 / 360.0]]),
                                 method=PhysicsNet.encode)
            _, fd = jvp_fields(model, params, tokens[0], coords, nwp, fh_norm,
                               step_cfg.coord_spec, step_cfg.obs_specs,
                               with_clip=True)
            return residual_losses_from_fields(fd, coriolis_f, factors)["total"]

        peak = chip_peak_flops()
        if peak:
            fl = compiled_flops(eval_twin, state.params, coords, nwp_eval,
                                coriolis_f)
            mfu = fl / eval_time / peak
            mfu_note = (f"; eval {fl/1e9:.1f} GFLOP -> "
                        f"{fl/eval_time/1e12:.1f} TF/s = {mfu*100:.1f}% MFU "
                        f"(peak {peak/1e12:.0f} TF/s)")
    except Exception as e:  # cost analysis is best-effort context
        mfu_note = f"; MFU unavailable ({type(e).__name__})"

    # (engine comparison at this geometry, docs/PERF.md: jvp 8.93 ms <
    # linearize 9.24 ms < kernel-trainable 11.2 ms; training defaults to jvp)
    # reps tag: step_reps=1 means the step_time is a SINGLE differenced slope
    # (slow-fetch day) -- low confidence, don't mix into PERF history as an
    # equal of median-of-3 measurements
    print(f"context: train_step({step_cfg.pde_engine})={step_time*1e3:.2f} ms "
          f"[reps={step_reps}] "
          f"({train_evals/1e6:.2f}M pts/s incl. grad+Adam); "
          f"residual_eval={eval_time*1e3:.2f} ms [reps={eval_reps}] "
          f"@ {n_eval} pts{mfu_note}",
          file=sys.stderr)

    baseline = 1.0e7  # BASELINE.json target: >=10M evals/s/chip on v5e
    print(json.dumps({
        "metric": "collocation_point_residual_evals_per_sec_per_chip",
        "value": round(evals_per_sec, 1),
        "unit": "evals/s/chip",
        "vs_baseline": round(evals_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    # the tunneled remote-compile service occasionally drops a response
    # ("response body closed"); retry the whole run before giving up
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:
            if attempt == 2:
                raise
            print(f"bench attempt {attempt + 1} failed ({type(e).__name__}); retrying",
                  file=sys.stderr)
            time.sleep(10)

"""Round-3 perf session: measure the VERDICT #4 items on the real chip.

Run ALONE on an otherwise-idle host (tunnel timing rules, see
docs/PERF.md / CLAUDE.md):

  /opt/venv/bin/python scripts/perf_round3.py [--section eval|step|attn|all]

Sections:
  eval -- residual-eval throughput: v4 (XLA-prep) vs v4pe (in-kernel PE) at
          the bench batch (40960) and a batch sweep past the former >50K
          VMEM-spill point.
  step -- full training step ('kernel' engine) with the combined
          margin+inter single-launch (round-3) timing.
  attn -- fwd+bwd attention at the flagship's 287 tokens and the unswept
          287..1024 range: XLA vs Pallas single-tile vs blockwise flash.

Median-of-5 slope timing (warmup after compile; one scalar fetch per run).
"""

import argparse
import statistics
import sys
import time

import numpy as np


def median_slope(timed, reps: int = 5, k1: int = 20, k2: int = 220) -> float:
    timed(30)  # warmup: absorb post-compile tunnel stalls
    return statistics.median(
        (timed(k2) - timed(k1)) / (k2 - k1) for _ in range(reps))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--section", default="all",
                        choices=["eval", "step", "attn", "all"])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.physics.engine import (
        fused_kernel_fields, residual_losses_from_fields)
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import (
        Batch, PointBatch, StepConfig, create_train_state, make_train_step)
    import os

    print(f"backend: {jax.default_backend()}", flush=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(os.path.join(here, "configs", "DeepPhysiNet_NCEP_cfg.py")).config
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
        pde_engine="kernel",
    )
    factors = dict(cfg["train_cfg"]["losses"]["loss_factor"])
    tx = build_optimizer("Adam", lr=1e-4, weight_decay=1e-4)
    rng = np.random.RandomState(0)

    def pts(n, B=1):
        return PointBatch(
            x=jnp.asarray(rng.rand(B, n) * 27000 * (lon_size - 1), jnp.float32),
            y=jnp.asarray(rng.rand(B, n) * 27000 * (lat_size - 1), jnp.float32),
            t=jnp.asarray(rng.randint(0, 25, (B, n)) * 3600.0, jnp.float32),
            f=jnp.asarray(1e-4 * rng.rand(B, n, 1), jnp.float32),
            nwp=jnp.asarray(rng.randn(B, n, 6) * 0.1, jnp.float32),
            labels=jnp.asarray(rng.randn(B, n, 6) * 0.1, jnp.float32),
        )

    batch = Batch(
        field=jnp.asarray(rng.randn(1, 159, 2405) * 0.5, jnp.float32),
        forecast_h=jnp.asarray([24.0], jnp.float32),
        margin=pts(20480), inter=pts(4096),
    )
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    fh_norm = jnp.asarray([24.0 / 360.0], jnp.float32)

    if args.section in ("eval", "all"):
        def make_eval(n_eval, in_kernel_pe):
            coords = jnp.asarray(np.stack([
                rng.rand(n_eval) * 27000 * (lon_size - 1),
                rng.rand(n_eval) * 27000 * (lat_size - 1),
                rng.randint(0, 25, n_eval) * 3600.0], -1), jnp.float32)
            cor = jnp.asarray(1e-4 * rng.rand(n_eval, 1), jnp.float32)
            nwp = jnp.asarray(rng.randn(n_eval, 6) * 0.1, jnp.float32)

            @jax.jit
            def run(params):
                tokens = model.apply(params, batch.field,
                                     jnp.asarray([[24.0 / 360.0]]),
                                     method=PhysicsNet.encode)
                _, fd = fused_kernel_fields(
                    model, params, tokens[0], coords, nwp, fh_norm,
                    step_cfg.coord_spec, step_cfg.obs_specs, with_clip=True,
                    in_kernel_pe=in_kernel_pe)
                return residual_losses_from_fields(fd, cor, factors)["total"]

            def timed(k):
                t0 = time.monotonic()
                out = None
                for _ in range(k):
                    out = run(state.params)
                _ = float(out)
                return time.monotonic() - t0

            _ = float(run(state.params))  # compile
            return timed

        for n_eval in (24576, 40960, 49152, 65536, 98304, 131072):
            for pe_mode in (False, True):
                try:
                    timed = make_eval(n_eval, pe_mode)
                    s = median_slope(timed, 5, 20, 120)
                    print(f"eval n={n_eval} in_kernel_pe={pe_mode}: "
                          f"{s*1e3:.3f} ms -> {n_eval/s/1e6:.2f}M evals/s",
                          flush=True)
                except Exception as e:
                    print(f"eval n={n_eval} in_kernel_pe={pe_mode}: "
                          f"FAILED {type(e).__name__}: {e}", flush=True)

    if args.section in ("step", "all"):
        step = make_train_step(model, tx, step_cfg)
        st = jax.tree.map(lambda x: x.copy(), state)
        st, m = step(st, batch, True)
        _ = float(m["total_loss"])

        def timed_step(k):
            nonlocal st
            t0 = time.monotonic()
            for _ in range(k):
                st, m = step(st, batch, True)
            _ = float(m["total_loss"])
            return time.monotonic() - t0

        s = median_slope(timed_step, 5, 20, 120)
        print(f"train_step(kernel, combined-launch): {s*1e3:.3f} ms "
              f"({24576/s/1e6:.2f}M pts/s incl. grad+Adam)", flush=True)

    if args.section in ("attn", "all"):
        from deepphysinet_tpu.ops.attention import fused_attention

        B, H, E = 1, 8, 64
        scale = 1.0 / np.sqrt(E)
        for L in (287, 384, 512, 640, 768, 1024):
            qkv = [jnp.asarray(rng.randn(B, L, H, E) * 0.2, jnp.bfloat16)
                   for _ in range(3)]

            for impl in ("xla", "pallas", "flash"):
                @jax.jit
                def fb(q, k, v, impl=impl):
                    def loss(q):
                        return jnp.sum(
                            fused_attention(q, k, v, scale, impl).astype(jnp.float32) ** 2)
                    l, g = jax.value_and_grad(loss)(q)
                    return l + jnp.sum(g.astype(jnp.float32))

                try:
                    _ = float(fb(*qkv))

                    def timed(k_):
                        t0 = time.monotonic()
                        out = None
                        for _ in range(k_):
                            out = fb(*qkv)
                        _ = float(out)
                        return time.monotonic() - t0

                    s = median_slope(timed, 5, 50, 450)
                    print(f"attn L={L} impl={impl}: {s*1e6:.1f} us fwd+bwd",
                          flush=True)
                except Exception as e:
                    print(f"attn L={L} impl={impl}: FAILED {type(e).__name__}",
                          flush=True)


if __name__ == "__main__":
    main()

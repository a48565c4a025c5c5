"""A/B the fused-QKV encoder projection in the full training step.

The last documented training-step lever (docs/PERF.md round-3 (f)): encode is
~12% of the 'kernel'-engine step and NOT overlapped there, and XLA does not
horizontally merge the three skinny QKV gemms.  `fused_qkv=True` computes
q/k/v in one [L, d] x [d, 3d] launch (transformer_net.py::AttentionLayer).

Run ALONE on an idle host (tunnel timing rules; see CLAUDE.md):

  /opt/venv/bin/python scripts/perf_fused_qkv.py

Measures, median-of-5 slopes, flagship geometry:
  1. encode-only fwd+bwd (where the change lives)
  2. full 'kernel'-engine training step (the production number)
"""

import statistics
import time

import numpy as np


def median_slope(timed, reps: int = 5, k1: int = 20, k2: int = 220) -> float:
    timed(30)  # warmup: absorb post-compile tunnel stalls
    return statistics.median(
        (timed(k2) - timed(k1)) / (k2 - k1) for _ in range(reps))


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import (
        Batch, PointBatch, StepConfig, create_train_state, make_train_step)

    print(f"backend: {jax.default_backend()}", flush=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(os.path.join(here, "configs", "DeepPhysiNet_NCEP_cfg.py")).config
    net = {k: v for k, v in cfg["net_cfg"].items() if k != "name"}
    specs = norm_specs_from_cfg(cfg["obs_norm_cfg"])
    lat_size, lon_size = cfg["train_cfg"]["img_size"]
    step_cfg = StepConfig(
        coord_spec=CoordSpec(lon_size=lon_size, lat_size=lat_size, dx=27000.0,
                             dy=27000.0, pred_t_span=86400.0),
        obs_specs=tuple(specs[k] for k in OBS_NAME_ORDER),
        loss_factor=dict(cfg["train_cfg"]["losses"]["loss_factor"]),
        pde_engine="kernel",
    )
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

    for fused in (False, True):
        meta = {k: v for k, v in cfg["meta_cfg"].items() if k != "name"}
        meta["fused_qkv"] = fused
        model = PhysicsNet(meta_cfg=meta, net_cfg=net, compute_dtype=jnp.bfloat16)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)

        # 1. encode-only fwd+bwd
        @jax.jit
        def enc_fb(params):
            def loss(p):
                t = model.apply(p, batch.field, jnp.asarray([[24.0 / 360.0]]),
                                method=PhysicsNet.encode)
                return jnp.sum(t.astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(loss)(params)
            return l + sum(jnp.sum(x.astype(jnp.float32))
                           for x in jax.tree.leaves(g))

        _ = float(enc_fb(state.params))

        def timed_enc(k):
            out = None
            t0 = time.monotonic()
            for _ in range(k):
                out = enc_fb(state.params)
            _ = float(out)
            return time.monotonic() - t0

        s = median_slope(timed_enc, 5, 50, 450)
        print(f"fused_qkv={fused}: encode fwd+bwd {s*1e6:.1f} us", flush=True)

        # 2. full training step
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
        print(f"fused_qkv={fused}: train step {s*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()

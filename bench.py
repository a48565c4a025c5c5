"""Benchmark: collocation-point PDE-residual throughput of the full training step.

Measures end-to-end physics-informed training-step throughput on one chip at
the reference's batch geometry (20480 labeled + 4096 collocation points per
step; both point sets get the full 6-equation residual treatment, matching
interface_physics.py:476-498) and reports **collocation-point residual
evals/sec/chip** -- the driver's north-star metric (BASELINE.json: >=10M on
v5e).

Timing is slope-based: wall time of K2 steps minus wall time of K1 steps,
each ended by one scalar device fetch.  On tunneled TPU backends a D2H fetch
costs tens of seconds; differencing two runs cancels that constant, so the
slope is pure step time.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
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

    # compile + settle
    state, m = step(state, batch, with_pde=True)
    _ = float(m["total_loss"])  # full sync

    def timed_run(k: int) -> float:
        nonlocal state
        t0 = time.monotonic()
        for _ in range(k):
            state, m = step(state, batch, with_pde=True)
        _ = float(m["total_loss"])  # one fetch forces the whole chain
        return time.monotonic() - t0

    k1, k2 = 20, 220
    t1 = timed_run(k1)
    t2 = timed_run(k2)
    step_time = (t2 - t1) / (k2 - k1)
    pts_per_step = (n_margin + n_inter) * B
    evals_per_sec = pts_per_step / max(step_time, 1e-9)

    baseline = 1.0e7  # BASELINE.json target: >=10M evals/s/chip on v5e
    print(json.dumps({
        "metric": "collocation_point_residual_evals_per_sec_per_chip",
        "value": round(evals_per_sec, 1),
        "unit": "evals/s/chip",
        "vs_baseline": round(evals_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()

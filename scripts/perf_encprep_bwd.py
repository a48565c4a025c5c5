"""Isolate the non-kernel backward blocks after the packed assembly (round 4).

After round 4 (d) the 'kernel' step is 4.563 ms; the Pallas kernels account
for ~3.18 ms and adam ~0.18 ms, leaving ~1.1 ms of encode/weight-prep/
assembly/pred-loss forward+backward.  Scan-slope each piece in isolation:

  E1: grad wrt params of sum(encode(field)^2)            (encoder fwd+bwd)
  E2: grad wrt params of sum(fused_weights^2)            (+ extract/fuse bwd)
  A1: grad wrt (primal, tang) of packed residual losses  (assembly fwd+bwd)
  A0: same but the dict [N,1]-column assembly            (for reference)
  L1: grad wrt primal of WeightSmoothL1(primal, labels)  (pred-loss fwd+bwd)

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_encprep_bwd.py
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
        extract_decode_weights, fuse_decode_weights)
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.physics.engine import (
        fields_from_primal_tangents, packed_residual_losses_from_primal_tangents,
        residual_losses_from_fields)
    from deepphysinet_tpu.train.losses import build_loss
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
    obs_specs = tuple(specs[k] for k in OBS_NAME_ORDER)
    factors = dict(cfg["train_cfg"]["losses"]["loss_factor"])
    lat_size, lon_size = cfg["train_cfg"]["img_size"]
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
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    jax.block_until_ready(state.params)
    fh_enc = jnp.asarray([[24.0 / 360.0]], jnp.float32)
    fh_norm = jnp.asarray([24.0 / 360.0], jnp.float32)

    # point-set inputs for the assembly programs (margin-sized)
    primal0 = jnp.asarray(rng.randn(n_margin, 6) * 0.3, jnp.float32)
    tang0 = jnp.asarray(rng.randn(3, n_margin, 6) * 0.1, jnp.float32)
    f0 = batch.margin.f[0]
    labels0 = batch.margin.labels[0]
    pred_loss_fn = build_loss("WeightSmoothL1Loss", beta=0.1)

    def leafsum(tree):
        return sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(tree))

    def e1_loss(params):
        tokens = model.apply(params, batch.field, fh_enc, method=PhysicsNet.encode)
        return jnp.sum(tokens.astype(jnp.float32) ** 2) * 1e-6

    def e2_loss(params):
        tokens = model.apply(params, batch.field, fh_enc, method=PhysicsNet.encode)
        fw = fuse_decode_weights(extract_decode_weights(model, params, tokens[0],
                                                        fh_norm))
        return leafsum(jax.tree.map(lambda x: x.astype(jnp.float32) ** 2, fw)) * 1e-6

    def a1_loss(pt):
        return packed_residual_losses_from_primal_tangents(
            pt[0], pt[1], f0, obs_specs, factors)["total"]

    def a0_loss(pt):
        fd = fields_from_primal_tangents(pt[0], pt[1], obs_specs, True)
        return residual_losses_from_fields(fd, f0, factors)["total"]

    def l1_loss(p):
        return pred_loss_fn(p, labels0) * factors["margin_factor"]

    def scan_grad(k, loss):
        def f(a):
            def body(c, _):
                g = jax.grad(loss)(jax.tree.map(lambda x: x * (1.0 + c), a))
                s = leafsum(g)
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

    for name, loss, arg in (
        ("E1 encode fwd+bwd", e1_loss, state.params),
        ("E2 encode+prep fwd+bwd", e2_loss, state.params),
        ("A1 packed assembly fwd+bwd", a1_loss, (primal0, tang0)),
        ("A0 dict assembly fwd+bwd", a0_loss, (primal0, tang0)),
        ("L1 pred loss fwd+bwd", l1_loss, primal0),
    ):
        t1 = median_slope(jax.jit(scan_grad(4, loss)), (arg,))
        t2 = median_slope(jax.jit(scan_grad(16, loss)), (arg,))
        print(f"{name}: {(t2-t1)/12*1e3:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()

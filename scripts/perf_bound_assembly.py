"""Bound the in-kernel residual-assembly perf lead without implementing it.

The last untried structural idea from round 3 (memory: round-3 leads) is to
assemble the six PDE residuals inside the fused Pallas kernel's epilogue
instead of in post-kernel XLA.  Before building it, measure its *ceiling*:

    full   = encode + prep + kernel + inverse-norm chain + residual assembly
             (exactly bench.py's residual_eval)
    nokern = same minus everything after the kernel (sum of primal+tangents)
    enc    = encode alone (token amortization context)

full - nokern is the total post-kernel cost; any in-kernel assembly saves at
most that much (and in practice less: the same math moves onto the kernel's
serial VPU path, which the v4pe experiment measured to be worse than XLA for
exactly this kind of elementwise prep/epilogue work, docs/PERF.md round 3b).

Run on the real TPU with an idle host:  PYTHONPATH=/root/repo:/root/.axon_site
/opt/venv/bin/python scripts/perf_bound_assembly.py
"""

from __future__ import annotations

import statistics
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
    from deepphysinet_tpu.physics.engine import (
        fused_kernel_fields, residual_losses_from_fields)
    from deepphysinet_tpu.train.train_step import StepConfig
    import os

    cfg_file = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
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

    rng = np.random.RandomState(0)
    n_eval = 40960
    field = jnp.asarray(rng.randn(1, 159, 2405) * 0.5, jnp.float32)
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
    fh_enc = jnp.asarray([[24.0 / 360.0]], jnp.float32)

    params = model.init(jax.random.PRNGKey(0), field,
                        jnp.zeros((8, net["in_channels"]), jnp.float32),
                        jnp.zeros((8, 6), jnp.float32), fh_enc)

    @jax.jit
    def full(params, coords, nwp, f):
        tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
        _, fd = fused_kernel_fields(model, params, tokens[0], coords, nwp,
                                    fh_norm, step_cfg.coord_spec,
                                    step_cfg.obs_specs, with_clip=True)
        return residual_losses_from_fields(fd, f, factors)["total"]

    @jax.jit
    def nokern(params, coords, nwp, f):
        # identical up to and including the Pallas kernel; the cheapest
        # possible epilogue (two sums) replaces inverse-norm + assembly
        from deepphysinet_tpu.ops.decode_kernel import (
            extract_decode_weights, fuse_decode_weights, fused_decode_jvp_v4,
            pe_and_tangents)
        from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe

        tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
        weights = extract_decode_weights(model, params, tokens[0], fh_norm)
        pe, dpe = pe_and_tangents(coords, step_cfg.coord_spec)
        in_ch = model.net_cfg["in_channels"]
        cd_freqs = make_freq_bands(in_ch // 2 // 6, max_freq=4.0)
        cd_pe = sinecos_pe(nwp, cd_freqs, include_input=False)
        fw = fuse_decode_weights(weights)
        primal, tang = fused_decode_jvp_v4(fw, pe, dpe, cd_pe, nwp,
                                           compute_dtype=model.compute_dtype)
        return jnp.sum(primal) + jnp.sum(tang) + jnp.sum(f) * 0.0

    @jax.jit
    def enc(params):
        tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
        return jnp.sum(tokens[0])

    def median_slope(fn, args, reps=5, k1=50, k2=1050):
        _ = float(fn(*args))  # compile
        t0 = time.monotonic(); _ = float(fn(*args))
        fetch = time.monotonic() - t0
        if fetch > 5.0:
            reps = 3

        def timed(k):
            t0 = time.monotonic()
            out = None
            for _ in range(k):
                out = fn(*args)
            _ = float(out)
            return time.monotonic() - t0

        timed(60)
        return statistics.median((timed(k2) - timed(k1)) / (k2 - k1)
                                 for _ in range(reps))

    t_full = median_slope(full, (params, coords, nwp_eval, coriolis_f))
    t_nok = median_slope(nokern, (params, coords, nwp_eval, coriolis_f))
    t_enc = median_slope(enc, (params,), k1=50, k2=2050)

    post = t_full - t_nok
    print(f"full     : {t_full*1e3:.3f} ms  ({n_eval/t_full/1e6:.2f}M evals/s)")
    print(f"no-assembly (kernel end): {t_nok*1e3:.3f} ms  "
          f"({n_eval/t_nok/1e6:.2f}M 'evals'/s)")
    print(f"encode alone: {t_enc*1e3:.3f} ms")
    print(f"post-kernel assembly cost: {post*1e3:.3f} ms "
          f"({100*post/t_full:.1f}% of full) -> in-kernel assembly ceiling "
          f"{n_eval/max(t_nok,1e-9)/1e6:.2f}M evals/s", flush=True)


if __name__ == "__main__":
    main()

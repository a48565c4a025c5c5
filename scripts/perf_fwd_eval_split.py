"""Split the 2.27 ms forward residual eval (headline bench op) into
prep / cast / kernel at N=40960 (round 4 (f) groundwork).

The round-4 budget row "decode fwd+tangents 1245 us @ 50.1% MFU" timed
fused_kernel_fields INCLUDING the XLA point-prep pipeline, while the bwd
kernel measured in isolation runs at 83.5% true MFU on the same matmul
geometry — so either the fwd Pallas kernel is genuinely ~50% or the gap is
prep/cast overhead.  Measure, per in-jit scan slope (median-of-5):

  K_bf16 : fused_residual_sums_v4, inputs pre-cast to bf16 (pure kernel+launch)
  K_f32  : same, f32 inputs (adds the ~210 MB cast pipeline)
  P      : pe_and_tangents + sinecos_pe from raw coords (XLA point prep)
  E      : full kernel_residual_losses from (params, coords) [bench path]

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_fwd_eval_split.py
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
        extract_decode_weights, fuse_decode_weights, pe_and_tangents)
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe
    from deepphysinet_tpu.ops.residual_kernel import fused_residual_sums_v4
    from deepphysinet_tpu.physics.engine import fused_residual_losses
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import Batch, PointBatch, create_train_state

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
    coord_spec = CoordSpec(lon_size=lon_size, lat_size=lat_size, dx=27000.0,
                           dy=27000.0, pred_t_span=86400.0)
    rng = np.random.RandomState(0)
    n = 40960

    coords = jnp.asarray(np.stack([
        rng.rand(n) * 27000 * (lon_size - 1),
        rng.rand(n) * 27000 * (lat_size - 1),
        rng.randint(0, 25, n) * 3600.0,
    ], -1), jnp.float32)
    coriolis_f = jnp.asarray(1e-4 * rng.rand(n, 1), jnp.float32)
    nwp = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
    fh_norm = jnp.asarray([24.0 / 360.0], jnp.float32)
    fh_enc = jnp.asarray([[24.0 / 360.0]], jnp.float32)

    def pts(m):
        return PointBatch(
            x=jnp.asarray(rng.rand(1, m), jnp.float32),
            y=jnp.asarray(rng.rand(1, m), jnp.float32),
            t=jnp.asarray(rng.rand(1, m), jnp.float32),
            f=jnp.asarray(rng.rand(1, m, 1), jnp.float32),
            nwp=jnp.asarray(rng.randn(1, m, 6), jnp.float32),
            labels=jnp.asarray(rng.randn(1, m, 6), jnp.float32),
        )

    batch = Batch(field=jnp.asarray(rng.randn(1, 159, 2405) * 0.5, jnp.float32),
                  forecast_h=jnp.asarray([24.0], jnp.float32),
                  margin=pts(128), inter=pts(128))
    tx = build_optimizer("Adam", lr=1e-4, weight_decay=1e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    jax.block_until_ready(state.params)

    tokens = jax.jit(lambda p: model.apply(p, batch.field, fh_enc,
                                           method=PhysicsNet.encode))(state.params)
    fw = jax.jit(lambda p: fuse_decode_weights(extract_decode_weights(
        model, p, tokens[0], fh_norm)))(state.params)

    in_ch = net["in_channels"]
    cd_freqs = make_freq_bands(in_ch // 2 // 6, max_freq=4.0)
    pe0, dpe0 = jax.jit(lambda c: pe_and_tangents(c, coord_spec))(coords)
    cdpe0 = jax.jit(lambda v: sinecos_pe(v, cd_freqs, include_input=False))(nwp)
    pe_b, dpe_b, cdpe_b = (pe0.astype(jnp.bfloat16), dpe0.astype(jnp.bfloat16),
                           cdpe0.astype(jnp.bfloat16))
    jax.block_until_ready((fw, pe_b, dpe_b, cdpe_b))
    print(f"shapes: pe {pe0.shape} dpe {dpe0.shape} cdpe {cdpe0.shape}", flush=True)

    def scan(k, body_of):
        def f(a):
            def body(c, _):
                s = body_of(jax.tree.map(lambda x: x * (1.0 + c).astype(x.dtype), a))
                return (s * 1e-20).astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
            return c[None]
        return f

    def k_body(inp):
        pe, dpe, cdpe = inp
        sums = fused_residual_sums_v4(fw, pe, dpe, cdpe, nwp, coriolis_f,
                                      obs_specs, with_clip=True)
        return jnp.sum(sums)

    def p_body(c):
        pe, dpe = pe_and_tangents(c, coord_spec)
        cdpe = sinecos_pe(nwp + c[:1, :1] * 1e-20, cd_freqs, include_input=False)
        return (jnp.sum(pe.astype(jnp.float32)) + jnp.sum(dpe.astype(jnp.float32))
                + jnp.sum(cdpe.astype(jnp.float32)))

    def e_body(c):
        return fused_residual_losses(
            model, state.params, tokens[0], c, nwp, fh_norm, coriolis_f,
            coord_spec, obs_specs, factors, with_clip=True)["total"]

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

    gflop = 4.94e6 * n / 1e9  # v4 analytic decode+tangents
    for name, body, arg in (
        ("K_bf16 kernel only", k_body, (pe_b, dpe_b, cdpe_b)),
        ("K_f32 kernel + casts", k_body, (pe0, dpe0, cdpe0)),
        ("P point prep", p_body, coords),
        ("E full eval (bench path)", e_body, coords),
    ):
        t1 = median_slope(jax.jit(scan(4, body)), (arg,))
        t2 = median_slope(jax.jit(scan(16, body)), (arg,))
        ms = (t2 - t1) / 12 * 1e3
        print(f"{name}: {ms:.3f} ms/iter  "
              f"({gflop/ms*1e3/1e3:.1f} TF/s vs 197 peak = "
              f"{gflop/ms*1e3/197e3*100:.1f}% MFU on v4 FLOPs)", flush=True)


if __name__ == "__main__":
    main()

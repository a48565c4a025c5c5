"""Literal wider-K tangent-matmul A/B on the v4t forward kernel (round 5).

The fwd kernel sits at 71.7% MFU vs a ~83% K-fill ceiling because the three
K=2F(=64) tangent matmuls half-fill the 128-deep MXU (docs/PERF.md round 4
(j)).  Widening K by BLOCK-DIAGONAL fusion keeps the algebra but trades the
half-filled K-tiles for an equal (pair: [128, 512]) or larger (cat:
[192, 768], padded to 256-deep) number of zero MAC slots:

  slots(split) = 3 x 128x256 = 98304   per var per point-row
  slots(pair)  = 128x512 + 128x256 = 98304   (equal; 2 matmuls instead of 3)
  slots(cat)   = 256x768 = 196608            (2x; predicted regression)

so under a pure K-tile cost model 'pair' is neutral (minus per-matmul
overheads) and 'cat' loses.  This script measures both against the shipping
split form — the variant kernels live here, not in the library (variants
that lose stay in scripts; see docs/PERF.md round 5).

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_widek.py
"""

from __future__ import annotations

import functools
import statistics
import time

import numpy as np


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from deepphysinet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(os.environ.get("DPN_XLA_CACHE", "/tmp/dpn_xla_cache"))

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.decode_kernel import (
        _v4_epilogue, extract_decode_weights, fuse_decode_weights,
        fused_decode_jvp_v4t, pe_and_tangents)
    from deepphysinet_tpu.ops.normalization import norm_specs_from_cfg
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe_flat
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import Batch, PointBatch, create_train_state

    cfg_file = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "configs", "DeepPhysiNet_NCEP_cfg.py")
    cfg = Config.fromfile(cfg_file).config
    meta = {k: v for k, v in cfg["meta_cfg"].items() if k != "name"}
    net = {k: v for k, v in cfg["net_cfg"].items() if k != "name"}
    model = PhysicsNet(meta_cfg=meta, net_cfg=net, compute_dtype=jnp.bfloat16)
    lat_size, lon_size = cfg["train_cfg"]["img_size"]
    coord_spec = CoordSpec(lon_size=lon_size, lat_size=lat_size, dx=27000.0,
                           dy=27000.0, pred_t_span=86400.0)
    rng = np.random.RandomState(0)

    field = jnp.asarray(rng.randn(1, 159, 2405) * 0.5, jnp.float32)
    fh_enc = jnp.asarray([[24.0 / 360.0]], jnp.float32)
    fh_norm = jnp.asarray([24.0 / 360.0], jnp.float32)

    def pts(n):
        return PointBatch(
            x=jnp.asarray(rng.rand(1, n) * 27000 * (lon_size - 1), jnp.float32),
            y=jnp.asarray(rng.rand(1, n) * 27000 * (lat_size - 1), jnp.float32),
            t=jnp.asarray(rng.randint(0, 25, (1, n)) * 3600.0, jnp.float32),
            f=jnp.asarray(1e-4 * rng.rand(1, n, 1), jnp.float32),
            nwp=jnp.asarray(rng.randn(1, n, 6) * 0.1, jnp.float32),
            labels=jnp.asarray(rng.randn(1, n, 6) * 0.1, jnp.float32),
        )

    init_batch = Batch(field=field, forecast_h=jnp.asarray([24.0], jnp.float32),
                       margin=pts(256), inter=pts(256))
    tx = build_optimizer("Adam", lr=1e-4, weight_decay=1e-4)
    params = create_train_state(model, tx, jax.random.PRNGKey(0), init_batch).params
    jax.block_until_ready(params)

    n = 40960
    coords = jnp.asarray(np.stack([
        rng.rand(n) * 27000 * (lon_size - 1),
        rng.rand(n) * 27000 * (lat_size - 1),
        rng.randint(0, 25, n) * 3600.0,
    ], axis=-1), jnp.float32)
    nwp = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
    in_ch = net["in_channels"]
    hid = net["hidden_channels"]
    ch = in_ch // 3
    cd_freqs = make_freq_bands(in_ch // 2 // 6, max_freq=4.0)
    bf = jnp.bfloat16
    f32 = jnp.float32
    n_vars = 6

    tokens = model.apply(params, field, fh_enc, method=PhysicsNet.encode)
    fw = fuse_decode_weights(
        extract_decode_weights(model, params, tokens[0], fh_norm))
    pe, dpe = pe_and_tangents(coords, coord_spec, dtype=bf)
    cd_pe = sinecos_pe_flat(nwp, cd_freqs, dtype=bf)
    ref_t = nwp.T

    # block-diagonal fused tangent weights (built once; zeros are the
    # explicit version of the K-tile padding they replace)
    w1c = fw.w1c  # [6, 3, ch, hid]
    w1p = jnp.zeros((n_vars, 2 * ch, 2 * hid), f32)
    w1p = w1p.at[:, :ch, :hid].set(w1c[:, 0]).at[:, ch:, hid:].set(w1c[:, 1])
    w1q = jnp.zeros((n_vars, 3 * ch, 3 * hid), f32)
    for k in range(3):
        w1q = w1q.at[:, k * ch:(k + 1) * ch, k * hid:(k + 1) * hid].set(w1c[:, k])

    # wide-layout dpe operands (prep variants pay their own relayout cost
    # inside the jitted program, like production prep would)
    dpe01 = jnp.concatenate([dpe[0], dpe[1]], axis=-1)  # [N, 2ch]
    dpe2 = dpe[2]  # [N, ch]
    dpecat = jnp.concatenate([dpe[0], dpe[1], dpe[2]], axis=-1)  # [N, 3ch]

    # ---- variant kernel bodies (var-major output, mirror _decode_kernel_v4
    # t_layout=True with the tangent matmuls fused) ----
    def kernel_pair(pe_ref, d01_ref, d2_ref, cdpe_ref, ref_ref,
                    w1_ref, w1p_ref, w1c2_ref, b1_ref, w2f1_ref, wdf1_ref,
                    rbias_ref, fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
                    primal_ref, tang_ref, *, block_n, cdt):
        P_in = pe_ref[...]
        D01 = d01_ref[...]
        D2 = d2_ref[...]
        CD = cdpe_ref[...]

        def dot(a, wm):
            return jax.lax.dot_general(
                a.astype(cdt), wm, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)

        primal_rows, tang_rows = [], []
        for v in range(n_vars):
            z = dot(P_in, w1_ref[v]) + b1_ref[v][None, :]
            mask = z > 0
            p = jnp.maximum(z, 0.0)
            t01 = dot(D01, w1p_ref[v])  # [Nb, 2*hid]: t0 | t1
            t2 = dot(D2, w1c2_ref[v])
            t16 = jnp.concatenate(
                [jnp.where(mask, t01[:, :hid], 0.0).astype(cdt),
                 jnp.where(mask, t01[:, hid:], 0.0).astype(cdt),
                 jnp.where(mask, t2, 0.0).astype(cdt)], axis=0)
            o, to3 = _v4_epilogue(
                p, t16, CD, ref_ref[v], w2f1_ref[v], wdf1_ref[v], rbias_ref[v],
                fw2_ref[v], w2wo_ref[v], wdwo_ref[v], obias_ref[v],
                block_n=block_n, cdt=cdt)
            primal_rows.append(o[None, :])
            tang_rows.append(to3[:, None, :])
        primal_ref[...] = jnp.concatenate(primal_rows, 0).astype(primal_ref.dtype)
        tang_ref[...] = jnp.concatenate(tang_rows, 1).astype(tang_ref.dtype)

    def kernel_cat(pe_ref, dcat_ref, cdpe_ref, ref_ref,
                   w1_ref, w1q_ref, b1_ref, w2f1_ref, wdf1_ref,
                   rbias_ref, fw2_ref, w2wo_ref, wdwo_ref, obias_ref,
                   primal_ref, tang_ref, *, block_n, cdt):
        P_in = pe_ref[...]
        DC = dcat_ref[...]
        CD = cdpe_ref[...]

        def dot(a, wm):
            return jax.lax.dot_general(
                a.astype(cdt), wm, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)

        primal_rows, tang_rows = [], []
        for v in range(n_vars):
            z = dot(P_in, w1_ref[v]) + b1_ref[v][None, :]
            mask = z > 0
            p = jnp.maximum(z, 0.0)
            tall = dot(DC, w1q_ref[v])  # [Nb, 3*hid]
            t16 = jnp.concatenate(
                [jnp.where(mask, tall[:, k * hid:(k + 1) * hid], 0.0).astype(cdt)
                 for k in range(3)], axis=0)
            o, to3 = _v4_epilogue(
                p, t16, CD, ref_ref[v], w2f1_ref[v], wdf1_ref[v], rbias_ref[v],
                fw2_ref[v], w2wo_ref[v], wdwo_ref[v], obias_ref[v],
                block_n=block_n, cdt=cdt)
            primal_rows.append(o[None, :])
            tang_rows.append(to3[:, None, :])
        primal_ref[...] = jnp.concatenate(primal_rows, 0).astype(primal_ref.dtype)
        tang_ref[...] = jnp.concatenate(tang_rows, 1).astype(tang_ref.dtype)

    mem = pltpu.VMEM
    full = lambda: pl.BlockSpec(memory_space=mem)
    block_n = 256
    n_pad = n  # 40960 % 256 == 0

    wt_common = [fw.w2f1.astype(bf), fw.wdf1.astype(bf), fw.rbias.astype(f32),
                 fw.fw2.astype(f32), fw.w2wo.astype(f32), fw.wdwo.astype(f32),
                 fw.obias.astype(f32)]

    def call_pair(pe, d01, d2, cdp, rt):
        p, t = pl.pallas_call(
            functools.partial(kernel_pair, block_n=block_n, cdt=bf),
            grid=(n_pad // block_n,),
            out_shape=(jax.ShapeDtypeStruct((n_vars, n_pad), f32),
                       jax.ShapeDtypeStruct((3, n_vars, n_pad), f32)),
            in_specs=[
                pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
                pl.BlockSpec((block_n, 2 * ch), lambda i: (i, 0), memory_space=mem),
                pl.BlockSpec((block_n, ch), lambda i: (i, 0), memory_space=mem),
                pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
                pl.BlockSpec((n_vars, block_n), lambda i: (0, i), memory_space=mem),
            ] + [full() for _ in range(10)],
            out_specs=(
                pl.BlockSpec((n_vars, block_n), lambda i: (0, i), memory_space=mem),
                pl.BlockSpec((3, n_vars, block_n), lambda i: (0, 0, i),
                             memory_space=mem),
            ),
        )(pe, d01, d2, cdp, rt.astype(f32), fw.w1.astype(bf), w1p.astype(bf),
          w1c[:, 2].astype(bf), fw.b1.astype(f32), *wt_common)
        return p.sum() + t.sum()

    def call_cat(pe, dcat, cdp, rt):
        p, t = pl.pallas_call(
            functools.partial(kernel_cat, block_n=block_n, cdt=bf),
            grid=(n_pad // block_n,),
            out_shape=(jax.ShapeDtypeStruct((n_vars, n_pad), f32),
                       jax.ShapeDtypeStruct((3, n_vars, n_pad), f32)),
            in_specs=[
                pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
                pl.BlockSpec((block_n, 3 * ch), lambda i: (i, 0), memory_space=mem),
                pl.BlockSpec((block_n, in_ch), lambda i: (i, 0), memory_space=mem),
                pl.BlockSpec((n_vars, block_n), lambda i: (0, i), memory_space=mem),
            ] + [full() for _ in range(10)],
            out_specs=(
                pl.BlockSpec((n_vars, block_n), lambda i: (0, i), memory_space=mem),
                pl.BlockSpec((3, n_vars, block_n), lambda i: (0, 0, i),
                             memory_space=mem),
            ),
        )(pe, dcat, cdp, rt.astype(f32), fw.w1.astype(bf), w1q.astype(bf),
          fw.b1.astype(f32), *wt_common)
        return p.sum() + t.sum()

    def call_split(pe, dpe, cdp, rt):
        p, t = fused_decode_jvp_v4t(fw, pe, dpe, cdp, rt, compute_dtype=bf)
        return p.sum() + t.sum()

    def median_slope(fn, args, reps=5, k1=50, k2=350):
        def timed(k):
            t0 = time.monotonic()
            out = None
            for _ in range(k):
                out = fn(*args)
            _ = float(out)
            return time.monotonic() - t0
        timed(1)
        timed(60)
        return statistics.median((timed(k2) - timed(k1)) / (k2 - k1)
                                 for _ in range(reps))

    rungs = [
        ("split (shipping)", jax.jit(call_split), (pe, dpe, cd_pe, ref_t)),
        ("pair  (K=128)   ", jax.jit(call_pair), (pe, dpe01, dpe2, cd_pe, ref_t)),
        ("cat   (K=192bd) ", jax.jit(call_cat), (pe, dpecat, cd_pe, ref_t)),
    ]
    for name, fn, args in rungs:
        t = median_slope(fn, args)
        print(f"{name}: {t*1e3:.3f} ms @ {n} pts = {n/t/1e6:.2f}M/s "
              f"(chk {float(fn(*args)):.6g})", flush=True)


if __name__ == "__main__":
    main()

"""Micro-bench PE-prep formulations on real TPU (round 4 (j)).

The fused-eval ladder showed prep (pe_and_tangents + cd_pe) at 0.38 ms of
the 1.97 ms eval; a layout-flat lane-TILE rewrite measured WORSE (0.98 ms:
the period-3 lane tile is a per-element lane shuffle).  This isolates each
formulation so the production prep can pick winners per output:

  pe:  stacked  — original [N, F, 2, 3] stack/reshape
       tile     — sin(tile(cn) * fb + off)  [the round-4 (j) regression]
       matmul   — sin(cn @ M + off), M [3, 6F] one-hot*fb (K=3 MXU pass)
  dpe: stacked  — original stack/moveaxis
       bcast    — sin(cn.T[:, :, None] * fb_d + off_d) * w
  cd:  stacked  — original sinecos_pe
       tile     — sinecos_pe_flat
       matmul   — sin(nwp @ M_cd + off)

Each variant timed alone (sum-reduced), bf16 output, warmup + median-of-5
slopes, N=40960.

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
     scripts/perf_prep_variants.py
"""

from __future__ import annotations

import statistics
import time

import numpy as np


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    from deepphysinet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(os.environ.get("DPN_XLA_CACHE", "/tmp/dpn_xla_cache"))

    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe

    coord_spec = CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0,
                           pred_t_span=86400.0)
    rng = np.random.RandomState(0)
    n = 40960
    coords = jnp.asarray(np.stack([
        rng.rand(n) * 27000 * 256, rng.rand(n) * 27000 * 144,
        rng.randint(0, 25, n) * 3600.0], axis=-1), jnp.float32)
    nwp = jnp.asarray(rng.randn(n, 6) * 0.1, jnp.float32)
    bf = jnp.bfloat16

    fb = np.asarray(coord_spec.freq_bands(), np.float32)
    F = fb.shape[0]
    cd_fb = make_freq_bands(192 // 2 // 6, max_freq=4.0)
    Fc = cd_fb.shape[0]

    scales = jnp.array([1.0 / (27000.0 * 256), 1.0 / (27000.0 * 144),
                        1.0 / 86400.0], jnp.float32)

    # ---- pe variants ----
    def pe_stacked(coords):
        cn = coords * scales
        fbj = jnp.asarray(fb)
        xf = jnp.swapaxes(cn[..., :, None] * fbj, -1, -2)
        return jnp.stack([jnp.sin(xf), jnp.cos(xf)], axis=-2).reshape(
            n, -1).astype(bf)

    fb_pe = jnp.asarray(np.repeat(fb, 6))
    off_pe = jnp.asarray(np.tile(np.repeat(np.array([0., np.pi / 2], np.float32), 3), F))

    def pe_tile(coords):
        cn = coords * scales
        return jnp.sin(jnp.tile(cn, (1, 2 * F)) * fb_pe + off_pe).astype(bf)

    M_pe = np.zeros((3, 6 * F), np.float32)
    j = np.arange(6 * F)
    M_pe[j % 3, j] = fb[j // 6]
    M_pe = jnp.asarray(M_pe * np.asarray(scales)[:, None])

    def pe_matmul(coords):
        return jnp.sin(coords @ M_pe + off_pe).astype(bf)

    # ---- dpe variants ----
    def dpe_stacked(coords):
        cn = coords * scales
        fbj = jnp.asarray(fb)
        xf = jnp.swapaxes(cn[..., :, None] * fbj, -1, -2)
        sin, cos = jnp.sin(xf), jnp.cos(xf)
        dfeat = jnp.stack([cos * fbj[None, :, None], -sin * fbj[None, :, None]],
                          axis=-2)
        return (jnp.moveaxis(dfeat, -1, 0)
                * scales[:, None, None, None]).reshape(3, n, -1).astype(bf)

    fb_d = jnp.asarray(np.repeat(fb, 2))
    off_d = jnp.asarray(np.tile(np.array([np.pi / 2, np.pi], np.float32), F))

    def dpe_bcast(coords):
        cn = coords * scales
        a3 = cn.T[:, :, None] * fb_d + off_d
        return (jnp.sin(a3) * (scales[:, None, None] * fb_d)).astype(bf)

    # ---- cd_pe variants ----
    def cd_stacked(nwp):
        return sinecos_pe(nwp, cd_fb, include_input=False).astype(bf)

    fb_cd = jnp.asarray(np.repeat(np.asarray(cd_fb, np.float32), 12))
    off_cd = jnp.asarray(np.tile(np.repeat(np.array([0., np.pi / 2], np.float32), 6), Fc))

    def cd_tile(nwp):
        return jnp.sin(jnp.tile(nwp, (1, 2 * Fc)) * fb_cd + off_cd).astype(bf)

    M_cd = np.zeros((6, 12 * Fc), np.float32)
    jc = np.arange(12 * Fc)
    M_cd[jc % 6, jc] = np.asarray(cd_fb, np.float32)[jc // 12]
    M_cd = jnp.asarray(M_cd)

    def cd_matmul(nwp):
        return jnp.sin(nwp @ M_cd + off_cd).astype(bf)

    def median_slope(fn, args, reps=5, k1=100, k2=700):
        g = jax.jit(lambda *a: fn(*a).astype(jnp.float32).sum())

        def timed(k):
            t0 = time.monotonic()
            out = None
            for _ in range(k):
                out = g(*args)
            _ = float(out)
            return time.monotonic() - t0
        timed(1)
        timed(100)
        return statistics.median((timed(k2) - timed(k1)) / (k2 - k1)
                                 for _ in range(reps))

    variants = [
        ("pe_stacked", pe_stacked, (coords,)), ("pe_tile", pe_tile, (coords,)),
        ("pe_matmul", pe_matmul, (coords,)),
        ("dpe_stacked", dpe_stacked, (coords,)), ("dpe_bcast", dpe_bcast, (coords,)),
        ("cd_stacked", cd_stacked, (nwp,)), ("cd_tile", cd_tile, (nwp,)),
        ("cd_matmul", cd_matmul, (nwp,)),
    ]
    vals = {}
    for name, fn, args in variants:
        t = median_slope(fn, args)
        vals[name] = np.asarray(fn(*args), np.float32)
        print(f"{name:12s}: {t*1e6:7.1f} us", flush=True)

    for a, b in (("pe_tile", "pe_stacked"), ("pe_matmul", "pe_stacked"),
                 ("dpe_bcast", "dpe_stacked"), ("cd_tile", "cd_stacked"),
                 ("cd_matmul", "cd_stacked")):
        d = np.max(np.abs(vals[a] - vals[b]))
        print(f"max|{a} - {b}| = {d:.3e}")


if __name__ == "__main__":
    main()

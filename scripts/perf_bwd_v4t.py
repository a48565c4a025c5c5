"""v4t vs v4s backward decode-kernel block sweep + true-FLOP MFU (round 5).

Round 4 (c) measured 83.5% true MFU on decode_bwd_kernel_v4 (the [N, 6]
column form), but production now runs the VAR-MAJOR pair
(decode_bwd_kernel_v4t since round 4 (g); decode_bwd_kernel_v4s is the
round-5 dpe-free candidate whose full-step A/B regressed ~0.2 ms).  This
script times all three in isolation with the in-jit scan-slope methodology
at the production shape (one 20480-pt margin + one 4096-pt inter bwd per
step) and sweeps block_n.

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_bwd_v4t.py
"""

from __future__ import annotations

import statistics
import time

import numpy as np

from perf_bwd_kernel import bwd_kernel_flops_per_point


def main() -> None:
    import jax
    import jax.numpy as jnp
    import os

    from deepphysinet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(os.environ.get("DPN_XLA_CACHE", "/tmp/dpn_xla_cache"))

    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.decode_kernel import (
        DecodeWeights, decode_bwd_kernel_v4, decode_bwd_kernel_v4s,
        decode_bwd_kernel_v4t, fuse_decode_weights, fuse_v6_from_v4,
        pe_and_tangents, trig_cm_inputs)
    from deepphysinet_tpu.utils.flops import chip_peak_flops

    rng = np.random.RandomState(0)
    n_vars, in_ch, hid, ch = 6, 192, 256, 64
    n_margin, n_inter = 20480, 4096
    spec = CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0,
                     pred_t_span=86400.0)

    w = DecodeWeights(
        w1=jnp.asarray(rng.randn(n_vars, in_ch, hid) * 0.05, jnp.float32),
        b1=jnp.asarray(rng.randn(n_vars, hid) * 0.05, jnp.float32),
        w2=jnp.asarray(rng.randn(n_vars, hid, hid) * 0.05, jnp.float32),
        b2=jnp.asarray(rng.randn(n_vars, hid) * 0.05, jnp.float32),
        wd=jnp.asarray(rng.randn(n_vars, in_ch, hid) * 0.05, jnp.float32),
        bd=jnp.asarray(rng.randn(n_vars, hid) * 0.05, jnp.float32),
        fh_add=jnp.asarray(rng.randn(n_vars, hid) * 0.05, jnp.float32),
        f1=jnp.asarray(rng.randn(n_vars, hid, hid) * 0.05, jnp.float32),
        g1=jnp.asarray(rng.randn(n_vars, hid) * 0.05, jnp.float32),
        f2=jnp.asarray(rng.randn(n_vars, hid, hid) * 0.05, jnp.float32),
        g2=jnp.asarray(rng.randn(n_vars, hid) * 0.05, jnp.float32),
        wo=jnp.asarray(rng.randn(n_vars, hid) * 0.05, jnp.float32),
        bo=jnp.asarray(rng.randn(n_vars) * 0.05, jnp.float32))
    fw4 = fuse_decode_weights(w)
    fw6 = fuse_v6_from_v4(fw4, spec)

    def pts(n):
        coords = jnp.asarray(np.stack(
            [rng.rand(n) * 27000 * 256, rng.rand(n) * 27000 * 144,
             rng.randint(0, 25, n) * 3600.0], -1), jnp.float32)
        pe, dpe = pe_and_tangents(coords, spec)
        pe_cm = trig_cm_inputs(coords, spec)
        cdpe = jnp.asarray(rng.randn(n, in_ch) * 0.3, jnp.float32)
        gp = jnp.asarray(rng.randn(n_vars, n) * 0.3, jnp.float32)
        gt = jnp.asarray(rng.randn(3, n_vars, n) * 0.3, jnp.float32)
        return pe, dpe, pe_cm, cdpe, gp, gt

    margin = pts(n_margin)
    inter = pts(n_inter)
    jax.block_until_ready((margin, inter, fw4, fw6))

    def median_slope(fn, args, reps=5, k1=4, k2=16):
        def timed(k):
            t0 = time.monotonic()
            out = None
            for _ in range(k):
                out = fn(*args)
            _ = float(jax.tree.leaves(out)[0].ravel()[0])
            return time.monotonic() - t0

        timed(1)
        timed(10)
        return statistics.median((timed(k2) - timed(k1)) / (k2 - k1)
                                 for _ in range(reps))

    def scan_bwd(k, which, block_n, vmem=100 << 20):
        def f(m, it):
            def body(c, _):
                out = jnp.zeros(())
                for (pe, dpe, pe_cm, cdpe, gp, gt) in (m, it):
                    if which == "v4":
                        g = decode_bwd_kernel_v4(
                            fw4, pe + c, dpe, cdpe, gp.T, gt.transpose(0, 2, 1),
                            block_n=block_n, vmem_limit_bytes=vmem)
                    elif which == "v4t":
                        g = decode_bwd_kernel_v4t(
                            fw4, pe + c, dpe, cdpe, gp, gt,
                            block_n=block_n, vmem_limit_bytes=vmem)
                    else:
                        g = decode_bwd_kernel_v4s(
                            fw6, pe_cm + c, cdpe, gp, gt,
                            block_n=block_n, vmem_limit_bytes=vmem)
                    out = out + sum(jnp.sum(x).astype(jnp.float32)
                                    for x in jax.tree.leaves(g))
                return out * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
            return c[None]
        return f

    peak = chip_peak_flops()
    fl = (n_margin + n_inter) * bwd_kernel_flops_per_point(in_ch, hid, ch, n_vars)
    print(f"bwd kernel actual FLOPs: {fl/1e9:.1f} GFLOP "
          f"({bwd_kernel_flops_per_point()/1e6:.2f} MFLOP/pt)", flush=True)

    for which in ("v4t", "v4s", "v4"):
        for block_n in (128, 256, 512):
            t1 = median_slope(jax.jit(scan_bwd(4, which, block_n)),
                              (margin, inter))
            t2 = median_slope(jax.jit(scan_bwd(16, which, block_n)),
                              (margin, inter))
            per = (t2 - t1) / 12
            print(f"{which} block {block_n}: {per*1e3:.3f} ms/step-pair  "
                  f"{fl/per/1e12:.1f} TF/s  MFU {fl/per/peak*100:.1f}%",
                  flush=True)


if __name__ == "__main__":
    main()

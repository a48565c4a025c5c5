"""Backward decode-kernel block sweep + true-FLOP MFU (round 4).

The step budget (docs/PERF.md round 4 (b)) showed the backward is 3.09 ms =
63% of the production step.  The twin-counted 34% MFU is misleading: the
Pallas bwd kernel recomputes the forward block-wise, so its ACTUAL math is
~13.0 MFLOP/pt (vs the twin's ~8.5) -- this script times the bwd kernel in
isolation with the in-jit scan-slope methodology and reports MFU against the
kernel's real FLOP count, and sweeps block_n (the fwd kernel's optimum 256
need not be the bwd's: different matmul mix, weight-stationary accumulators).

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_bwd_kernel.py
"""

from __future__ import annotations

import statistics
import time

import numpy as np


def bwd_kernel_flops_per_point(in_ch=192, hid=256, ch=64, n_vars=6) -> float:
    """Actual matmul FLOPs of _decode_bwd_kernel_v4 per point (recompute +
    weight-cotangent accumulation; elementwise/VPU work not counted)."""
    # forward recompute (per var, per point)
    z = 2 * in_ch * hid
    tz = 3 * 2 * ch * hid
    rp = 2 * hid * hid + 2 * in_ch * hid
    tr = 3 * 2 * hid * hid
    # backward
    gw2f1 = 2 * hid * hid + 3 * 2 * hid * hid   # p^T g_rp + t^T g_rt
    gwdf1 = 2 * in_ch * hid
    g_p = 2 * hid * hid
    g_t = 3 * 2 * hid * hid
    gw1 = 2 * in_ch * hid
    gw1c = 3 * 2 * ch * hid
    return float(n_vars * (z + tz + rp + tr + gw2f1 + gwdf1 + g_p + g_t
                           + gw1 + gw1c))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import os

    from deepphysinet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(os.environ.get("DPN_XLA_CACHE", "/tmp/dpn_xla_cache"))

    from deepphysinet_tpu.ops.decode_kernel import (
        FusedDecodeWeights, decode_bwd_kernel_v4)
    from deepphysinet_tpu.utils.flops import chip_peak_flops

    rng = np.random.RandomState(0)
    n_vars, in_ch, hid, ch = 6, 192, 256, 64
    n_margin, n_inter = 20480, 4096

    fw = FusedDecodeWeights(
        w1=jnp.asarray(rng.randn(n_vars, in_ch, hid) * 0.05, jnp.float32),
        w1c=jnp.asarray(rng.randn(n_vars, 3, ch, hid) * 0.05, jnp.float32),
        b1=jnp.asarray(rng.randn(n_vars, hid) * 0.05, jnp.float32),
        w2f1=jnp.asarray(rng.randn(n_vars, hid, hid) * 0.05, jnp.float32),
        wdf1=jnp.asarray(rng.randn(n_vars, in_ch, hid) * 0.05, jnp.float32),
        rbias=jnp.asarray(rng.randn(n_vars, hid) * 0.05, jnp.float32),
        fw2=jnp.asarray(rng.randn(n_vars, hid) * 0.05, jnp.float32),
        w2wo=jnp.asarray(rng.randn(n_vars, hid) * 0.05, jnp.float32),
        wdwo=jnp.asarray(rng.randn(n_vars, in_ch) * 0.05, jnp.float32),
        obias=jnp.asarray(rng.randn(n_vars) * 0.05, jnp.float32),
    )

    def pts(n):
        return (jnp.asarray(rng.randn(n, in_ch) * 0.3, jnp.float32),
                jnp.asarray(rng.randn(3, n, ch) * 0.3, jnp.float32),
                jnp.asarray(rng.randn(n, in_ch) * 0.3, jnp.float32),
                jnp.asarray(rng.randn(n, n_vars) * 0.3, jnp.float32),
                jnp.asarray(rng.randn(3, n, n_vars) * 0.3, jnp.float32))

    margin = pts(n_margin)
    inter = pts(n_inter)

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

    def scan_bwd(k, block_n, vmem):
        # production shape: one margin + one inter bwd per step
        def f(m, it):
            def body(c, _):
                out = jnp.zeros(())
                for (pe, dpe, cdpe, gp, gt) in (m, it):
                    g = decode_bwd_kernel_v4(
                        fw, pe + c, dpe, cdpe, gp, gt, block_n=block_n,
                        vmem_limit_bytes=vmem)
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

    for block_n, vmem in ((256, 100 << 20), (512, 100 << 20), (1024, 120 << 20)):
        t1 = median_slope(jax.jit(scan_bwd(4, block_n, vmem)), (margin, inter))
        t2 = median_slope(jax.jit(scan_bwd(16, block_n, vmem)), (margin, inter))
        per = (t2 - t1) / 12
        print(f"block {block_n}: {per*1e3:.3f} ms/step-pair  "
              f"{fl/per/1e12:.1f} TF/s  MFU {fl/per/peak*100:.1f}%", flush=True)


if __name__ == "__main__":
    main()

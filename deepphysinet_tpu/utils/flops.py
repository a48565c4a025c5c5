"""FLOP accounting and MFU (model FLOP utilization) helpers.

Two independent counters, used to cross-check each other:

* ``compiled_flops`` -- XLA's own cost analysis of a compiled program.  The
  production residual path runs Pallas kernels (opaque custom calls that XLA
  counts as zero), so FLOPs are counted on the pure-XLA *twin* programs
  (``pde_engine='jvp'`` / ``decode_jvp_xla_v4``), which compute the identical
  collapsed-v4 math (parity-tested, tests/test_kernel_training.py).
* ``decode_jvp_v4_flops_per_point`` -- the analytic matmul count of the v4
  algebra, the number docs/PERF.md quotes as ~4.9 MFLOP/pt.

The two counters use slightly different bases, so MFU percentages quoted
against them differ for the SAME measured time: the twin-counted basis
includes everything in the eval program (prep trig, assembly, encode --
~5.06 MFLOP/pt at the bench shape; bench.py's eval MFU uses this), while
the analytic basis counts only the kernel's matmuls (~4.94 MFLOP/pt;
docs/PERF.md's "71.7% kernel MFU" uses this over the kernel-only time).
Neither is wrong -- state which basis a number uses when quoting it.

MFU here = counted FLOPs / wall time / chip peak for the compute dtype.
Peaks are the published per-chip dense peaks (v5e: 197 TFLOP/s bf16, v4:
275, v5p: 459); f32 paths use the bf16 peak too -- on TPU f32 matmuls run
through the same MXU at reduced rate, so reported f32 MFU is conservative.
"""

from __future__ import annotations

from typing import Optional

# published dense bf16 peak FLOP/s per chip, by device_kind substring
_PEAKS = (
    ("v5 lite", 197e12),  # v5e
    ("v5litepod", 197e12),
    ("v6 lite", 918e12),  # v6e / Trillium
    ("v5p", 459e12),
    ("v5", 459e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def chip_peak_flops(device=None) -> Optional[float]:
    """Per-chip dense bf16 peak for ``device`` (default: first jax device).

    Returns None when the device kind is unknown (e.g. the CPU test mesh) --
    callers should then skip MFU reporting rather than print a bogus number.
    """
    import jax

    if device is None:
        devices = jax.devices()
        if not devices:
            return None
        device = devices[0]
    kind = getattr(device, "device_kind", "").lower()
    if "tpu" not in kind:
        return None
    for key, peak in _PEAKS:
        if key in kind:
            return peak
    return None


def compiled_flops(fn, *args, **kwargs) -> float:
    """XLA-counted FLOPs of one execution of ``jit(fn)(*args)``.

    Pallas kernels inside ``fn`` count as ZERO (opaque custom calls) -- pass
    the pure-XLA twin of the production program.  Matmul FLOPs are counted
    as 2*M*N*K regardless of dtype.
    """
    import jax

    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0] if ca else {}
    return float(ca.get("flops", 0.0))


def decode_jvp_v4_flops_per_point(in_ch: int = 192, hidden: int = 256,
                                  n_vars: int = 6) -> float:
    """Analytic matmul+reduction FLOPs per collocation point of the collapsed
    v4 decode-with-tangents algebra (ops/decode_kernel.py:decode_jvp_xla_v4).

    Per variable: z = pe@w1 (in_ch->hid), tz = 3 channel dots
    (in_ch/3->hid), r = p@w2f1 (hid->hid) + cd_pe@wdf1 (in_ch->hid),
    tr = t@w2f1 (3x hid->hid), plus the fw2/w2wo/wdwo reduction epilogue.
    At (192, 256) this is ~0.824 MFLOP/pt/var -> ~4.94 MFLOP/pt, the number
    quoted in docs/PERF.md.
    """
    z = 2 * in_ch * hidden
    tz = 3 * 2 * (in_ch // 3) * hidden
    r = 2 * hidden * hidden + 2 * in_ch * hidden
    tr = 3 * 2 * hidden * hidden
    epilogue = (2 * hidden            # sum(pr * fw2)
                + 2 * hidden          # sum(p * w2wo)
                + 2 * in_ch           # sum(cd_pe * wdwo)
                + 3 * 2 * hidden      # sum(tr * fw2)
                + 3 * 2 * hidden)     # sum(t * w2wo)
    return float(n_vars * (z + tz + r + tr + epilogue))


def decode_primal_v4_flops_per_point(in_ch: int = 192, hidden: int = 256,
                                     n_vars: int = 6) -> float:
    """Primal-only collapsed decode (engine.collapsed_decode): ~1.98 MFLOP/pt
    at (192, 256)."""
    z = 2 * in_ch * hidden
    r = 2 * hidden * hidden + 2 * in_ch * hidden
    epilogue = 2 * hidden + 2 * hidden + 2 * in_ch
    return float(n_vars * (z + r + epilogue))


def mfu(flops: float, seconds: float, device=None) -> Optional[float]:
    """Achieved fraction of chip peak; None off-TPU or for unknown chips."""
    peak = chip_peak_flops(device)
    if peak is None or seconds <= 0:
        return None
    return flops / seconds / peak

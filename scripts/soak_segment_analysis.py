"""Per-segment fps histogram of a soak log (round-5 VERDICT #5).

Splits the e2e-vs-compiled-ceiling gap into framework host-loop cost
(visible in CLEAN segments) vs environment stalls (the slow tail): parses
the trainer's per-100-step ``fps:`` lines, reports the distribution, and
computes how much wall time the sub-median tail costs relative to a run of
all-median segments.

Usage: python scripts/soak_segment_analysis.py LOGFILE [--skip N]
"""

from __future__ import annotations

import argparse
import re

import numpy as np


def analyze(path: str, skip: int = 3, steps_per_seg: int = 100):
    fps = [float(m.group(1))
           for line in open(path)
           for m in [re.search(r"fps:([0-9.]+)", line)] if m]
    fps = np.asarray(fps[skip:], float)  # drop compile/warmup segments
    if not fps.size:
        raise SystemExit("no fps lines found")
    med = float(np.median(fps))
    seg_t = steps_per_seg / fps  # seconds per segment
    total_t = float(seg_t.sum())
    ideal_t = steps_per_seg * len(fps) / med
    clean = fps[fps >= 0.9 * med]
    stalled = fps[fps < 0.9 * med]
    out = {
        "segments": len(fps),
        "median_fps": round(med, 1),
        "p10_fps": round(float(np.percentile(fps, 10)), 1),
        "p90_fps": round(float(np.percentile(fps, 90)), 1),
        "max_fps": round(float(fps.max()), 1),
        "clean_segments": int(clean.size),
        "clean_median_fps": round(float(np.median(clean)), 1),
        "stalled_segments": int(stalled.size),
        "stalled_median_fps": round(float(np.median(stalled)), 1) if stalled.size else None,
        "wall_minutes": round(total_t / 60, 1),
        "stall_tax_minutes": round((total_t - ideal_t) / 60, 1),
        "overall_fps": round(steps_per_seg * len(fps) / total_t, 1),
    }
    hist, edges = np.histogram(fps, bins=[0, 50, 100, 150, 175, 200, 225,
                                          250, 300, 1000])
    out["histogram"] = {f"{int(edges[i])}-{int(edges[i+1])}": int(h)
                        for i, h in enumerate(hist) if h}
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--skip", type=int, default=3)
    args = ap.parse_args()
    import json

    print(json.dumps(analyze(args.log, args.skip), indent=1))

"""Persistent XLA compilation cache (restart-/preemption-friendly compiles).

The flagship train step takes ~20-40 s to compile on a fresh process
(docs/PERF.md); on preemption-heavy TPU fleets that cost is paid on every
resume.  JAX ships a persistent on-disk compilation cache -- executables are
keyed by (HLO, compile options, backend) and deserialized instead of
recompiled on later runs -- but it is off by default.  This module is the one
place the framework turns it on, wired to ``train_cfg.tpu.compilation_cache_dir``
(interface/interface_physics.py __init__; see docs/CONFIG.md).

The reference has no equivalent (torch eager pays no compile; this is a cost
the XLA design model introduces, so the framework owns mitigating it).
"""

from __future__ import annotations

import os
from typing import Optional


def enable_compilation_cache(
    cache_dir: str,
    min_compile_time_secs: Optional[float] = None,
    min_entry_size_bytes: Optional[int] = None,
) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` (created if
    missing) and return the absolute path.

    By default only programs that took >= 1 s to compile are persisted
    (jax's own threshold -- the right default here: the multi-second train/
    eval steps cache, per-fetch helper jits don't churn the directory).
    ``min_compile_time_secs=0`` / ``min_entry_size_bytes=-1`` persist
    everything (useful in tests).  Safe to call before or after the backend
    initializes, and idempotent."""
    import jax

    cache_dir = os.path.abspath(os.path.expanduser(str(cache_dir)))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    if min_compile_time_secs is not None:
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(min_compile_time_secs))
    if min_entry_size_bytes is not None:
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes",
            int(min_entry_size_bytes))
    return cache_dir

"""Multi-host initialization and helpers.

The reference's distributed path assumes an external torchrun launcher
initialized NCCL (SURVEY 2.3).  The TPU-native equivalent: each host calls
``initialize_distributed()`` (jax.distributed under the hood), then the global
mesh spans every chip in the slice; data loading splits windows across hosts
by ``process_index`` (the DistributedSampler replacement).  Multi-slice
training over DCN works the same way -- the mesh's ``data`` axis simply spans
slices.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed when running multi-host; no-op single-host.

    With TPU pods the arguments are discovered from the environment; they can
    be forced for other launchers.
    """
    import jax

    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception as e:  # already initialized or single-host
        if "already" not in str(e).lower():
            raise


def process_shard(n_items: int):
    """This host's slice of the dataset index (DistributedSampler equivalent)."""
    import jax

    pid, nproc = jax.process_index(), jax.process_count()
    return range(pid, n_items, nproc)

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


_COORDINATOR_HINTS = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                      "MEGASCALE_COORDINATOR_ADDRESS")


def _env_hints_multiprocess() -> bool:
    """True when the environment says this is a multi-process launch.

    A coordinator address in the env means a launcher manages this job; a
    multi-entry TPU_WORKER_HOSTNAMES means a pod slice (a single-host TPU VM
    also sets it, with one entry -- that stays single-controller)."""
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return True
    return any(h in os.environ for h in _COORDINATOR_HINTS)


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

    if jax.distributed.is_initialized():
        return
    # resolve the env-var configuration FIRST so a latched backend raises for
    # env-launched multi-process jobs exactly like for explicit arguments
    # (silently degrading to single-controller would let N hosts train
    # independently while clobbering one shared checkpoint path).  This
    # includes the coordinator-address hints: a launcher may set only those,
    # without JAX_NUM_PROCESSES.
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is not None and num_processes <= 1:
        return
    multiproc_intent = (
        (num_processes is not None and num_processes > 1)
        or coordinator_address is not None
        or _env_hints_multiprocess()
    )
    try:
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            # too late to join a multi-process job: the backend is latched
            # (e.g. the interface was built first); proceed single-controller
            if multiproc_intent:
                raise RuntimeError(
                    "jax backend already initialized before "
                    "initialize_distributed() of a multi-process job; call it "
                    "before building the interface (as train.py --dist does)")
            return
    except ImportError:  # pragma: no cover - private API moved
        pass
    if num_processes is None and coordinator_address is None:
        # no explicit args: only attempt auto-detection when the environment
        # says this is a multi-process job (TPU pod / launcher env), so a
        # plain single-host `--dist` run stays a no-op
        if not multiproc_intent:
            return
        coordinator_address = (os.environ.get("JAX_COORDINATOR_ADDRESS")
                               or os.environ.get("COORDINATOR_ADDRESS"))
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
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

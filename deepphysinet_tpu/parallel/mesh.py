"""Device mesh construction and batch shardings.

The reference's only parallelism is DDP data-parallel over NCCL
(interface_physics.py:848-1404, SURVEY 2.3).  The TPU-native equivalent is a
``jax.sharding.Mesh`` with two axes:

* ``data``   -- one NWP window per mesh slot (replaces DistributedSampler):
               field tokens and every point batch shard their leading window
               axis here; gradient psum rides ICI (replaces DDP all-reduce).
* ``points`` -- optional second axis sharding the collocation-point dimension
               inside each window; points are independent, so this scales the
               physics engine to very large point batches without growing the
               per-window count.

Parameters are replicated; XLA inserts the psum for the gradient reduction
from the shardings alone (scaling-book recipe: annotate, don't hand-write).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all remaining devices
    points: int = 1


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    points = max(1, cfg.points)
    data = cfg.data if cfg.data > 0 else n // points
    if data * points > n:
        raise ValueError(f"mesh {data}x{points} needs more than {n} devices")
    arr = np.array(devices[: data * points]).reshape(data, points)
    return Mesh(arr, ("data", "points"))


def batch_sharding(mesh: Mesh):
    """Shardings for the Batch pytree (train_step.Batch structure)."""

    def pts(with_labels: bool):
        d = {
            "x": NamedSharding(mesh, P("data", "points")),
            "y": NamedSharding(mesh, P("data", "points")),
            "t": NamedSharding(mesh, P("data", "points")),
            "f": NamedSharding(mesh, P("data", "points", None)),
            "nwp": NamedSharding(mesh, P("data", "points", None)),
            "labels": NamedSharding(mesh, P("data", "points", None)) if with_labels else None,
        }
        return d

    return {
        "field": NamedSharding(mesh, P("data", None, None)),
        "forecast_h": NamedSharding(mesh, P("data")),
        "margin": pts(True),
        "inter": pts(True),
    }


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def put_sharded(x, sharding: NamedSharding):
    """Place one array with ``sharding``, multi-process aware.

    Single-controller: plain ``device_put``.  Multi-process (jax.distributed
    initialized, the mesh spans all hosts' devices): this process contributes
    its LOCAL block and the result is the global array -- the reference's
    DDP each-rank-owns-its-batch semantics (interface_physics.py:899-900)
    without any cross-host transfer.
    """
    if jax.process_count() > 1:
        import numpy as np

        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def globalize_replicated(tree, mesh: Mesh):
    """Host-replicated values -> mesh-replicated (global) arrays.

    Multi-process callers must pass IDENTICAL values on every process (e.g.
    parameters initialized from the same seed, or a restored checkpoint).
    """
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: put_sharded(x, repl), tree)


def shard_batch(batch, mesh: Mesh):
    """Place a train_step.Batch according to the mesh shardings (global batch
    single-controller; process-local window block multi-process)."""
    from deepphysinet_tpu.train.train_step import Batch, PointBatch

    sh = batch_sharding(mesh)

    def put_points(pb, spec) -> "PointBatch":
        return PointBatch(
            x=put_sharded(pb.x, spec["x"]),
            y=put_sharded(pb.y, spec["y"]),
            t=put_sharded(pb.t, spec["t"]),
            f=put_sharded(pb.f, spec["f"]),
            nwp=put_sharded(pb.nwp, spec["nwp"]),
            labels=put_sharded(pb.labels, spec["labels"]) if pb.labels is not None else None,
        )

    return Batch(
        field=put_sharded(batch.field, sh["field"]),
        forecast_h=put_sharded(batch.forecast_h, sh["forecast_h"]),
        margin=put_points(batch.margin, sh["margin"]),
        inter=put_points(batch.inter, sh["inter"]),
    )

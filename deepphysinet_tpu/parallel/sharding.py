"""Sharded (multi-chip) training step.

GSPMD-style: the step body is identical to the single-chip one
(train/train_step.py); parallelism comes entirely from sharding annotations.
Parameters and optimizer state are replicated across the mesh; the Batch
shards its window axis over ``data`` and its point axis over ``points``
(parallel/mesh.py).  XLA then inserts the gradient psum over ICI -- the
TPU-native replacement for the reference's DDP/NCCL all-reduce
(interface_physics.py:903-907, 1056).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepphysinet_tpu.parallel.mesh import batch_sharding
from deepphysinet_tpu.train.train_step import (
    Batch,
    PointBatch,
    StepConfig,
    TrainState,
    make_train_step_impl,
)


def _batch_shardings_pytree(mesh: Mesh) -> Batch:
    sh = batch_sharding(mesh)
    return Batch(
        field=sh["field"],
        forecast_h=sh["forecast_h"],
        margin=PointBatch(**sh["margin"]),
        inter=PointBatch(**sh["inter"]),
    )


def make_sharded_train_step(model, tx, cfg: StepConfig, mesh: Mesh):
    """jit the step with explicit shardings over ``mesh``."""
    impl = make_train_step_impl(model, tx, cfg)
    repl = NamedSharding(mesh, P())
    state_sh = TrainState(step=repl, params=repl, opt_state=repl)
    batch_sh = _batch_shardings_pytree(mesh)
    return jax.jit(
        impl,
        static_argnames=("with_pde",),
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def make_sharded_device_sampling_step(model, tx, cfg: StepConfig, mesh: Mesh, scfg):
    """Mesh-sharded on-device-sampling step: one window per ``data`` slot.

    Each device holds its window's cubes and samples its own fresh points
    every step (per-window PRNG keys shard with the windows); parameters
    replicate and the gradient psum rides ICI.  This is the production
    configuration: host bandwidth per chip stays constant as the slice grows.
    """
    from deepphysinet_tpu.train.device_sampling import (
        CubeBatch, make_device_sampling_train_step)

    inner = make_device_sampling_train_step(model, tx, cfg, scfg)
    # re-jit the underlying function with shardings (inner is already jitted;
    # grab its wrapped impl)
    impl = inner.__wrapped__
    repl = NamedSharding(mesh, P())
    state_sh = TrainState(step=repl, params=repl, opt_state=repl)
    data = NamedSharding(mesh, P("data"))
    cube_sh = CubeBatch(field=data, forecast_h=data, nwp_cube=data, label_cube=data)
    return jax.jit(
        impl,
        static_argnames=("with_pde",),
        in_shardings=(state_sh, cube_sh, repl),  # PRNG key replicated; split per window in-jit
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )

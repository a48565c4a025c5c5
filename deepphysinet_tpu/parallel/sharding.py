"""Sharded (multi-chip) training step via explicit ``jax.shard_map``.

The step body is the same make_loss_fn/apply_gradient_update pieces as the
single-chip step (train/train_step.py); parallelism is an explicit SPMD
program: every device runs the body on its LOCAL block of the Batch (windows
sharded over ``data``, each window's points over ``points``), gradients and
metric scalars are ``lax.pmean``'d over the whole mesh (the psum rides ICI --
the TPU-native replacement for the reference's DDP/NCCL all-reduce,
interface_physics.py:903-907, 1056), and every shard applies the identical
optimizer update to its replicated parameter copy.

Why shard_map and not GSPMD sharding annotations (the round-1/2 design): the
production ``pde_engine='kernel'`` path runs ``pallas_call`` custom kernels
inside the loss.  Under GSPMD a custom call has no partitioning rule, so the
compiler must either fail or replicate it -- the per-device semantics were
*accidental*.  Under shard_map the kernel simply runs on each device's local
points block: the partitioning is defined by construction, for every engine
('jvp', 'linearize', 'kernel').

Correctness requirement on the loss: every metric is a plain mean over the
windows/points in the local block (see make_loss_fn), and shard_map guarantees
equal block sizes, so pmean-of-local-means == global mean exactly (up to float
reduction order).
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
    _variable_metrics,
    apply_gradient_update,
    make_loss_fn,
)


def _batch_shardings_pytree(mesh: Mesh) -> Batch:
    sh = batch_sharding(mesh)
    return Batch(
        field=sh["field"],
        forecast_h=sh["forecast_h"],
        margin=PointBatch(**sh["margin"]),
        inter=PointBatch(**sh["inter"]),
    )


def _point_pspecs(pb: PointBatch) -> PointBatch:
    return PointBatch(
        x=P("data", "points"),
        y=P("data", "points"),
        t=P("data", "points"),
        f=P("data", "points", None),
        nwp=P("data", "points", None),
        labels=P("data", "points", None) if pb.labels is not None else None,
    )


def batch_pspecs(batch: Batch) -> Batch:
    """PartitionSpec pytree for a Batch (mirrors mesh.batch_sharding)."""
    return Batch(
        field=P("data", None, None),
        forecast_h=P("data"),
        margin=_point_pspecs(batch.margin),
        inter=_point_pspecs(batch.inter),
    )


def make_sharded_train_step(model, tx, cfg: StepConfig, mesh: Mesh):
    """shard_map'd step: ``step(state, batch, with_pde) -> (state, metrics)``.

    ``batch`` arrives as global arrays (ideally already placed with
    mesh.shard_batch so no resharding happens); state/metrics are replicated.
    """
    loss_fn = make_loss_fn(model, cfg)
    axes = tuple(mesh.axis_names)

    def step(state: TrainState, batch: Batch, with_pde: bool):
        def body(state, local: Batch):
            (_, (metrics, pred_norm)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, local, with_pde)
            grads = jax.lax.pmean(grads, axes)
            metrics = jax.lax.pmean(metrics, axes)
            var_m = jax.lax.pmean(
                _variable_metrics(pred_norm, local.margin.labels, cfg), axes)
            new_state, metrics = apply_gradient_update(tx, cfg, state, grads, metrics)
            metrics.update(var_m)
            return new_state, metrics

        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), batch_pspecs(batch)),
            out_specs=(P(), P()),
            # every shard computes identical replicated outputs by
            # construction (pmean'd grads + replicated params); the static
            # rep-checker cannot see through optax's update tree
            check_vma=False,
        )(state, batch)

    return jax.jit(step, static_argnames=("with_pde",), donate_argnums=(0,))


def make_sharded_eval_step(model, cfg: StepConfig, mesh: Mesh):
    """Validation losses over the mesh (no update): every process/device
    evaluates its local block, metric scalars pmean to global means.  The
    multi-host trainer's interleaved validation runs through this (the
    collective means ALL processes must call it; only rank 0 logs)."""
    loss_fn = make_loss_fn(model, cfg)
    axes = tuple(mesh.axis_names)

    def eval_step(params, batch: Batch, with_pde: bool):
        def body(params, local: Batch):
            _, (metrics, pred_norm) = loss_fn(params, local, with_pde)
            metrics.update(_variable_metrics(pred_norm, local.margin.labels, cfg))
            return jax.lax.pmean(metrics, axes)

        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), batch_pspecs(batch)),
            out_specs=P(),
            check_vma=False,
        )(params, batch)

    return jax.jit(eval_step, static_argnames=("with_pde",))


def _ds_point_slicer(mesh: Mesh, scfg):
    """Points-axis splitter for the device-sampling loss on 2-D meshes.

    Every (data, points) device replicates its data slot's cube and keys, so
    all points shards draw the IDENTICAL global sample; the slicer then takes
    this shard's contiguous chunk of the sampled margin/inter sets, splitting
    the decode/PDE work n_points-ways.  Per-shard means pmean to the exact
    global mean (equal chunk sizes), so losses/grads match the
    single-controller step up to float reassociation.  Returns None on 1-D
    meshes (no slicing)."""
    import jax.numpy as jnp

    from deepphysinet_tpu.train.train_step import PointBatch

    n_points = int(mesh.shape.get("points", 1))
    if n_points <= 1:
        return None
    for label, n in (("n_margin", scfg.n_margin), ("n_inter", scfg.n_inter)):
        if n % n_points:
            raise ValueError(
                f"SamplerConfig.{label}={n} not divisible by the mesh points "
                f"axis ({n_points}); pad the sample sizes or use points=1")

    def slicer(pb: PointBatch) -> PointBatch:
        idx = jax.lax.axis_index("points")
        n = pb.x.shape[1]
        k = n // n_points

        def sl(a):
            if a is None:
                return None
            return jax.lax.dynamic_slice_in_dim(a, idx * k, k, axis=1)

        return PointBatch(x=sl(pb.x), y=sl(pb.y), t=sl(pb.t), f=sl(pb.f),
                          nwp=sl(pb.nwp), labels=sl(pb.labels))

    return slicer


def make_sharded_device_sampling_step(model, tx, cfg: StepConfig, mesh: Mesh, scfg):
    """Mesh-sharded on-device-sampling step: one window per ``data`` slot.

    Each device holds its windows' cubes and samples its own fresh points
    every step.  Per-window PRNG keys come from one global split (B_global
    keys; data shard d takes the contiguous slice at its mesh position), so
    with the production geometry -- ONE window per data slot, the only shape
    the trainer feeds -- window->key assignment matches the single-controller
    run exactly, including across processes (the strided multi-host loader
    maps window k of the global order to global row k when b_local == 1;
    tests/test_multihost.py asserts the resulting loss parity).  With
    multiple windows per slot the assignment is still deterministic but no
    longer layout-invariant (rows permute between loader shardings).  This is
    the production configuration: host bandwidth per chip stays constant as
    the slice grows.
    """
    from deepphysinet_tpu.train.device_sampling import CubeBatch, make_ds_loss_fn

    loss_fn = make_ds_loss_fn(model, cfg, scfg,
                              point_slicer=_ds_point_slicer(mesh, scfg))
    axes = tuple(mesh.axis_names)
    n_data = mesh.shape["data"]

    def step(state: TrainState, batch: CubeBatch, key, with_pde: bool):
        def body(state, local: CubeBatch, key):
            b_local = local.field.shape[0]
            keys = jax.random.split(key, b_local * n_data)
            keys = keys.reshape(n_data, b_local, *keys.shape[1:])
            local_keys = keys[jax.lax.axis_index("data")]
            (_, (metrics, pred_norm, labels)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, local, local_keys, with_pde)
            grads = jax.lax.pmean(grads, axes)
            metrics = jax.lax.pmean(metrics, axes)
            var_m = jax.lax.pmean(_variable_metrics(pred_norm, labels, cfg), axes)
            new_state, metrics = apply_gradient_update(tx, cfg, state, grads, metrics)
            metrics.update(var_m)
            return new_state, metrics

        # every CubeBatch field (including the optional pool_* arrays) is
        # [B, ...] window-major -> shard along the data axis; building the
        # spec tree from the batch keeps absent (None) fields absent
        cube_specs = jax.tree.map(lambda _: P("data"), batch)
        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), cube_specs, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(state, batch, key)

    return jax.jit(step, static_argnames=("with_pde",), donate_argnums=(0,))


def make_sharded_device_sampling_eval_step(model, cfg: StepConfig, mesh: Mesh, scfg):
    """Mesh-sharded device-sampling validation: one window per ``data`` slot,
    points drawn on-device with the same global-key slicing as the sharded
    train step, metrics pmean'd to global means.  A COLLECTIVE: every
    process must call it at the same step (the device loop's log condition
    is lockstep); only rank 0 fetches/logs."""
    from deepphysinet_tpu.train.device_sampling import CubeBatch, make_ds_loss_fn

    loss_fn = make_ds_loss_fn(model, cfg, scfg,
                              point_slicer=_ds_point_slicer(mesh, scfg))
    axes = tuple(mesh.axis_names)
    n_data = mesh.shape["data"]

    def eval_step(params, batch: CubeBatch, key, with_pde: bool):
        def body(params, local: CubeBatch, key):
            b_local = local.field.shape[0]
            keys = jax.random.split(key, b_local * n_data)
            keys = keys.reshape(n_data, b_local, *keys.shape[1:])
            local_keys = keys[jax.lax.axis_index("data")]
            _, (metrics, pred_norm, labels) = loss_fn(
                params, local, local_keys, with_pde)
            metrics.update(_variable_metrics(pred_norm, labels, cfg))
            return jax.lax.pmean(metrics, axes)

        cube_specs = jax.tree.map(lambda _: P("data"), batch)
        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), cube_specs, P()),
            out_specs=P(),
            check_vma=False,
        )(params, batch, key)

    return jax.jit(eval_step, static_argnames=("with_pde",))

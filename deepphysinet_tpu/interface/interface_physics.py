"""InterfacePhysics: the training/validation/inference runtime.

The TPU-native counterpart of the reference's 1540-line trainer
(interface/interface_physics.py:32-1541).  Orchestration stays on the host --
datasets, epochs, logging, checkpoints -- while every numeric step (encode,
decode, data loss, the six PDE residuals, grad, clip, update) lives inside one
donated jit (train/train_step.py) running single-chip or GSPMD-sharded over a
device mesh (parallel/sharding.py; replaces run_train_interface_dist's
DDP/NCCL path :848-1404).

Behavioral parity notes:
* curriculum: data-loss-only before ``pde_start_step`` (default 2000) steps
  (:436-441), switched as a static jit flag;
* validation: one valid batch evaluated every ``log_step`` like the reference's
  interleaved loop (:639-751);
* checkpoints carry the same metadata bundle (:838-845) and additionally the
  optimizer state (documented improvement);
* the dist-path call semantics of place_one_batch are used (reference quirk Q3:
  its single-GPU path passes arguments in a broken order).

Tunnel-aware logging: all step metrics are packed into ONE device array and
fetched with a single transfer per log step (device->host fetches through the
axon tunnel cost tens of seconds each).
"""

from __future__ import annotations

import datetime
import math
import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepphysinet_tpu.data.dataset import PhysicsDataset
from deepphysinet_tpu.data.pipeline import PrefetchLoader
from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.ops.coords import CoordSpec
from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
from deepphysinet_tpu.registry import INTERFACES
from deepphysinet_tpu.train import checkpoint as ckpt
from deepphysinet_tpu.train.optim import build_optimizer, set_learning_rate
from deepphysinet_tpu.train.schedules import build_lr_schedule
from deepphysinet_tpu.train.train_step import (
    Batch,
    PointBatch,
    StepConfig,
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from deepphysinet_tpu.utils.time_metric import TimeMetric

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "f32": jnp.float32, "bf16": jnp.bfloat16}


def _summary_writer(log_path: str, enabled: bool = True):
    """tensorboardX writer; a no-op stub when disabled (non-main ranks --
    creation itself writes event files, so it must be rank-gated, not just
    the add_scalar calls; reference rank-0 gating interface_physics.py:877)
    or when tensorboardX is unavailable."""
    if not enabled:
        class _Null:
            def add_scalar(self, *a, **k):
                pass

            def close(self):
                pass

        return _Null()
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(log_path)
    except Exception as e:  # pragma: no cover - tensorboardX present in target env
        import warnings

        warnings.warn(
            f"tensorboardX unavailable ({e}); scalar summaries will NOT be "
            "recorded for this run (text log + checkpoints are unaffected)",
            RuntimeWarning,
            stacklevel=2,
        )

        class _Null:
            def add_scalar(self, *a, **k):
                pass

            def close(self):
                pass

        return _Null()


# Metric fetch + log writes off the training thread: device->host fetches
# through the axon tunnel cost seconds each; doing them inline collapses
# end-to-end throughput from the compiled-step rate (~85 fps) to ~10. The
# worker only ever touches freshly-created output arrays (never donated
# buffers), so it is safe against the train step's buffer donation. close()
# drains the queue (called before checkpoints / at loop exit so logs are
# complete and ordered).
from deepphysinet_tpu.utils.async_worker import AsyncWorker as _AsyncLogger


@INTERFACES.register("InterfacePhysics")
class InterfacePhysics:
    def __init__(
        self,
        meta_cfg: dict,
        net_cfg: dict,
        obs_norm_cfg: dict,
        variable_cfg: dict,
        train_cfg: dict,
        test_cfg: Optional[dict] = None,
        inference_cfg: Optional[dict] = None,
        **kwargs,
    ):
        self.meta_cfg = dict(meta_cfg)
        self.net_cfg = dict(net_cfg)
        self.obs_norm_cfg = dict(obs_norm_cfg)
        self.variable_cfg = dict(variable_cfg)
        self.train_cfg = dict(train_cfg)
        self.test_cfg = dict(test_cfg or {})
        self.inference_cfg = dict(inference_cfg or {})

        tpu_cfg = dict(self.train_cfg.get("tpu", {}))
        self.compute_dtype = _DTYPES[str(tpu_cfg.get("compute_dtype", "float32")).lower()]
        self.attn_impl = tpu_cfg.get("attn_impl")
        self.pde_start_step = int(tpu_cfg.get("pde_start_step", 2000))
        self.sample_mode = str(tpu_cfg.get("sample_mode", "host"))
        # device-sampling margin sampler: 'iid' = the reference's per-point
        # uniform draw (random HBM row-gathers each step); 'pool' = one
        # contiguous slice of a per-window pre-permuted label pool
        # (build_pool) -- same uniform marginal, no within-step duplicates,
        # and the ~1 ms/step gather-latency floor disappears (docs/PERF.md
        # round-3 (i)/(j)).
        self.ds_sampler = str(tpu_cfg.get("ds_sampler", "iid"))
        self.kernel_version = int(tpu_cfg.get("kernel_version", 7))
        # device-mode validation at every log step (True, the default) --
        # set False for control soaks isolating the train loop's own
        # throughput from the validation dispatch (docs/PERF.md round 5)
        self.device_valid = bool(tpu_cfg.get("device_valid", True))
        self.packed_assembly = bool(tpu_cfg.get("packed_assembly", True))
        self.ckpt_backend = str(tpu_cfg.get("ckpt_backend", "pickle"))
        # Persistent XLA compilation cache: resumes (preemption restarts,
        # repeated eval CLIs) deserialize the ~20-40 s step executables
        # instead of recompiling them (utils/compile_cache.py).
        if tpu_cfg.get("compilation_cache_dir"):
            from deepphysinet_tpu.utils.compile_cache import enable_compilation_cache

            enable_compilation_cache(tpu_cfg["compilation_cache_dir"])
        # Engine default (docs/PERF.md, reference geometry): 'kernel' (fused
        # Pallas forward+backward, 4.9 ms/step, soak-convergence validated)
        # on TPU; 'jvp' (analytic-tangent collapsed-algebra XLA path,
        # 8.9 ms) elsewhere -- the kernel op falls back to the same math
        # off-TPU anyway.  Both require mean_norm observation normalization;
        # fall back to 'linearize' if any variable uses another scheme.
        default_engine = "kernel" if jax.default_backend() == "tpu" else "jvp"
        for v in self.obs_norm_cfg.values():
            if v.get("use_norm", True) and str(
                v.get("norm_type", "mean_norm")).lower() != "mean_norm":
                default_engine = "linearize"
        # explicit None means "auto", same as an absent key (and as attn_impl)
        self.pde_engine = str(tpu_cfg.get("pde_engine") or default_engine)

        meta = {k: v for k, v in self.meta_cfg.items() if k not in ("name",)}
        net = {k: v for k, v in self.net_cfg.items() if k not in ("name",)}
        self.physics_net = PhysicsNet(
            meta_cfg=meta, net_cfg=net, compute_dtype=self.compute_dtype,
            attn_impl=self.attn_impl,
        )

        img_size = self.train_cfg["img_size"]
        if isinstance(img_size, (int, float)):
            self.lat_size = self.lon_size = int(img_size)
        else:
            self.lat_size, self.lon_size = img_size

    # ---- batch conversion ----

    def _to_batch(self, data: Dict[str, np.ndarray]) -> Batch:
        # multi-process: keep leaves on HOST -- the globalizing put
        # (parallel/mesh.py put_sharded) consumes process-local numpy; pushing
        # to the local device here would force a device->host round trip of
        # every leaf on every step (tens of seconds each on slow-tunnel days)
        if jax.process_count() > 1:
            def f32(x):
                return np.asarray(x, np.float32)

            zeros_like = np.zeros_like
        else:
            def f32(x):
                return jnp.asarray(x, jnp.float32)

            zeros_like = jnp.zeros_like

        margin = PointBatch(
            x=f32(data["margin_x"]), y=f32(data["margin_y"]), t=f32(data["margin_t"]),
            f=f32(data["margin_f"]), nwp=f32(data["margin_input_data"]),
            labels=f32(data["margin_data"]),
        )
        inter = PointBatch(
            x=f32(data["inter_x"]), y=f32(data["inter_y"]), t=f32(data["inter_t"]),
            f=f32(data["inter_f"]), nwp=f32(data["inter_data"]),
            labels=zeros_like(f32(data["inter_data"])),
        )
        return Batch(
            field=f32(data["field_data"]),
            forecast_h=f32(data["forecast_h"]).reshape(-1),
            margin=margin,
            inter=inter,
        )

    def _step_cfg(self, pred_t_span: float, forecast_time_period: float,
                  forecast_h_snap: float = 0.0) -> StepConfig:
        specs = norm_specs_from_cfg(self.obs_norm_cfg)
        losses = self.train_cfg["losses"]
        return StepConfig(
            coord_spec=CoordSpec(
                lon_size=self.lon_size, lat_size=self.lat_size,
                dx=self.dx, dy=self.dy, pred_t_span=pred_t_span,
            ),
            obs_specs=tuple(specs[k] for k in OBS_NAME_ORDER),
            loss_factor=dict(losses["loss_factor"]),
            forecast_time_period=float(forecast_time_period),
            forecast_h_snap=float(forecast_h_snap),
            prediction_loss=losses["prediction_loss"]["name"],
            prediction_beta=float(losses["prediction_loss"].get("beta", 0.1)),
            pde_loss=losses["pde_loss"]["name"],
            pde_start_step=self.pde_start_step,
            pde_engine=self.pde_engine,
            kernel_version=self.kernel_version,
            packed_assembly=self.packed_assembly,
        )

    @staticmethod
    def _fetch_metrics(metrics: Dict[str, jnp.ndarray]) -> Dict[str, float]:
        """ONE device->host transfer for all scalars (tunnel-aware).

        Multi-process: the pack (a device computation) cannot be issued by
        one controller alone, so each scalar is read directly -- a LOCAL
        fetch of the replicated output's addressable shard, safe to call on
        any subset of ranks."""
        keys = sorted(metrics.keys())
        if jax.process_count() > 1:
            # device_get on the whole dict starts copy_to_host_async for
            # every leaf before blocking: the N scalar transfers overlap into
            # ~one tunnel round trip without issuing any device computation
            # (a device-side pack could not be launched by one controller)
            vals = jax.device_get({k: metrics[k] for k in keys})
            return {k: float(np.asarray(vals[k])) for k in keys}
        packed = jnp.stack([metrics[k].astype(jnp.float32) for k in keys])
        vals = np.asarray(jax.device_get(packed))
        return {k: float(v) for k, v in zip(keys, vals)}

    # ---- training ----

    def run_train_interface(self, dist: bool = False, max_steps: Optional[int] = None, **kwargs):
        tc = self.train_cfg
        batch_size = tc["batch_size"]
        num_epoch = tc["num_epoch"]
        num_workers = tc.get("num_workers", 2)
        self.dx = float(tc["dx"])
        self.dy = float(tc["dy"])
        time_step = tc.get("lable_time_step", tc.get("label_time_step", 1))
        self.dt = float(60 * 60 * time_step)

        checkpoint_path = kwargs.get("checkpoint_path") or tc["checkpoints"]["checkpoints_path"]
        log_path = kwargs.get("log_path") or tc["log"]["log_path"]
        save_step = tc["checkpoints"].get("save_step", 1)
        log_step = tc["log"].get("log_step", 100)
        with_vis = tc["log"].get("with_vis", False)
        vis_path = tc["log"].get("vis_path", "")

        os.makedirs(log_path, exist_ok=True)
        os.makedirs(checkpoint_path, exist_ok=True)
        # create log artifacts on rank 0 ONLY: on a shared filesystem two
        # ranks starting within the same second would truncate the same log
        # file, and every rank would litter empty tensorboard event files
        is_main_proc = jax.process_index() == 0
        date_str = datetime.datetime.now().strftime("%Y-%m-%d_%H_%M_%S")
        log_fp = (open(os.path.join(log_path, f"log_{date_str}.txt"), "w")
                  if is_main_proc else open(os.devnull, "w"))
        summary = _summary_writer(log_path, enabled=is_main_proc)

        train_dataset = PhysicsDataset(
            **tc["train_data"], input_variable_cfg=self.variable_cfg,
            out_variable_cfg=self.obs_norm_cfg, dx=self.dx, dy=self.dy,
        )
        valid_dataset = PhysicsDataset(
            **tc["valid_data"], input_variable_cfg=self.variable_cfg,
            out_variable_cfg=self.obs_norm_cfg, dx=self.dx, dy=self.dy,
        )
        window_h = train_dataset.input_time_step * train_dataset.input_time_step_nums
        pred_t_span = float(window_h * 3600)
        self.pred_t_span = pred_t_span
        # dist-path lead-time snapping to the window grid (reference
        # interface_physics.py:996-997); single-process path normalizes raw
        cfg = self._step_cfg(pred_t_span, train_dataset.forecast_time_period,
                             forecast_h_snap=float(window_h) if dist else 0.0)

        sched_cfg = tc.get("lr_schedule")
        opt_cfg = dict(tc["optimizer"])
        base_lr = float(opt_cfg.get("lr", 1e-4))
        schedule = (
            build_lr_schedule(lr=base_lr, **sched_cfg) if sched_cfg else (lambda e: base_lr)
        )
        tx = build_optimizer(**opt_cfg)

        # mesh first: the dist path needs one window per `data` slot, so the
        # GLOBAL loader batch must equal batch_size * mesh.data (DDP gives
        # each rank its own window; reference interface_physics.py:899-936)
        mesh = None
        nproc, rank = jax.process_count(), jax.process_index()
        self.is_main = is_main = rank == 0
        if dist and len(jax.devices()) > 1:
            from deepphysinet_tpu.parallel.mesh import MeshConfig, make_mesh

            mesh_cfg = dict(tc.get("tpu", {}).get("mesh", {}))
            mesh = make_mesh(MeshConfig(**mesh_cfg) if mesh_cfg else MeshConfig())
            batch_size = batch_size * mesh.shape["data"]
            print(f"mesh: {dict(mesh.shape)}; effective window batch: {batch_size}")
        if nproc > 1 and mesh is None:
            raise RuntimeError(
                "multi-process jax without the dist path: call "
                "run_train_interface_dist (the mesh must span all hosts)")

        # per-process loader: each host loads only its stride of the globally
        # shuffled window order (DistributedSampler equivalent, reference
        # :936) and contributes batch_size/nproc rows of every global batch
        if batch_size % nproc != 0:
            raise ValueError(
                f"global window batch {batch_size} not divisible by "
                f"{nproc} processes")
        local_batch = batch_size // nproc
        train_loader = PrefetchLoader(
            train_dataset, local_batch, shuffle=True, drop_last=True,
            num_workers=num_workers, shard_id=rank, num_shards=nproc,
        )
        # validation: through the mesh-sharded eval step when a mesh exists
        # (global batch = the scaled window batch), unsharded otherwise
        valid_batch = (batch_size if mesh is not None else tc["batch_size"])
        if mesh is not None:
            valid_batch = self._feasible_valid_batch(
                len(valid_dataset), valid_batch, mesh.shape["data"], nproc)
        valid_loader = PrefetchLoader(
            valid_dataset, valid_batch // nproc, shuffle=True, drop_last=True,
            num_workers=1, shard_id=rank, num_shards=nproc,
        )

        # ---- state init / resume ----
        state_dict, current_epoch, global_step = ckpt.load_checkpoint(
            checkpoint_path, prefix="physics", backend=self.ckpt_backend)
        sample = next(iter(train_loader))
        sample_batch = self._to_batch(sample)
        state = create_train_state(self.physics_net, tx, jax.random.PRNGKey(0), sample_batch)
        if state_dict is not None:
            print(f"resume from epoch {current_epoch} global_step {global_step}")
            log_fp.write(f"resume from epoch {current_epoch} global_step {global_step}\n")
            state = self._restore_state(state, state_dict, tx)

        # resume-time LR injection (BEFORE the device-mode dispatch: a resumed
        # run must start at schedule(current_epoch), not the optimizer's base)
        lr = schedule(max(current_epoch, 0))
        set_learning_rate(state.opt_state, lr)
        print("set lr to:", lr)

        # ---- on-device sampling mode: host ships cubes, points sampled in-jit ----
        if self.sample_mode == "device":
            return self._run_train_device_sampling(
                train_dataset, valid_dataset, cfg, tx, schedule, state,
                current_epoch, global_step, num_epoch, log_step, save_step,
                checkpoint_path, log_path, log_fp, summary, max_steps, time_step,
                pred_t_span, mesh=mesh,
            )

        # ---- compiled steps ----
        if mesh is not None:
            from deepphysinet_tpu.parallel.mesh import (
                globalize_replicated, shard_batch)
            from deepphysinet_tpu.parallel.sharding import (
                make_sharded_eval_step, make_sharded_train_step)

            train_step = make_sharded_train_step(self.physics_net, tx, cfg, mesh)
            self._shard = lambda b: shard_batch(b, mesh)
            eval_step = make_sharded_eval_step(self.physics_net, cfg, mesh)
            # the valid split's point counts are user-configured and need
            # not divide the mesh points axis (the train batch's do, via
            # the dataset's own sizes); trim rather than crash at the
            # first log step
            pts_axis = int(mesh.shape.get("points", 1))
            self._shard_valid = lambda b: shard_batch(
                self._trim_points_multiple(b, pts_axis), mesh)
            if nproc > 1:
                # replicate the (identically-seeded / identically-restored)
                # state across all hosts' devices
                state = globalize_replicated(state, mesh)
        else:
            train_step = make_train_step(self.physics_net, tx, cfg)
            self._shard = lambda b: b
            eval_step = make_eval_step(self.physics_net, cfg)
            self._shard_valid = lambda b: b

        if with_vis:
            from deepphysinet_tpu.utils.vis import VisUtils

            vis_cfg = dict(tc["log"].get("vis_downscale_cfg", {}))
            vis_cfg.setdefault("landsea_file", os.path.join(
                train_dataset.constant_path, "landsea.tiff"))
            vis_utils = VisUtils(**vis_cfg)

        time_metric = TimeMetric()

        # Preemption-safe checkpointing: SIGTERM triggers a mid-epoch save of
        # physics_latest (the reference can only resume from epoch boundaries).
        preempted = {"flag": False}
        self._install_preemption_handler(preempted)
        # multi-process flag-agreement cadence (see _agreed_preemption)
        preempt_check = int(tc.get("tpu", {}).get("preempt_check_step", 20))
        # epoch saves off the loop thread (same policy as the device loop).
        # Multi-process: synchronous rank-0 saves only -- the async snapshot
        # (jnp.copy of global arrays) would be a device computation issued by
        # one controller, which deadlocks a multi-controller program; the
        # synchronous path reads the locally-addressable replicated shards.
        async_ckpt = (ckpt.AsyncCheckpointer()
                      if bool(tc.get("tpu", {}).get("async_ckpt", True))
                      and nproc == 1 else None)

        meta_kwargs = dict(
            dx=self.dx, dy=self.dy, dt=self.dt,
            pred_x_span=self.dx * self.lon_size,
            pred_y_span=self.dy * self.lat_size,
            pred_t_span=pred_t_span,
            label_time_step=time_step,
            input_variable_cfg=self.variable_cfg,
            input_time_step=train_dataset.input_time_step,
            input_time_step_nums=train_dataset.input_time_step_nums,
            obs_norm_cfg=self.obs_norm_cfg,
            start_time=str(train_dataset.start_time),
            end_time=str(train_dataset.end_time),
        )
        valid_iter: Iterator = iter(valid_loader)
        steps_since_log = 0
        stop = False
        preemption_saved = False
        try:
            for epoch in range(current_epoch, num_epoch):
                if stop:
                    break
                for batch_id, data in enumerate(train_loader):
                    with_pde = bool(tc.get("with_pde", True)) and global_step >= self.pde_start_step
                    global_step += 1
                    batch = self._shard(self._to_batch(data))
                    state, metrics = train_step(state, batch, with_pde)
                    steps_since_log += 1

                    if global_step % log_step == 1 or (max_steps and global_step >= max_steps):
                        fps = time_metric.get_fps(steps_since_log * batch_size)
                        time_metric.reset()
                        steps_since_log = 0
                        # host-side writes are rank-0-gated (reference
                        # :877,962); the metric fetch is a local read of the
                        # replicated outputs, so non-main ranks skip it
                        if is_main:
                            m = self._fetch_metrics(metrics)
                            fh = float(np.asarray(data["forecast_h"]).reshape(-1)[0])
                            parts = [
                                f"epoch:{epoch}/{num_epoch}", f"batch:{batch_id}/{len(train_loader)}",
                                f"iter:{global_step}", f"train loss:{m['total_loss']:.6f}",
                                f"margin_loss:{m['margin_loss']:.6f}", f"forecast:{int(fh):03d}h",
                                f"grad:{m['grad_norm']:.3e}", f"fps:{fps:.3f}",
                            ]
                            line = ",".join(parts)
                            print("=========training=========")
                            print(line)
                            log_fp.write(line + "\n")
                            log_fp.flush()
                            for k, v in m.items():
                                summary.add_scalar(f"training/{k}", v, global_step)
                            summary.add_scalar(f"training_f{int(fh):03d}/margin_loss",
                                               m["margin_loss"], global_step)

                        # ---- interleaved validation batch (:639-751) ----
                        # EVERY process participates (the sharded eval is a
                        # collective over the global mesh); only rank 0 logs
                        vdata = None
                        if len(valid_loader) > 0:
                            try:
                                vdata = next(valid_iter)
                            except StopIteration:
                                valid_iter = iter(valid_loader)
                                vdata = next(valid_iter)
                        if vdata is not None:
                            vbatch = self._shard_valid(self._to_batch(vdata))
                            vmetrics = eval_step(state.params, vbatch, with_pde)
                            if is_main:
                                vm = self._fetch_metrics(vmetrics)
                                vline = f"valid loss:{vm['total_loss']:.6f},margin:{vm['margin_loss']:.6f}"
                                print("=========validation=========")
                                print(vline)
                                log_fp.write(vline + "\n")
                                for k, v in vm.items():
                                    summary.add_scalar(f"validation/{k}", v, global_step)

                        if with_vis and vis_path and nproc == 1:
                            self._render_grid(state.params, train_dataset, data, cfg,
                                              os.path.join(vis_path, "train_results"),
                                              global_step, with_pde)

                    if self._agreed_preemption(preempted, nproc, global_step,
                                               preempt_check):
                        if is_main:
                            self._preemption_save(async_ckpt, checkpoint_path, epoch,
                                                  global_step, state, **meta_kwargs)
                        preemption_saved = True
                        stop = True
                        break
                    if max_steps and global_step >= max_steps:
                        stop = True
                        break

                is_last = stop or epoch == num_epoch - 1
                # LR steps once per epoch like the reference scheduler
                # (interface_physics.py:831-837), NOT only on save epochs;
                # it runs on EVERY process (it feeds the next compiled steps)
                lr = schedule(epoch + 1)
                set_learning_rate(state.opt_state, lr)
                if (epoch % save_step == 0 or is_last) and not preemption_saved:
                    if is_main:
                        summary.add_scalar("learning_rate", lr, global_step)
                        self._epoch_save(async_ckpt, is_last, checkpoint_path,
                                         epoch, global_step, state, meta_kwargs)
            if async_ckpt is not None:
                async_ckpt.close()  # drain in-flight saves
            log_fp.close()
            summary.close()
        finally:
            # never leak a mid-write checkpoint past an exception
            if async_ckpt is not None:
                async_ckpt.close_quietly()
            log_fp.close()
            summary.close()
        return state

    def run_train_interface_dist(self, **kwargs):
        """Mesh data-parallel training (replaces the reference's DDP path,
        interface_physics.py:848-1404).

        Single host: the mesh spans the local chips.  Multi-host: launch one
        process per host with the jax.distributed env set (or call
        parallel.multihost.initialize_distributed first, as train.py --dist
        does); each process then loads its stride of the window order,
        contributes its local batch rows to the global mesh, and rank 0 owns
        logging/checkpointing.  Note: jax.distributed must initialize before
        the first backend touch, so a launcher should init BEFORE building
        the interface -- the call here only covers the already-initialized
        and single-host cases."""
        from deepphysinet_tpu.parallel.multihost import initialize_distributed

        initialize_distributed()
        return self.run_train_interface(dist=True, **kwargs)

    _MAX_CONSECUTIVE_VALID_FAILURES = 3

    def _valid_windows_cap(self, valid_dataset, floor: int = 1) -> int:
        """How many valid windows device-mode validation rotates over.

        Device-mode validation scores a FIXED rotating subset of valid
        windows whose cubes stay device-resident: the subset size equals
        the cube-cache capacity, so after warmup every validation is pure
        device compute (no host IO, no tunnel transfer).  Rotating over
        the whole split instead would thrash any bounded cache (cyclic
        access defeats LRU) and re-pay ~1 s of raster IO plus a ~22 MB
        transfer per log_step.  `tpu.valid_windows` (default 8) widens the
        subset at ~22 MB HBM per window."""
        cap = int(self.train_cfg.get("tpu", {}).get("valid_windows", 8))
        return min(len(valid_dataset), max(floor, cap))

    @staticmethod
    def _valid_scfg(scfg, valid_dataset):
        """The valid split's own sampling sizes (reference semantics: the
        valid dataloader used valid_data's label_batch_size /
        batch_size_inter, interface_physics.py:639-751 -- not the train
        sizes)."""
        import dataclasses

        return dataclasses.replace(
            scfg, n_margin=valid_dataset.label_batch_size,
            n_inter=valid_dataset.inter_batch_size)

    def _device_valid_cube(self, valid_dataset, idx, cap, scfg_v=None,
                           cfg=None):
        """Device-resident cube for valid window ``idx``, LRU-cached.

        ``cap`` matches the rotation subset (_valid_windows_cap), so every
        rotated window's cube transfers once and then lives on device.
        With ds_sampler='pool', ``scfg_v``/``cfg`` (the VALID split's
        sampler sizes + step config) drive the pool build, mirroring the
        train-loop cubes."""
        from deepphysinet_tpu.train.device_sampling import (
            DeviceLRU, attach_pool_nwp, cube_batch_from_items,
            expected_cube_dims)

        if not hasattr(self, "_valid_cubes"):
            self._valid_cubes = DeviceLRU(cap)
        use_pool = self.ds_sampler == "pool" and scfg_v is not None

        def build():
            cube = cube_batch_from_items(
                [valid_dataset.get_cube_item(idx)],
                pool_pad=scfg_v.n_margin if use_pool else None,
                keep_label_cube=not use_pool,
                expect_dims=(expected_cube_dims(scfg_v, cfg.coord_spec)
                             if scfg_v is not None and cfg is not None else None))
            cube = jax.tree.map(jnp.asarray, cube)
            if use_pool:
                cube = attach_pool_nwp(cube, scfg_v, cfg.coord_spec)
            return cube

        return self._valid_cubes.get(idx, build)

    def _device_mode_validation(self, valid_dataset, cfg, scfg, state,
                                with_pde, fetch: bool = True):
        """One device-sampled validation window for the device-sampling loop.

        Points are drawn ON-DEVICE from the cached window cube with a FIXED
        key: repeated validations score the same points (deterministic valid
        curves) at zero recurring host cost.  The previous design re-ran the
        host dataloader's point sampling (``valid_dataset[idx]``, ~1 s of
        numpy work) every call -- paid every log_step, it capped the device
        loop's e2e fps well below the step rate (docs/PERF.md round-3 (h)).
        Rotation is over a fixed device-resident window subset
        (_valid_windows_cap) whose cubes transfer once; point sizes follow
        the VALID split's label_batch_size / batch_size_inter
        (_valid_scfg), like the reference's valid dataloader.

        ``fetch=False`` returns the device metric arrays without the tunnel
        fetch (dispatch must stay on the training thread: the eval reads
        ``state.params``, which the NEXT train step donates).

        A transient failure (one bad file) must not kill a long run, but a
        persistent one (shape/config bug) must not degrade into an endless
        warning stream either: after 3 consecutive failures the error is
        re-raised.
        """
        try:
            if not hasattr(self, "_valid_eval_step"):
                from deepphysinet_tpu.train.device_sampling import (
                    make_device_sampling_eval_step)

                self._valid_eval_step = make_device_sampling_eval_step(
                    self.physics_net, cfg,
                    self._valid_scfg(scfg, valid_dataset))
                self._valid_item = 0
                self._valid_failures = 0
                self._valid_key = jax.random.PRNGKey(7919)
                self._n_valid_rot = self._valid_windows_cap(valid_dataset)
            idx = self._valid_item % self._n_valid_rot
            self._valid_item += 1
            cube = self._device_valid_cube(
                valid_dataset, idx, self._n_valid_rot,
                scfg_v=self._valid_scfg(scfg, valid_dataset), cfg=cfg)
            out = self._valid_eval_step(state.params, cube, self._valid_key,
                                        with_pde)
            if fetch:
                out = self._fetch_metrics(out)
            self._valid_failures = 0
            return out
        except Exception as e:
            self._valid_failures = getattr(self, "_valid_failures", 0) + 1
            if self._valid_failures >= self._MAX_CONSECUTIVE_VALID_FAILURES:
                raise RuntimeError(
                    f"device-mode validation failed {self._valid_failures} "
                    "times in a row; failing the run"
                ) from e
            print(f"warning: device-mode validation failed ({e}); "
                  f"{self._valid_failures}/{self._MAX_CONSECUTIVE_VALID_FAILURES}")
            return None

    def _device_mode_validation_dist(self, valid_dataset, cfg, scfg, state,
                                     with_pde, mesh, nproc, rank):
        """Multi-process device-mode validation: a COLLECTIVE over the mesh.

        Every rank contributes its distinct validation windows (one cube per
        local data row), globalized through the sharded put, and all ranks
        enter the shard_map'd device-sampling eval together with the same
        FIXED key (deterministic points, zero recurring host-sampling cost
        -- same redesign as the single-process path); only rank 0 later
        fetches/logs the pmean'd metrics.  Like the single-process path,
        rotation is over a fixed device-resident window subset
        (_valid_windows_cap; cache capacity = the number of distinct
        window combinations, so steady state re-transfers nothing).
        Unlike the single-controller path there is no skip-on-error
        tolerance: a rank skipping a collective would strand the others,
        so assembly errors are fatal (consistent with every other
        collective in the loop)."""
        from jax.sharding import NamedSharding, PartitionSpec as _P

        from deepphysinet_tpu.parallel.mesh import put_sharded
        from deepphysinet_tpu.parallel.sharding import (
            make_sharded_device_sampling_eval_step)
        from deepphysinet_tpu.train.device_sampling import (
            DeviceLRU, attach_pool_nwp, cube_batch_from_items,
            expected_cube_dims)

        n_data = mesh.shape["data"]
        if not hasattr(self, "_valid_sharded_step"):
            self._valid_sharded_step = make_sharded_device_sampling_eval_step(
                self.physics_net, cfg, mesh,
                self._valid_scfg(scfg, valid_dataset))
            self._valid_item = 0
            # rotate over >= one full mesh batch of windows; the tuple
            # cycle then has at most _n_valid_rot distinct keys
            self._n_valid_rot = self._valid_windows_cap(valid_dataset,
                                                        floor=n_data)
            self._valid_dist_cubes = DeviceLRU(self._n_valid_rot)
            # identical host value on every process -> replicated global key
            self._valid_key = np.asarray(jax.random.key_data(
                jax.random.PRNGKey(7919)))
        rows = n_data // nproc  # local windows per process
        idxs = [(self._valid_item + rank * rows + j) % self._n_valid_rot
                for j in range(rows)]
        self._valid_item += n_data

        use_pool = self.ds_sampler == "pool"
        scfg_v = self._valid_scfg(scfg, valid_dataset)

        def build():
            sharding = NamedSharding(mesh, _P("data"))
            local = cube_batch_from_items(
                [valid_dataset.get_cube_item(i) for i in idxs],
                pool_pad=scfg_v.n_margin if use_pool else None,
                keep_label_cube=not use_pool,
                expect_dims=expected_cube_dims(scfg_v, cfg.coord_spec))
            cube = jax.tree.map(lambda x: put_sharded(x, sharding), local)
            if use_pool:
                cube = attach_pool_nwp(cube, scfg_v, cfg.coord_spec)
            return cube

        cube = self._valid_dist_cubes.get(tuple(idxs), build)
        return self._valid_sharded_step(state.params, cube, self._valid_key,
                                        with_pde)

    @staticmethod
    def print_key_args(**kwargs):
        """interface_physics.py:1538-1541 parity."""
        for key, value in kwargs.items():
            print(f"{key}:{value}")

    @staticmethod
    def _install_preemption_handler(flag: dict) -> None:
        """SIGTERM -> finish the current step, checkpoint, exit cleanly."""
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return

        def handler(signum, frame):
            flag["flag"] = True

        try:
            signal.signal(signal.SIGTERM, handler)
        except (ValueError, OSError):
            pass

    @staticmethod
    def _trim_points_multiple(batch, m: int):
        """Trim margin/inter point counts to multiples of the mesh points
        axis.

        The sharded eval shards the point dimension over ``points``; the
        valid split's label_batch_size / batch_size_inter are free-form
        user config, and an indivisible count must degrade to scoring a
        few fewer points -- not crash a run at its first log step."""
        if m <= 1:
            return batch

        def trim(pb):
            n = pb.x.shape[1]
            k = (n // m) * m
            if k == n:
                return pb
            if k == 0:
                raise ValueError(
                    f"validation point count {n} is smaller than the mesh "
                    f"points axis {m}")
            print(f"warning: validation points trimmed {n} -> {k} "
                  f"(mesh points axis {m})")
            return jax.tree.map(lambda a: a[:, :k], pb)

        return batch._replace(margin=trim(batch.margin), inter=trim(batch.inter))

    @staticmethod
    def _feasible_valid_batch(valid_len: int, valid_batch: int,
                              data_axis: int, nproc: int) -> int:
        """Clamp the mesh-path validation batch to what the split can fill.

        The mesh path scales the valid batch to the global window batch; a
        small valid split with ``drop_last=True`` would then yield ZERO
        batches and validation would silently vanish for the whole run.
        Clamp to the largest multiple of lcm(data_axis, nproc) — the batch
        must shard evenly over the mesh's data axis AND split evenly into
        per-process row counts — that the split can fill.  A split smaller
        than even one such batch keeps the scaled granule so the empty
        loader is skipped by the caller's ``len(valid_loader) > 0`` guard,
        with a warning either way."""
        g = math.lcm(data_axis, nproc)
        feasible = (valid_len // g) * g
        if feasible >= valid_batch:
            return valid_batch
        if feasible == 0:
            print(f"warning: valid split has {valid_len} windows < {g} "
                  "(mesh data axis x processes); interleaved validation "
                  "disabled")
            return g  # empty loader -> the >0 guard skips it
        print(f"warning: valid window batch clamped {valid_batch} -> "
              f"{feasible} (valid split has only {valid_len} windows)")
        return feasible

    @staticmethod
    def _agreed_preemption(preempted: dict, nproc: int, global_step: int = 0,
                           check_every: int = 20) -> bool:
        """Cross-process agreement on the preemption flag.

        SIGTERM delivery is per-process: if rank 0 stopped the moment its own
        flag flipped while another rank had already entered the next
        collective step, the survivors would block forever inside that
        collective.  Every rank therefore all-gathers its local flag at the
        same loop point and they stop together iff ANY rank was signalled.

        The all-gather is a device round-trip, so it runs only every
        ``check_every`` steps (``train_cfg.tpu.preempt_check_step``) -- the
        cadence condition depends only on ``global_step``, which is lockstep
        across processes, so every rank still enters the collective at the
        same steps.  Worst-case added preemption latency is check_every
        steps (~0.1 s at the 5 ms production step), well inside any grace
        window.  Single-process: just the local flag, every step, free."""
        if nproc <= 1:
            return bool(preempted["flag"])
        if check_every > 1 and global_step % check_every != 0:
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(preempted["flag"], np.int32))
        return bool(np.max(flags))

    @staticmethod
    def _drain_async_ckpt(async_ckpt) -> None:
        """Wait for in-flight async saves; a PRIOR save's failure is reported
        but must never prevent the synchronous save that follows."""
        if async_ckpt is None:
            return
        try:
            async_ckpt.wait()
        except Exception as e:
            print(f"warning: an earlier async checkpoint save failed ({e}); "
                  "proceeding with the synchronous save")

    def _epoch_save(self, async_ckpt, is_last, checkpoint_path, epoch,
                    global_step, state, meta_kwargs) -> None:
        """Epoch-boundary checkpoint: async mid-run, synchronous for the
        final epoch (returning implies a durable physics_latest)."""
        if async_ckpt is not None and not is_last:
            async_ckpt.submit(
                checkpoint_path, epoch, global_step,
                params=state.params, opt_state=state.opt_state,
                prefix="physics", backend=self.ckpt_backend, **meta_kwargs)
            return
        self._drain_async_ckpt(async_ckpt)
        ckpt.save_checkpoint(
            checkpoint_path, epoch, global_step, backend=self.ckpt_backend,
            params=state.params, opt_state=state.opt_state, prefix="physics",
            **meta_kwargs)

    def _preemption_save(self, async_ckpt, checkpoint_path, epoch,
                         global_step, state, **meta_kwargs) -> None:
        """Single synchronous save inside the SIGTERM grace window.

        Carries the full metadata bundle so the epoch-boundary save that
        would otherwise follow can be skipped -- a second ~10 s tunneled
        save inside the grace window risked being killed mid-write and
        briefly left a metadata-less physics_latest."""
        self._drain_async_ckpt(async_ckpt)
        print(f"preemption: saving checkpoint at step {global_step}")
        ckpt.save_checkpoint(checkpoint_path, epoch, global_step,
                             params=state.params, opt_state=state.opt_state,
                             prefix="physics", backend=self.ckpt_backend,
                             **meta_kwargs)

    def _run_train_device_sampling(
        self, train_dataset, valid_dataset, cfg, tx, schedule, state,
        current_epoch, global_step, num_epoch, log_step, save_step,
        checkpoint_path, log_path, log_fp, summary, max_steps, time_step,
        pred_t_span, mesh=None,
    ):
        """Training loop with on-device point sampling (train/device_sampling.py).

        The host only decodes files into window cubes; every optimizer step
        draws fresh points on-device.  With a mesh, one window feeds each
        `data` slot (parallel.make_sharded_device_sampling_step).
        """
        from deepphysinet_tpu.train.device_sampling import (
            CubeBatch, SamplerConfig, make_device_sampling_train_step)

        window_h = train_dataset.input_time_step * train_dataset.input_time_step_nums
        scfg = SamplerConfig(
            n_margin=train_dataset.label_batch_size,
            n_inter=train_dataset.inter_batch_size,
            window_h=window_h,
            input_time_step=train_dataset.input_time_step,
            label_time_step=int(train_dataset.label_time_step),
            begin_lat=train_dataset.begin_lat,
            begin_lon=train_dataset.begin_lon,
            fine_step=float(train_dataset.out_lon[1] - train_dataset.out_lon[0]),
            coarse_step=float(train_dataset.in_lon[1] - train_dataset.in_lon[0]),
        )
        nproc, rank = jax.process_count(), jax.process_index()
        is_main = rank == 0
        if mesh is not None:
            from deepphysinet_tpu.parallel.mesh import globalize_replicated
            from deepphysinet_tpu.parallel.sharding import (
                make_sharded_device_sampling_step)
            from jax.sharding import NamedSharding, PartitionSpec as _P

            step = make_sharded_device_sampling_step(self.physics_net, tx, cfg, mesh, scfg)
            data_sharding = NamedSharding(mesh, _P("data"))
            if mesh.shape["data"] % nproc != 0:
                raise ValueError(
                    f"mesh data axis {mesh.shape['data']} not divisible by "
                    f"{nproc} processes")
            loader_batch = mesh.shape["data"] // nproc  # windows per process
            if nproc > 1:
                state = globalize_replicated(state, mesh)
        else:
            step = make_device_sampling_train_step(self.physics_net, tx, cfg, scfg)
            data_sharding = None
            loader_batch = 1
        key = jax.random.PRNGKey(int(global_step) + 1)
        # Per-step sampler subkeys come from pre-split BLOCKS, fetched to the
        # HOST once per block.  Multi-process mode needs the subkey as an
        # identical host value on every rank (the jit promotes it to a
        # replicated global array); single-process used to keep the block on
        # device, but indexing a device array is one extra tunnel dispatch
        # PER STEP -- measured at 1.66 ms/step, ~25% of the whole host loop
        # (docs/PERF.md round 5 (e)).  A numpy row costs nothing, the stream
        # is bitwise identical (same split, same values), and the one
        # device->host block fetch amortizes to ~0 over _KEY_BLOCK steps.
        # (The fetch syncs on the dispatch queue, so it costs ~1 s through
        # the tunnel regardless of size -- 8192 keys amortize it to ~0.15
        # ms/step; the block itself is 64 KB.)
        _KEY_BLOCK = 8192
        _key_state = {"block": None, "i": _KEY_BLOCK}

        def next_subkey():
            nonlocal key
            if _key_state["i"] >= _KEY_BLOCK:
                ks = jax.random.split(key, _KEY_BLOCK + 1)
                key = ks[0]
                _key_state["block"] = np.asarray(ks[1:])
                _key_state["i"] = 0
            sub = _key_state["block"][_key_state["i"]]
            _key_state["i"] += 1
            return sub

        time_metric = TimeMetric()
        loop_metric = TimeMetric()  # never reset: wall-clock anchor for t:
        steps_since_log = 0
        preempted = {"flag": False}
        self._install_preemption_handler(preempted)
        # multi-process flag-agreement cadence (see _agreed_preemption)
        preempt_check = int(self.train_cfg.get("tpu", {}).get(
            "preempt_check_step", 20))
        async_log = _AsyncLogger()  # tunnel fetches off the dispatch loop
        # epoch-boundary saves off the hot loop too (tpu.async_ckpt=False for
        # strictly synchronous saves); preemption/final saves stay synchronous
        # after a drain
        async_ckpt = (ckpt.AsyncCheckpointer()
                      if bool(self.train_cfg.get("tpu", {}).get(
                          "async_ckpt", True)) and nproc == 1 else None)

        class _CubeView:
            def __init__(self, ds):
                self.ds = ds

            def __len__(self):
                return len(self.ds)

            def __getitem__(self, i):
                return self.ds.get_cube_item(i)

        from deepphysinet_tpu.data.pipeline import PrefetchLoader

        loader = PrefetchLoader(_CubeView(train_dataset), batch_size=loader_batch,
                                shuffle=True, drop_last=True, num_workers=2,
                                shard_id=rank, num_shards=nproc)

        # Device-side window cache (LRU): a window's cubes transfer once and
        # are resampled on-device every visit (host->device through a tunnel
        # can cost ~1 s for the 22 MB label cube; cap ~8 windows, evict oldest).
        from deepphysinet_tpu.train.device_sampling import DeviceLRU

        cube_cache = DeviceLRU(
            int(self.train_cfg.get("tpu", {}).get("device_cube_cache", 8)))

        use_pool = self.ds_sampler == "pool"

        def to_device_cube(data) -> "CubeBatch":
            """Window cubes in their FINAL device placement, cached.

            The cache holds the globalized/sharded device arrays (the step
            does not donate them), so a cached window costs zero host->device
            traffic on re-visits -- including multi-process mode, where the
            globalizing put consumes this process's local numpy rows exactly
            once per window.  With ds_sampler='pool' the window ships as a
            pre-permuted label pool instead of the raw label cube
            (build_pool; deterministic per-window seed so every process
            builds the same pool) and the pooled NWP conditioning is
            computed on device once here (attach_pool_nwp)."""

            def build():
                from deepphysinet_tpu.train.device_sampling import (
                    _pool_seed_of, attach_pool_nwp, cube_batch_host,
                    expected_cube_dims)

                cube = cube_batch_host(
                    data["field_data"], data["forecast_h"],
                    data["nwp_cube"], data["label_cube"],
                    pool_pad=scfg.n_margin if use_pool else None,
                    pool_seeds=[_pool_seed_of(f) for f in data["input_file"]]
                    if use_pool else None,
                    keep_label_cube=not use_pool,
                    expect_dims=expected_cube_dims(scfg, cfg.coord_spec))
                if data_sharding is not None:
                    from deepphysinet_tpu.parallel.mesh import put_sharded

                    cube = jax.tree.map(
                        lambda x: put_sharded(x, data_sharding), cube)
                else:
                    cube = jax.tree.map(jnp.asarray, cube)
                if use_pool:
                    cube = attach_pool_nwp(cube, scfg, cfg.coord_spec)
                return cube

            return cube_cache.get(tuple(data["input_file"]), build)

        meta_kwargs = dict(
            dx=self.dx, dy=self.dy, dt=self.dt, pred_t_span=pred_t_span,
            label_time_step=time_step,
            input_variable_cfg=self.variable_cfg,
            input_time_step=train_dataset.input_time_step,
            input_time_step_nums=train_dataset.input_time_step_nums,
            obs_norm_cfg=self.obs_norm_cfg,
        )
        stop = False
        preemption_saved = False
        log_skips = 0  # log events dropped under fetch backpressure
        # DPN_LOOP_PROF=1: attribute per-step host-loop wall time by phase
        # (loader next / cube cache / subkey / step dispatch / loop tail);
        # prints one summary line at loop exit.  Phase timing is two
        # perf_counter reads per phase -- negligible against ms-scale steps.
        prof = ({"loader": 0.0, "cube": 0.0, "key": 0.0, "dispatch": 0.0,
                 "tail": 0.0, "steps": 0}
                if os.environ.get("DPN_LOOP_PROF") else None)
        _pc = time.perf_counter

        def _timed_iter(iterable, slot):
            it = iter(iterable)
            while True:
                t0 = _pc()
                try:
                    item = next(it)
                except StopIteration:
                    return
                prof[slot] += _pc() - t0
                yield item

        try:
            for epoch in range(current_epoch, num_epoch):
                if stop:
                    break
                for batch_id, data in enumerate(
                        _timed_iter(loader, "loader") if prof else loader):
                    with_pde = bool(self.train_cfg.get("with_pde", True)) and \
                        global_step >= self.pde_start_step
                    global_step += 1
                    if prof is None:
                        cube = to_device_cube(data)
                        state, metrics = step(state, cube, next_subkey(),
                                              with_pde)
                    else:
                        t0 = _pc()
                        cube = to_device_cube(data)
                        t1 = _pc()
                        sub = next_subkey()
                        t2 = _pc()
                        state, metrics = step(state, cube, sub, with_pde)
                        t3 = _pc()
                        prof["cube"] += t1 - t0
                        prof["key"] += t2 - t1
                        prof["dispatch"] += t3 - t2
                        prof["steps"] += 1
                        prof["_end"] = t3  # excludes the final epoch save
                        if prof["steps"] == 200 and "_start" not in prof:
                            # one-time warmup cut: drop compiles + first stalls
                            for k in ("loader", "cube", "key", "dispatch"):
                                prof[k] = 0.0
                            prof["steps"] = 0
                            prof["_start"] = _pc()
                    steps_since_log += 1
                    is_final_step = bool(max_steps) and global_step >= max_steps
                    do_log = global_step % log_step == 1 or is_final_step
                    # Monitoring must never throttle training: when the async
                    # log queue is full (each job is a ~0.5-1 s tunnel fetch on
                    # slow days; the queue saturating means fetches outpace the
                    # log interval), SKIP this log event instead of blocking
                    # the dispatch loop on the submit (measured: blocking
                    # throttled the whole loop to the fetch rate, 11.2 vs 4.0
                    # ms/step -- docs/PERF.md round 5 (e)).  Single-process
                    # only: with nproc>1 the validation dispatch below is a
                    # collective every rank must enter in lockstep, and the
                    # queue state is rank-local.  The final event is always
                    # delivered.  On fast tunnels the queue never fills and
                    # nothing is ever skipped.
                    if (do_log and not is_final_step and nproc == 1
                            and async_log.full()):
                        do_log = False
                        log_skips += 1
                    if do_log:
                        fps = time_metric.get_fps(steps_since_log)
                        time_metric.reset()
                        steps_since_log = 0
                        # dispatch validation here (params are donated next
                        # step); fetch + writes happen on the logger thread.
                        # Single-process: local unsharded eval with
                        # skip-on-error tolerance.  Multi-process: a
                        # collective sharded eval EVERY rank must enter
                        # (the log condition is lockstep); rank 0 logs.
                        vm_arrays = None
                        if (self.device_valid and len(valid_dataset) > 0
                                and nproc == 1):
                            vm_arrays = self._device_mode_validation(
                                valid_dataset, cfg, scfg, state, with_pde,
                                fetch=False)
                        elif (self.device_valid and nproc > 1
                              and mesh is not None
                              and len(valid_dataset) >= mesh.shape["data"]):
                            vm_arrays = self._device_mode_validation_dist(
                                valid_dataset, cfg, scfg, state, with_pde,
                                mesh, nproc, rank)
                    if do_log and is_main:

                        elapsed = loop_metric.get_time()
                        n_skipped, log_skips = log_skips, 0

                        def log_job(metrics=metrics, vm_arrays=vm_arrays,
                                    epoch=epoch, global_step=global_step,
                                    fps=fps, elapsed=elapsed,
                                    n_skipped=n_skipped):
                            # ONE merged pack+fetch for train AND valid
                            # scalars: each _fetch_metrics call is a full
                            # tunnel round trip (~0.5-1 s on slow days), and
                            # two of them per log event outlast the log
                            # interval -> AsyncWorker backpressure throttles
                            # the dispatch loop (docs/PERF.md round 5 (e)).
                            # The job stays fetch-tolerant: a one-off tunnel
                            # error must not latch and kill a long run.
                            fetch = dict(metrics)
                            if vm_arrays is not None:
                                fetch.update({"valid:" + k: v
                                              for k, v in vm_arrays.items()})
                            try:
                                got = self._fetch_metrics(fetch)
                            except Exception as e:
                                print(f"warning: metric fetch failed "
                                      f"({e}); skipping this log step")
                                return
                            m = {k: v for k, v in got.items()
                                 if not k.startswith("valid:")}
                            vm = {k[6:]: v for k, v in got.items()
                                  if k.startswith("valid:")} or None
                            line = (f"[device-sampled] epoch:{epoch}/{num_epoch},"
                                    f"iter:{global_step},"
                                    f"train loss:{m['total_loss']:.6f},"
                                    f"margin:{m['margin_loss']:.6f},"
                                    f"grad:{m['grad_norm']:.3e},fps:{fps:.3f},"
                                    f"t:{elapsed:.1f}s")
                            if n_skipped:
                                line += (f" [{n_skipped} log events skipped:"
                                         f" fetch backpressure]")
                            print(line)
                            log_fp.write(line + "\n")
                            log_fp.flush()
                            for k, v in m.items():
                                summary.add_scalar(f"training/{k}", v, global_step)
                            if vm is not None:
                                vline = f"valid loss:{vm['total_loss']:.6f}"
                                print(vline)
                                log_fp.write(vline + "\n")
                                for k, v in vm.items():
                                    summary.add_scalar(f"validation/{k}", v, global_step)

                        async_log.submit(log_job)
                    if self._agreed_preemption(preempted, nproc, global_step,
                                               preempt_check):
                        async_log.wait()  # pending log fetches land first
                        if is_main:
                            self._preemption_save(async_ckpt, checkpoint_path, epoch,
                                                  global_step, state, **meta_kwargs)
                        preemption_saved = True
                        stop = True
                        break
                    if max_steps and global_step >= max_steps:
                        stop = True
                        break
                is_last = stop or epoch == num_epoch - 1
                # per-epoch LR step (reference scheduler cadence), decoupled
                # from the save cadence -- save_step>1 must not freeze the LR
                lr = schedule(epoch + 1)
                set_learning_rate(state.opt_state, lr)
                if (epoch % save_step == 0 or is_last) and not preemption_saved:
                    if is_main:
                        self._epoch_save(async_ckpt, is_last, checkpoint_path,
                                         epoch, global_step, state, meta_kwargs)
            if prof is not None and prof["steps"] > 0 and "_start" in prof:
                n = prof["steps"]
                total = (prof["_end"] - prof["_start"]) / n * 1e3
                parts = {k: prof[k] / n * 1e3
                         for k in ("loader", "cube", "key", "dispatch")}
                other = total - sum(parts.values())
                print("[loop-prof] steps:%d total:%.3f ms/step  "
                      "loader:%.3f cube:%.3f key:%.3f dispatch:%.3f "
                      "other:%.3f" % (n, total, parts["loader"], parts["cube"],
                                      parts["key"], parts["dispatch"], other))
            if async_ckpt is not None:
                async_ckpt.close()  # drain in-flight saves
            async_log.close()  # drain pending fetches before closing the sinks
            log_fp.close()
            summary.close()
        finally:
            # never leak a mid-write checkpoint or unsent logs past an exception
            if async_ckpt is not None:
                async_ckpt.close_quietly()
            async_log.close_quietly()
            log_fp.close()
            summary.close()
        return state

    def _restore_state(self, state: TrainState, state_dict: dict, tx) -> TrainState:
        """Rebuild TrainState from a checkpoint dict.

        An optimizer-state structure mismatch is a real resume failure (wrong
        checkpoint / changed optimizer config) and raises; set
        ``train_cfg.tpu.allow_partial_resume = True`` to instead reinitialize
        the Adam moments and continue from the parameters alone.
        """
        # host (numpy) leaves: UNCOMMITTED, so the next step's jit is free to
        # place them under any topology -- a checkpoint written under an
        # 8-chip mesh resumes single-chip and vice versa (orbax restores
        # committed device arrays, which would conflict with sharded batches)
        params = jax.tree.map(np.asarray, state_dict["model"])
        opt_state = state.opt_state
        if state_dict.get("opt_state") is not None:
            try:
                opt_state = jax.tree.unflatten(
                    jax.tree.structure(state.opt_state),
                    [np.asarray(x) for x in jax.tree.leaves(state_dict["opt_state"])],
                )
            except Exception as e:
                allow = bool(dict(self.train_cfg.get("tpu", {})).get(
                    "allow_partial_resume", False))
                if not allow:
                    raise RuntimeError(
                        "checkpoint optimizer state does not match the current "
                        "optimizer structure; pass train_cfg.tpu."
                        "allow_partial_resume=True to resume from parameters "
                        "only (reinitialized Adam moments)"
                    ) from e
                print(f"warning: optimizer state not restored ({e}); "
                      "reinitializing (allow_partial_resume)")
                opt_state = tx.init(params)
        return TrainState(step=state.step, params=params, opt_state=opt_state)

    def _render_grid(self, params, dataset, data, cfg, out_dir, global_step, with_pde):
        """Full-grid render of all six variables (interface_physics.py:532-606)."""
        from deepphysinet_tpu.inference.runner import predict_grid
        from deepphysinet_tpu.utils.vis import VisUtils

        time_id = (
            int(np.random.randint(0, dataset.input_time_step * dataset.input_time_step_nums + 1))
            if with_pde else 0
        )
        input_file = data["input_file"][0]
        fh = float(np.asarray(data["forecast_h"]).reshape(-1)[0])
        grids = predict_grid(
            self.physics_net, params, cfg, dataset, input_file,
            jnp.asarray(data["field_data"][0:1], jnp.float32), fh, time_id,
            with_clip=False,
        )
        vis = VisUtils(coord_file=None, landsea_file=os.path.join(
            dataset.constant_path, "landsea.tiff"))
        for name, img in grids.items():
            out = os.path.join(out_dir, f"{global_step}_result_{name}_f{int(fh):03d}.jpg")
            vis.forward(img, out, title=f"{name} f{int(fh):03d} t+{time_id}h")

    # ---- evaluation ----

    def run_test_interface(self, checkpoint_path: Optional[str] = None,
                           max_windows: Optional[int] = None,
                           full_grid: bool = True, **kwargs):
        """Held-out RMSE evaluation of a checkpoint over test/valid data.

        The reference carries a test_cfg but implements no test runner; this
        completes the surface using the ERA5 RMSE harness (eval/rmse.py).
        Data comes from ``test_cfg.test_data`` when it carries a dataset
        config, else ``train_cfg.valid_data``.  ``full_grid=True`` (default)
        sweeps every labeled grid point at every labeled hour; False runs the
        fast subsampled estimate.
        """
        from deepphysinet_tpu.data.dataset import PhysicsDataset
        from deepphysinet_tpu.eval.rmse import evaluate_rmse, evaluate_rmse_fullgrid

        tc = self.train_cfg
        self.dx = float(tc["dx"])
        self.dy = float(tc["dy"])
        ckpt_path = checkpoint_path or self.test_cfg.get("checkpoints", {}).get(
            "checkpoints_path") or tc["checkpoints"]["checkpoints_path"]
        state_dict, epoch, step = ckpt.load_checkpoint(
            ckpt_path, prefix="physics", backend=self.ckpt_backend)
        if state_dict is None:
            raise FileNotFoundError(ckpt_path)
        params = jax.tree.map(jnp.asarray, state_dict["model"])

        data_cfg = self.test_cfg.get("test_data")
        if not (isinstance(data_cfg, dict) and "input_path" in data_cfg
                and data_cfg["input_path"]):
            data_cfg = tc["valid_data"]
        dataset = PhysicsDataset(
            **data_cfg, input_variable_cfg=self.variable_cfg,
            out_variable_cfg=self.obs_norm_cfg, dx=self.dx, dy=self.dy,
        )
        window_h = dataset.input_time_step * dataset.input_time_step_nums
        cfg = self._step_cfg(float(window_h * 3600), dataset.forecast_time_period)
        if full_grid:
            metrics = evaluate_rmse_fullgrid(self.physics_net, params, cfg,
                                             dataset, max_windows=max_windows)
        else:
            metrics = evaluate_rmse(self.physics_net, params, cfg, dataset,
                                    max_windows=max_windows, **kwargs)
        metrics["epoch"] = float(epoch - 1)
        metrics["global_step"] = float(step)
        result_file = self.test_cfg.get("log", {}).get("result_file")
        if result_file:
            import json

            os.makedirs(os.path.dirname(os.path.abspath(result_file)), exist_ok=True)
            with open(result_file, "w") as fp:
                json.dump(metrics, fp, indent=2)
        return metrics

    # ---- inference ----

    def run_inference_interface(self, **kwargs):
        from deepphysinet_tpu.inference.runner import run_inference

        return run_inference(self, **kwargs)

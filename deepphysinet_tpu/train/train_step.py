"""The jitted training step: encode + decode + data loss + PDE residuals + update.

The reference's hot loop (interface_physics.py:433-515) is eager torch: H2D
transfers, one forward for the data loss, two ``place_one_batch`` calls each
issuing 19 reverse-mode autograd graphs, a global backward, grad-clip, Adam.
Here the whole step is ONE jitted, donated XLA program:

  loss(params) = margin_factor * SmoothL1(decode(margin pts), era5)
               + [with_pde] Sum_eq factor_eq * MSE(residual_eq(inter pts))
               + [with_pde] Sum_eq factor_eq * MSE(residual_eq(margin pts))

with forward-mode derivatives from physics/engine.py, reverse-mode over the
whole objective for the parameter gradient (reverse-over-forward), global-norm
clip at 2.5e7 (interface_physics.py:514), and the optimizer update fused in.

The PDE curriculum (data-only before step 2000, interface_physics.py:436-441)
switches via a static ``with_pde`` flag -> two compiled variants, zero runtime
branching cost.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.ops.coords import CoordSpec, encode_coord
from deepphysinet_tpu.ops.normalization import NormSpec
from deepphysinet_tpu.physics.constants import DEFAULT_CONSTANTS, PhysicalConstants
from deepphysinet_tpu.physics.engine import pde_residual_losses
from deepphysinet_tpu.train.point_fn import inverse_norm_stack, make_phys_fn
from deepphysinet_tpu.train.losses import build_loss


class PointBatch(NamedTuple):
    """One window's sampled points (margin = labeled ERA5, inter = collocation)."""

    x: jnp.ndarray  # [N] physical meters
    y: jnp.ndarray  # [N]
    t: jnp.ndarray  # [N] physical seconds
    f: jnp.ndarray  # [N, 1] Coriolis parameter
    nwp: jnp.ndarray  # [N, 6] normalized interpolated NWP values (conditioning)
    labels: Optional[jnp.ndarray] = None  # [N, 6] normalized ERA5 labels (margin only)


class Batch(NamedTuple):
    field: jnp.ndarray  # [B, L, enc_in] normalized token matrix
    forecast_h: jnp.ndarray  # [B] unnormalized lead hours
    margin: PointBatch  # leading axis [B, ...]
    inter: PointBatch  # leading axis [B, ...]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static configuration closed over by the compiled step."""

    coord_spec: CoordSpec
    obs_specs: Tuple[NormSpec, ...]  # OBS_NAME_ORDER
    loss_factor: Any  # dict of factors (configs/...:139-148); hashable via tuple items
    forecast_time_period: float = 360.0
    # dist-path lead-time snapping (reference interface_physics.py:996-997:
    # forecast_h // window_h * window_h before normalization); 0 = off, which
    # is the reference's single-GPU behavior
    forecast_h_snap: float = 0.0
    prediction_loss: str = "WeightSmoothL1Loss"
    prediction_beta: float = 0.1
    pde_loss: str = "MSELoss"
    grad_clip_norm: float = 2.5e7
    pde_start_step: int = 2000
    constants: PhysicalConstants = DEFAULT_CONSTANTS
    # 'jvp' (default) = analytic-tangent collapsed-algebra XLA path
    #   (decode_jvp_xla_v4, fully differentiable, shares the margin primal
    #   with the data loss; 8.93 ms vs linearize's 9.24 ms, docs/PERF.md);
    # 'linearize' = jax.linearize over the model decode (round-1 default,
    #   required for non-mean_norm observation normalization);
    # 'kernel' = fused Pallas v4 forward + fused Pallas backward (the TPU
    #   trainer default: 4.96 ms/step with the shared margin primal)
    pde_engine: str = "jvp"
    # run the Pallas kernels of the 'kernel' engine in interpret mode (pure
    # XLA emulation) -- lets the multi-chip dryrun and CPU tests exercise the
    # REAL kernel code path (grid, BlockSpecs, accumulation) without a TPU
    kernel_interpret: bool = False
    # decode-kernel generation for the 'kernel'/'jvp' engines: 4 (default)
    # keeps the explicit pe/dpe prep; 6 feeds the layer-1 matmuls from trig
    # blocks with the PE derivative folded into the per-window weight prep
    # (no dpe array; docs/PERF.md round 3 (l)); 7 ("v4s") is the dpe-free
    # var-major kernel pair: v6's folded weights on v4's single wide-K
    # primal pass over a channel-major trig operand (docs/PERF.md round 5).
    # Identical math in every case; set via train_cfg.tpu.kernel_version.
    # Default 7 since round 5: eval 20.9 -> 23.3M evals/s, step 3.58 -> 3.41
    # ms in-scan (docs/PERF.md round 5 (b)), parity pinned by
    # tests/test_decode_kernel_v4s.py.
    kernel_version: int = 7
    # vectorized [6, N]-layout residual assembly for the jvp/kernel engines
    # with the default MSE pde criterion -- identical values, but its XLA
    # reverse-AD is ~25x cheaper than the [N, 1]-column dict form's
    # (docs/PERF.md round 4 (c)/(d)).  Falls back to the dict form
    # automatically for custom pde losses or the linearize engine; set via
    # train_cfg.tpu.packed_assembly.
    packed_assembly: bool = True
    # var-major kernel IO for the packed kernel-engine path: the v4t Pallas
    # pair emits/consumes [6, N] layouts natively so no lane-padded [N, 6]
    # buffer crosses the custom-vjp boundary (docs/PERF.md round 4 (g)).
    # Identical values (bitwise kernel parity, tests/test_decode_kernel_v4t);
    # only effective when the packed kernel v4 path is active.
    var_major: bool = True

    def factors(self) -> Dict[str, float]:
        return dict(self.loss_factor)


def _snap_forecast_h(forecast_h: jnp.ndarray, cfg: "StepConfig") -> jnp.ndarray:
    """Snap lead hours down to the window grid when cfg.forecast_h_snap > 0."""
    if cfg.forecast_h_snap > 0:
        return jnp.floor(forecast_h / cfg.forecast_h_snap) * cfg.forecast_h_snap
    return forecast_h


def _window_losses(
    model: PhysicsNet,
    params,
    tokens: jnp.ndarray,  # [T, D]
    fore_h: jnp.ndarray,  # [1]
    margin: PointBatch,
    inter: PointBatch,
    cfg: StepConfig,
    with_pde: bool,
    pred_loss_fn,
) -> Dict[str, jnp.ndarray]:
    """Losses for one window; vmapped over the window batch by the step.

    When the PDE curriculum is active, the margin points' primal decode is
    SHARED between the data loss and the margin PDE evaluation via one
    jax.linearize of a combined (normalized, physical) head -- the reference
    evaluates those 20480 points twice (interface_physics.py:467 then :493).
    """
    from deepphysinet_tpu.physics.engine import (
        FieldDerivatives, FIELD_KEYS, fused_kernel_fields, fused_kernel_fields_t,
        jvp_fields, packed_residual_losses_from_primal_tangents,
        packed_residual_losses_from_primal_tangents_t, residual_losses_from_fields)
    from deepphysinet_tpu.train.point_fn import inverse_norm_stack

    factors = cfg.factors()
    pde_criterion = None if cfg.pde_loss == "MSELoss" else build_loss(cfg.pde_loss)
    out: Dict[str, jnp.ndarray] = {}

    if cfg.pde_engine not in ("jvp", "linearize", "kernel"):
        raise ValueError(
            f"unknown pde_engine {cfg.pde_engine!r}; expected 'jvp', "
            "'linearize' or 'kernel' (train_cfg.tpu.pde_engine)")

    packed = cfg.packed_assembly and pde_criterion is None
    # var-major: the kernel engine's packed path runs entirely in [6, N]
    # layout -- the v4t Pallas kernels emit/consume it natively and no
    # lane-padded minor-dim-6 buffer appears on the grad path (docs/PERF.md
    # round 4 (e)/(f)); values identical, pinned by tests
    var_major = (cfg.var_major and packed and cfg.pde_engine == "kernel"
                 and cfg.kernel_version in (4, 7))

    def engine_fields(pts: PointBatch):
        """(primal_norm, FieldDerivatives | raw tang) via cfg.pde_engine."""
        coords = jnp.stack([pts.x, pts.y, pts.t], axis=-1)
        if var_major:
            return fused_kernel_fields_t(
                model, params, tokens, coords, pts.nwp, fore_h,
                cfg.coord_spec, interpret=cfg.kernel_interpret,
                version=cfg.kernel_version)
        if cfg.pde_engine == "kernel":
            return fused_kernel_fields(
                model, params, tokens, coords, pts.nwp, fore_h,
                cfg.coord_spec, cfg.obs_specs, with_clip=True, trainable=True,
                interpret=cfg.kernel_interpret, version=cfg.kernel_version,
                raw_tangents=packed,
            )
        return jvp_fields(model, params, tokens, coords, pts.nwp, fore_h,
                          cfg.coord_spec, cfg.obs_specs, with_clip=True,
                          version=cfg.kernel_version, raw_tangents=packed)

    def engine_losses(pred, fd_or_tang, coriolis_f):
        """Residual losses from engine_fields' second output."""
        if var_major:
            return packed_residual_losses_from_primal_tangents_t(
                pred, fd_or_tang, coriolis_f, cfg.obs_specs, factors,
                with_clip=True, constants=cfg.constants)
        if packed:
            return packed_residual_losses_from_primal_tangents(
                pred, fd_or_tang, coriolis_f, cfg.obs_specs, factors,
                with_clip=True, constants=cfg.constants)
        return residual_losses_from_fields(fd_or_tang, coriolis_f, factors,
                                           cfg.constants, pde_criterion)

    if with_pde and cfg.pde_engine == "linearize":
        # --- shared margin evaluation: data loss + PDE in one linearize ---
        margin_nwp = jax.lax.stop_gradient(margin.nwp)

        def combo_fn(coords):
            pe = encode_coord(coords[:, 0], coords[:, 1], coords[:, 2], cfg.coord_spec)
            out_norm = model.apply(params, tokens, pe, margin_nwp, fore_h,
                                   method=PhysicsNet.decode)
            phys = inverse_norm_stack(out_norm, cfg.obs_specs, with_clip=True)
            return jnp.concatenate([out_norm, phys], axis=-1)  # [N, 12]

        coords = jnp.stack([margin.x, margin.y, margin.t], axis=-1)
        primal, lin = jax.linearize(combo_fn, coords)
        pred = primal[:, :6]
        n = coords.shape[0]
        tangents = [
            lin(jnp.zeros((n, 3), coords.dtype).at[:, k].set(1.0)) for k in range(3)
        ]
        fields = {k: primal[:, 6 + i : 7 + i] for i, k in enumerate(FIELD_KEYS)}
        derivs = {
            k: {ax: tangents[j][:, 6 + i : 7 + i] for j, ax in enumerate(("x", "y", "t"))}
            for i, k in enumerate(FIELD_KEYS)
        }
        m_losses = residual_losses_from_fields(
            FieldDerivatives(fields=fields, derivs=derivs), margin.f, factors,
            cfg.constants, pde_criterion)
        for k, v in m_losses.items():
            out[f"margin_{k}"] = v
    elif with_pde:
        # --- shared margin evaluation via the jvp/kernel engine: the engine's
        # normalized primal doubles as the data-loss prediction (no second
        # decode of the 20480 margin points) ---
        pred, fd = engine_fields(margin)
        m_losses = engine_losses(pred, fd, margin.f)
        for k, v in m_losses.items():
            out[f"margin_{k}"] = v
    else:
        # --- data loss only (interface_physics.py:464-474) ---
        # NOT collapsed_decode: its fwd is cheaper but its VJP measured
        # slower here (3.14 vs 2.92 ms data-only step on v5e) -- the
        # collapsed path is a forward-only win (inference/eval)
        pe = encode_coord(margin.x, margin.y, margin.t, cfg.coord_spec)
        pred = model.apply(params, tokens, pe, margin.nwp, fore_h,
                           method=PhysicsNet.decode)

    if with_pde and var_major:
        # pred is var-major [6, N]; the loss is elementwise + mean, so feeding
        # the transposed LABELS (data, no cotangent) keeps the whole grad path
        # in [6, N] layout -- only the aux metrics copy below transposes back,
        # and has_aux means that transpose is never differentiated
        margin_loss = (pred_loss_fn(pred, margin.labels.T)
                       * factors["margin_factor"])
        out["margin_loss"] = margin_loss
        out["_pred_norm"] = pred.T
    else:
        margin_loss = pred_loss_fn(pred, margin.labels) * factors["margin_factor"]
        out["margin_loss"] = margin_loss
        out["_pred_norm"] = pred

    if with_pde:
        # --- interior collocation points (:476-498) ---
        coords = jnp.stack([inter.x, inter.y, inter.t], axis=-1)
        if cfg.pde_engine == "linearize":
            phys_fn = make_phys_fn(
                model, params, tokens, inter.nwp, fore_h, cfg.coord_spec,
                cfg.obs_specs, with_clip=True,
            )
            losses = pde_residual_losses(
                phys_fn, coords, inter.f, factors, cfg.constants, pde_criterion
            )
        else:
            ipred, fd = engine_fields(inter)
            losses = engine_losses(ipred, fd, inter.f)
        for k, v in losses.items():
            out[f"inter_{k}"] = v
    return out


def make_loss_fn(model: PhysicsNet, cfg: StepConfig):
    """``loss_fn(params, batch, with_pde) -> (total, (metrics, pred_norm))``.

    All metric scalars are plain means over the windows/points present in
    ``batch``; with equal-size shards, a cross-shard ``lax.pmean`` of these
    therefore reproduces the global means exactly (relied on by the
    shard_mapped step in parallel/sharding.py).
    """
    pred_loss_fn = build_loss(cfg.prediction_loss, beta=cfg.prediction_beta)

    def loss_fn(params, batch: Batch, with_pde: bool):
        fh_norm = (_snap_forecast_h(batch.forecast_h, cfg)
                   / cfg.forecast_time_period)[:, None]  # [B, 1]
        tokens = model.apply(params, batch.field, fh_norm, method=PhysicsNet.encode)

        def one_window(tokens_b, fh_b, margin_b, inter_b):
            return _window_losses(
                model, params, tokens_b, fh_b, margin_b, inter_b, cfg, with_pde, pred_loss_fn
            )

        per_window = jax.vmap(one_window)(tokens, fh_norm, batch.margin, batch.inter)
        pred_norm = per_window.pop("_pred_norm")  # [B, N, 6]
        metrics = {k: jnp.mean(v) for k, v in per_window.items()}
        total = metrics["margin_loss"]
        if with_pde:
            total = total + metrics["inter_total"] + metrics["margin_total"]
        metrics["total_loss"] = total
        return total, (metrics, pred_norm)

    return loss_fn


def apply_gradient_update(
    tx: optax.GradientTransformation,
    cfg: StepConfig,
    state: TrainState,
    grads,
    metrics: Dict[str, jnp.ndarray],
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Grad-clip + optimizer update + non-finite guard (shared by the single-
    device, device-sampling, and shard_mapped steps).

    Clip at 2.5e7 (interface_physics.py:514); zero the update entirely on a
    non-finite gradient so one bad batch cannot poison the parameters
    (robustness the reference lacks -- loss factors span 1e-7..1e14).  Inside
    a shard_map, ``grads`` must already be pmean'd so every shard applies the
    identical update.
    """
    gnorm = optax.global_norm(grads)
    metrics["grad_norm"] = gnorm
    finite = jnp.isfinite(gnorm)
    scale = jnp.where(
        finite, jnp.minimum(1.0, cfg.grad_clip_norm / (gnorm + 1e-6)), 0.0
    )
    metrics["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
    grads = jax.tree.map(lambda g: g * scale, grads)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    # non-finite batch -> keep the previous params and optimizer state
    params = jax.tree.map(lambda new, old: jnp.where(finite, new, old),
                          params, state.params)
    opt_state = jax.tree.map(lambda new, old: jnp.where(finite, new, old),
                             opt_state, state.opt_state)
    new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
    return new_state, metrics


def make_train_step_impl(model: PhysicsNet, tx: optax.GradientTransformation, cfg: StepConfig):
    """The raw (unjitted) single-controller step body; jitted by
    make_train_step.  (The multi-chip path does NOT re-jit this with sharded
    inputs -- parallel.make_sharded_train_step builds an explicit shard_map
    from the same make_loss_fn/apply_gradient_update pieces.)"""
    loss_fn = make_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch, with_pde: bool):
        (_, (metrics, pred_norm)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, with_pde
        )
        new_state, metrics = apply_gradient_update(tx, cfg, state, grads, metrics)
        # physical-unit per-variable MSE against labels (interface_physics.py:517-530)
        metrics.update(_variable_metrics(pred_norm, batch.margin.labels, cfg))
        return new_state, metrics

    return train_step


def make_train_step(model: PhysicsNet, tx: optax.GradientTransformation, cfg: StepConfig):
    """Returns ``train_step(state, batch, with_pde) -> (state, metrics)`` (jitted)."""
    impl = make_train_step_impl(model, tx, cfg)
    return jax.jit(impl, static_argnames=("with_pde",), donate_argnums=(0,))


def make_eval_step(model: PhysicsNet, cfg: StepConfig):
    """Validation losses without the update (interface_physics.py:639-751)."""
    pred_loss_fn = build_loss(cfg.prediction_loss, beta=cfg.prediction_beta)

    @functools.partial(jax.jit, static_argnames=("with_pde",))
    def eval_step(params, batch: Batch, with_pde: bool):
        fh_norm = (_snap_forecast_h(batch.forecast_h, cfg)
                   / cfg.forecast_time_period)[:, None]
        tokens = model.apply(params, batch.field, fh_norm, method=PhysicsNet.encode)

        def one_window(tokens_b, fh_b, margin_b, inter_b):
            return _window_losses(
                model, params, tokens_b, fh_b, margin_b, inter_b, cfg, with_pde, pred_loss_fn
            )

        per_window = jax.vmap(one_window)(tokens, fh_norm, batch.margin, batch.inter)
        pred_norm = per_window.pop("_pred_norm")
        metrics = {k: jnp.mean(v) for k, v in per_window.items()}
        total = metrics["margin_loss"]
        if with_pde:
            total = total + metrics["inter_total"] + metrics["margin_total"]
        metrics["total_loss"] = total
        metrics.update(_variable_metrics(pred_norm, batch.margin.labels, cfg))
        return metrics

    return eval_step


def _variable_metrics(pred_norm: jnp.ndarray, labels: jnp.ndarray, cfg: StepConfig):
    """Per-variable MSE in physical units (interface_physics.py:520-530)."""
    b, n, _ = pred_norm.shape
    pred_phys = inverse_norm_stack(pred_norm.reshape(b * n, 6), cfg.obs_specs, with_clip=True)
    label_phys = inverse_norm_stack(labels.reshape(b * n, 6), cfg.obs_specs, with_clip=True)
    names = ("u", "v", "p", "T", "q", "rio")
    d = (pred_phys - label_phys).astype(jnp.float32)
    mse = jnp.mean(d * d, axis=0)
    return {f"margin_{k}_loss": mse[i] for i, k in enumerate(names)}


def create_train_state(model: PhysicsNet, tx, rng, sample_batch: Batch) -> TrainState:
    fh_norm = (sample_batch.forecast_h / 360.0)[:, None]
    n = sample_batch.margin.x.shape[-1]
    # coordinate-PE width == the decode's in_channels (2 fns x 3 coords x F)
    pe_dim = model.net_cfg["in_channels"]
    params = model.init(
        rng,
        sample_batch.field,
        jnp.zeros((n, pe_dim)),
        sample_batch.margin.nwp[0],
        fh_norm,
    )
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state)

"""On-device point sampling: the TPU-native data hot path.

The reference samples label/collocation points and runs xarray trilinear
interpolation inside dataloader worker processes (dataset/physics_dataset.py:
323-499) -- the CPU bottleneck of its hot loop.  Here the host ships, per
window, just the raw cubes:

  field       [159, 2405]   token matrix (unchanged)
  nwp_cube    [6, H, W, T]  normalized coarse NWP window (~0.3 MB)
  label_cube  [6, Hl, Wl, Tl] normalized ERA5 window (~22 MB fp32)

and the jitted train step samples FRESH points every optimizer step with
jax.random, gathers labels, interpolates conditioning values (ops/interp.py),
and computes Coriolis -- all fused into the step's XLA program.  Points are
resampled every step from the same window (the reference can only resample
when the dataloader revisits the item), which is strictly more sample-diverse
at zero host cost.

Sampling distributions match the reference exactly:
  margin: integer grid x ~ U{0..W-1}, y ~ U{0..H-1}, t ~ U{0..window_h} hours
          (physics_dataset.py:334-338)
  inter:  continuous x ~ U[0, W-1], y ~ U[0, H-1], integer t
          (physics_dataset.py:442-446)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from deepphysinet_tpu.ops.coords import OMEGA
from deepphysinet_tpu.ops.interp import trilinear_interp_cube
from deepphysinet_tpu.train.train_step import (
    PointBatch,
    StepConfig,
    TrainState,
    _variable_metrics,
    _window_losses,
)
from deepphysinet_tpu.train.losses import build_loss


class CubeBatch(NamedTuple):
    field: jnp.ndarray  # [B, L, enc_in]
    forecast_h: jnp.ndarray  # [B]
    nwp_cube: jnp.ndarray  # [B, 6, H, W, T] normalized NWP window
    label_cube: jnp.ndarray  # [B, 6, Hl, Wl, Tl] normalized ERA5 window


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    n_margin: int  # label_batch_size
    n_inter: int  # inter_batch_size
    window_h: int = 24  # input_time_step * input_time_step_nums
    input_time_step: int = 6
    label_time_step: int = 1  # hours between label-cube slices
    begin_lat: float = 18.0
    begin_lon: float = 72.0
    fine_step: float = 0.25
    coarse_step: float = 1.0


def _coriolis_from_lat(lat_deg: jnp.ndarray) -> jnp.ndarray:
    return (2.0 * OMEGA * jnp.sin(lat_deg / 180.0 * jnp.pi))[:, None]


def sample_window_points(
    key: jax.Array,
    nwp_cube: jnp.ndarray,  # [6, H, W, T]
    label_cube: jnp.ndarray,  # [6, Hl, Wl, Tl]
    scfg: SamplerConfig,
    coord_spec,
) -> Tuple[PointBatch, PointBatch]:
    """Sample one window's margin + inter PointBatches on-device."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    Hl, Wl = label_cube.shape[1], label_cube.shape[2]
    nm, ni = scfg.n_margin, scfg.n_inter

    # ---- margin: integer fine-grid points with exact label gather ----
    mx = jax.random.randint(k1, (nm,), 0, Wl)
    my = jax.random.randint(k2, (nm,), 0, Hl)
    # labels exist every label_time_step hours; sample those slots
    # (physics_dataset.py:338 samples integer hours; label_time_step=1 default)
    n_slots = scfg.window_h // scfg.label_time_step + 1
    slot = jax.random.randint(k3, (nm,), 0, n_slots)
    mt = slot * scfg.label_time_step
    flat = (my * Wl + mx) * label_cube.shape[3] + slot
    labels = jnp.take(label_cube.reshape(6, -1), flat, axis=-1).T  # [nm, 6]

    m_lon = scfg.begin_lon + mx * scfg.fine_step
    m_lat = scfg.begin_lat + my * scfg.fine_step
    m_nwp = trilinear_interp_cube(
        nwp_cube, m_lon.astype(jnp.float32), m_lat.astype(jnp.float32),
        mt.astype(jnp.float32),
        lon0=scfg.begin_lon, dlon=scfg.coarse_step,
        lat0=scfg.begin_lat, dlat=scfg.coarse_step,
        t0=0.0, dt=float(scfg.input_time_step),
    ).T  # [nm, 6]
    margin = PointBatch(
        x=(mx * coord_spec.dx).astype(jnp.float32),
        y=(my * coord_spec.dy).astype(jnp.float32),
        t=(mt * 3600.0).astype(jnp.float32),
        f=_coriolis_from_lat(m_lat.astype(jnp.float32)),
        nwp=m_nwp.astype(jnp.float32),
        labels=labels.astype(jnp.float32),
    )

    # ---- inter: continuous collocation points ----
    ix = jax.random.uniform(k4, (ni,)) * (Wl - 1)
    iy = jax.random.uniform(k5, (ni,)) * (Hl - 1)
    it = jax.random.randint(k6, (ni,), 0, scfg.window_h + 1)
    i_lon = scfg.begin_lon + ix * scfg.fine_step
    i_lat = scfg.begin_lat + iy * scfg.fine_step
    i_nwp = trilinear_interp_cube(
        nwp_cube, i_lon, i_lat, it.astype(jnp.float32),
        lon0=scfg.begin_lon, dlon=scfg.coarse_step,
        lat0=scfg.begin_lat, dlat=scfg.coarse_step,
        t0=0.0, dt=float(scfg.input_time_step),
    ).T
    inter = PointBatch(
        x=(ix * coord_spec.dx).astype(jnp.float32),
        y=(iy * coord_spec.dy).astype(jnp.float32),
        t=(it * 3600.0).astype(jnp.float32),
        f=_coriolis_from_lat(i_lat),
        nwp=i_nwp.astype(jnp.float32),
        labels=jnp.zeros((ni, 6), jnp.float32),
    )
    return margin, inter


def make_ds_loss_fn(model, cfg: StepConfig, scfg: SamplerConfig):
    """``loss_fn(params, cube_batch, keys [B,...], with_pde)`` with on-device
    sampling; ``keys`` are the per-window PRNG keys (caller splits them, so
    the shard_mapped step can hand each data shard its slice of the SAME
    global key sequence the single-controller step would draw)."""
    from deepphysinet_tpu.models.physics_net import PhysicsNet

    pred_loss_fn = build_loss(cfg.prediction_loss, beta=cfg.prediction_beta)

    def loss_fn(params, batch: CubeBatch, keys, with_pde: bool):
        fh_norm = (batch.forecast_h / cfg.forecast_time_period)[:, None]
        tokens = model.apply(params, batch.field, fh_norm, method=PhysicsNet.encode)

        def one_window(tokens_b, fh_b, nwp_cube_b, label_cube_b, key_b):
            margin, inter = sample_window_points(
                key_b, nwp_cube_b, label_cube_b, scfg, cfg.coord_spec
            )
            return _window_losses(
                model, params, tokens_b, fh_b, margin, inter, cfg, with_pde, pred_loss_fn
            ) | {"_labels": margin.labels}

        per_window = jax.vmap(one_window)(
            tokens, fh_norm, batch.nwp_cube, batch.label_cube, keys
        )
        pred_norm = per_window.pop("_pred_norm")
        labels = per_window.pop("_labels")
        metrics = {k: jnp.mean(v) for k, v in per_window.items()}
        total = metrics["margin_loss"]
        if with_pde:
            total = total + metrics["inter_total"] + metrics["margin_total"]
        metrics["total_loss"] = total
        return total, (metrics, pred_norm, labels)

    return loss_fn


def make_device_sampling_train_step(model, tx, cfg: StepConfig, scfg: SamplerConfig):
    """train_step(state, cube_batch, key, with_pde) with on-device sampling."""
    from deepphysinet_tpu.train.train_step import apply_gradient_update

    loss_fn = make_ds_loss_fn(model, cfg, scfg)

    @functools.partial(jax.jit, static_argnames=("with_pde",), donate_argnums=(0,))
    def train_step(state: TrainState, batch: CubeBatch, key, with_pde: bool):
        keys = jax.random.split(key, batch.field.shape[0])
        (_, (metrics, pred_norm, labels)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch, keys, with_pde)
        new_state, metrics = apply_gradient_update(tx, cfg, state, grads, metrics)
        metrics.update(_variable_metrics(pred_norm, labels, cfg))
        return new_state, metrics

    return train_step


def make_device_sampling_eval_step(model, cfg: StepConfig, scfg: SamplerConfig):
    """``eval_step(params, cube_batch, key, with_pde) -> metrics`` (no update).

    Validation for the device-sampling loop: points are drawn ON-DEVICE from
    the (cached) window cubes with a caller-FIXED key, so repeated
    validations score the same points -- deterministic valid curves at zero
    recurring host cost.  The previous design routed validation through the
    host-sampled ``__getitem__`` path (the reference's dataloader work,
    ~1 s per call), which the device loop paid every log_step and which
    capped e2e fps well below the step rate (docs/PERF.md round-3 (h))."""
    loss_fn = make_ds_loss_fn(model, cfg, scfg)

    @functools.partial(jax.jit, static_argnames=("with_pde",))
    def eval_step(params, batch: CubeBatch, key, with_pde: bool):
        keys = jax.random.split(key, batch.field.shape[0])
        _, (metrics, pred_norm, labels) = loss_fn(params, batch, keys, with_pde)
        metrics.update(_variable_metrics(pred_norm, labels, cfg))
        return metrics

    return eval_step

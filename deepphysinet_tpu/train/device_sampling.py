"""On-device point sampling: the TPU-native data hot path.

The reference samples label/collocation points and runs xarray trilinear
interpolation inside dataloader worker processes (dataset/physics_dataset.py:
323-499) -- the CPU bottleneck of its hot loop.  Here the host ships, per
window, just the raw cubes:

  field       [159, 2405]   token matrix (unchanged)
  nwp_cube    [H, W, T, 6]  normalized coarse NWP window (~0.3 MB)
  label_cube  [Hl, Wl, Tl, 6] normalized ERA5 window (~22 MB fp32)

(channel-LAST on device -- see CubeBatch -- so point lookups are
contiguous row gathers; the host keeps the reference's channel-first
window assembly and cube_batch_host() transposes once per window)

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
from deepphysinet_tpu.ops.interp import (
    trilinear_interp_rows,
    trilinear_interp_rows_batched,
)
from deepphysinet_tpu.train.train_step import (
    PointBatch,
    StepConfig,
    TrainState,
    _variable_metrics,
    _window_losses,
)
from deepphysinet_tpu.train.losses import build_loss


class CubeBatch(NamedTuple):
    """Per-window device cubes, channel-LAST.

    The host/reference layout is channel-first ([6, H, W, T],
    dataset/physics_dataset.py window assembly); on DEVICE the cubes are
    stored channel-last so that every sampled point's 6 variables are one
    contiguous row -- each label lookup / interp corner is then a single
    row gather from a [H*W*T, 6] operand (isolated: ~8x faster on v5e than
    gathering the channel-first layout passed as a runtime argument;
    in-program the win is smaller -- large-operand gathers are
    HBM-latency-bound there; scripts/perf_capture_vs_arg.py and
    docs/PERF.md round-3 (i)).  Also removes the vmap batching penalty for
    B>1 window batches.  Build instances with cube_batch_host()/
    cube_batch_from_items(), which do the one-time host-side transpose."""

    field: jnp.ndarray  # [B, L, enc_in]
    forecast_h: jnp.ndarray  # [B]
    nwp_cube: jnp.ndarray  # [B, H, W, T, 6] normalized NWP window
    label_cube: jnp.ndarray  # [B, Hl, Wl, Tl, 6] normalized ERA5 window


class DeviceLRU:
    """Tiny bounded LRU for device-resident values (window cubes).

    One implementation shared by the train-loop cube cache and both
    validation cube caches (single + distributed) so capacity/eviction
    behavior cannot drift between them."""

    def __init__(self, cap: int):
        from collections import OrderedDict

        self.cap = int(cap)
        self._d: "OrderedDict" = OrderedDict()

    def get(self, key, build):
        if key in self._d:
            self._d.move_to_end(key)
            return self._d[key]
        value = build()
        self._d[key] = value
        if len(self._d) > self.cap:
            self._d.popitem(last=False)
        return value


def cube_batch_host(field, forecast_h, nwp_cube_cf, label_cube_cf) -> CubeBatch:
    """Host numpy CubeBatch from REFERENCE channel-first cubes [B, 6, ...].

    The single place the channel-first -> channel-last layout decision is
    applied (one ~40 ms numpy transpose per window, amortized across the
    hundreds of steps a cached window is resampled).  Caller device_puts."""
    import numpy as np

    return CubeBatch(
        field=np.asarray(field, np.float32),
        forecast_h=np.asarray(forecast_h, np.float32).reshape(-1),
        nwp_cube=np.ascontiguousarray(
            np.moveaxis(np.asarray(nwp_cube_cf, np.float32), 1, -1)),
        label_cube=np.ascontiguousarray(
            np.moveaxis(np.asarray(label_cube_cf, np.float32), 1, -1)),
    )


def cube_batch_from_items(items) -> CubeBatch:
    """Host numpy CubeBatch from a list of ``get_cube_item`` dicts."""
    import numpy as np

    return cube_batch_host(
        np.stack([np.asarray(it["field_data"], np.float32) for it in items]),
        np.asarray([np.float32(it["forecast_h"]) for it in items], np.float32),
        np.stack([np.asarray(it["nwp_cube"], np.float32) for it in items]),
        np.stack([np.asarray(it["label_cube"], np.float32) for it in items]),
    )


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
    nwp_cube: jnp.ndarray,  # [H, W, T, 6] channel-LAST
    label_cube: jnp.ndarray,  # [Hl, Wl, Tl, 6] channel-LAST
    scfg: SamplerConfig,
    coord_spec,
) -> Tuple[PointBatch, PointBatch]:
    """Sample one window's margin + inter PointBatches on-device.

    Cubes are channel-last (see CubeBatch): the label lookup is one row
    gather and the conditioning interp gathers [N, 6] rows per corner."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    Hl, Wl, Tl = label_cube.shape[0], label_cube.shape[1], label_cube.shape[2]
    nm, ni = scfg.n_margin, scfg.n_inter

    # ---- margin: integer fine-grid points with exact label gather ----
    mx = jax.random.randint(k1, (nm,), 0, Wl)
    my = jax.random.randint(k2, (nm,), 0, Hl)
    # labels exist every label_time_step hours; sample those slots
    # (physics_dataset.py:338 samples integer hours; label_time_step=1 default)
    n_slots = scfg.window_h // scfg.label_time_step + 1
    slot = jax.random.randint(k3, (nm,), 0, n_slots)
    mt = slot * scfg.label_time_step
    flat = (my * Wl + mx) * Tl + slot
    labels = jnp.take(label_cube.reshape(-1, 6), flat, axis=0)  # [nm, 6]

    m_lon = scfg.begin_lon + mx * scfg.fine_step
    m_lat = scfg.begin_lat + my * scfg.fine_step
    m_nwp = trilinear_interp_rows(
        nwp_cube, m_lon.astype(jnp.float32), m_lat.astype(jnp.float32),
        mt.astype(jnp.float32),
        lon0=scfg.begin_lon, dlon=scfg.coarse_step,
        lat0=scfg.begin_lat, dlat=scfg.coarse_step,
        t0=0.0, dt=float(scfg.input_time_step),
    )  # [nm, 6]
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
    i_nwp = trilinear_interp_rows(
        nwp_cube, i_lon, i_lat, it.astype(jnp.float32),
        lon0=scfg.begin_lon, dlon=scfg.coarse_step,
        lat0=scfg.begin_lat, dlat=scfg.coarse_step,
        t0=0.0, dt=float(scfg.input_time_step),
    )
    inter = PointBatch(
        x=(ix * coord_spec.dx).astype(jnp.float32),
        y=(iy * coord_spec.dy).astype(jnp.float32),
        t=(it * 3600.0).astype(jnp.float32),
        f=_coriolis_from_lat(i_lat),
        nwp=i_nwp.astype(jnp.float32),
        labels=jnp.zeros((ni, 6), jnp.float32),
    )
    return margin, inter


def sample_window_points_batched(
    keys: jax.Array,  # [B] per-window keys
    nwp_cube: jnp.ndarray,  # [B, H, W, T, 6] channel-LAST
    label_cube: jnp.ndarray,  # [B, Hl, Wl, Tl, 6] channel-LAST
    scfg: SamplerConfig,
    coord_spec,
) -> Tuple[PointBatch, PointBatch]:
    """Batch of windows WITHOUT vmap -> PointBatches with leading [B].

    ``jax.vmap(sample_window_points)`` lowers the gathers ~3.6x slower on
    v5e (scripts/perf_vmap_sampler.py).  This version draws the SAME
    per-window random points (RNG ops vmap elementwise, penalty-free) but
    runs every lookup as a flat ROW gather: channel-last cubes make the
    batch fold free ([B,...,6] -> [B*X, 6] with no data movement, batch
    enters via the absolute row index).  Bitwise-equal outputs to
    vmap(sample_window_points) -- tested in tests/test_device_sampling.py."""
    B = label_cube.shape[0]
    Hl, Wl, Tl = label_cube.shape[1], label_cube.shape[2], label_cube.shape[3]
    nm, ni = scfg.n_margin, scfg.n_inter
    ks = jax.vmap(lambda k: jax.random.split(k, 6))(keys)  # [B, 6, key]
    k1, k2, k3 = ks[:, 0], ks[:, 1], ks[:, 2]
    k4, k5, k6 = ks[:, 3], ks[:, 4], ks[:, 5]

    # ---- margin: integer fine-grid points with exact label gather ----
    mx = jax.vmap(lambda k: jax.random.randint(k, (nm,), 0, Wl))(k1)  # [B, nm]
    my = jax.vmap(lambda k: jax.random.randint(k, (nm,), 0, Hl))(k2)
    n_slots = scfg.window_h // scfg.label_time_step + 1
    slot = jax.vmap(lambda k: jax.random.randint(k, (nm,), 0, n_slots))(k3)
    mt = slot * scfg.label_time_step
    X = Hl * Wl * Tl
    flat = (my * Wl + mx) * Tl + slot + (jnp.arange(B, dtype=jnp.int32) * X)[:, None]
    labels = jnp.take(label_cube.reshape(B * X, 6), flat.reshape(-1), axis=0)
    labels = labels.reshape(B, nm, 6)

    m_lon = scfg.begin_lon + mx * scfg.fine_step
    m_lat = scfg.begin_lat + my * scfg.fine_step
    m_nwp = trilinear_interp_rows_batched(
        nwp_cube, m_lon.astype(jnp.float32), m_lat.astype(jnp.float32),
        mt.astype(jnp.float32),
        lon0=scfg.begin_lon, dlon=scfg.coarse_step,
        lat0=scfg.begin_lat, dlat=scfg.coarse_step,
        t0=0.0, dt=float(scfg.input_time_step),
    )  # [B, nm, 6]
    m_lat_f = m_lat.astype(jnp.float32)
    margin = PointBatch(
        x=(mx * coord_spec.dx).astype(jnp.float32),
        y=(my * coord_spec.dy).astype(jnp.float32),
        t=(mt * 3600.0).astype(jnp.float32),
        f=(2.0 * OMEGA * jnp.sin(m_lat_f / 180.0 * jnp.pi))[..., None],
        nwp=m_nwp.astype(jnp.float32),
        labels=labels.astype(jnp.float32),
    )

    # ---- inter: continuous collocation points ----
    ix = jax.vmap(lambda k: jax.random.uniform(k, (ni,)))(k4) * (Wl - 1)
    iy = jax.vmap(lambda k: jax.random.uniform(k, (ni,)))(k5) * (Hl - 1)
    it = jax.vmap(lambda k: jax.random.randint(k, (ni,), 0, scfg.window_h + 1))(k6)
    i_lon = scfg.begin_lon + ix * scfg.fine_step
    i_lat = scfg.begin_lat + iy * scfg.fine_step
    i_nwp = trilinear_interp_rows_batched(
        nwp_cube, i_lon, i_lat, it.astype(jnp.float32),
        lon0=scfg.begin_lon, dlon=scfg.coarse_step,
        lat0=scfg.begin_lat, dlat=scfg.coarse_step,
        t0=0.0, dt=float(scfg.input_time_step),
    )
    inter = PointBatch(
        x=(ix * coord_spec.dx).astype(jnp.float32),
        y=(iy * coord_spec.dy).astype(jnp.float32),
        t=(it * 3600.0).astype(jnp.float32),
        f=(2.0 * OMEGA * jnp.sin(i_lat / 180.0 * jnp.pi))[..., None],
        nwp=i_nwp.astype(jnp.float32),
        labels=jnp.zeros((B, ni, 6), jnp.float32),
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
        # Sampling runs BATCHED OUTSIDE the vmap: vmapping the gathers costs
        # ~1.3 ms/step on v5e (docs/PERF.md round-3 (i)); the points drawn
        # are bitwise-identical to the per-window form.
        margin, inter = sample_window_points_batched(
            keys, batch.nwp_cube, batch.label_cube, scfg, cfg.coord_spec
        )

        def one_window(tokens_b, fh_b, margin_b, inter_b):
            return _window_losses(
                model, params, tokens_b, fh_b, margin_b, inter_b, cfg, with_pde, pred_loss_fn
            )

        per_window = jax.vmap(one_window)(tokens, fh_norm, margin, inter)
        pred_norm = per_window.pop("_pred_norm")
        labels = margin.labels
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

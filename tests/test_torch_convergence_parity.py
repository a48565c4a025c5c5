"""Training-dynamics parity over a CONVERGENCE horizon (round-5 VERDICT #4).

tests/test_torch_train_parity.py pins the step MATH over 3 coupled optimizer
steps; this file extends the same torch twin to a 150-step training run at
tiny dims on shared synthetic data with learnable signal, through

* the data-only -> physics curriculum flip (``pde_start_step``, reference
  interface_physics.py:455-460),
* per-epoch CosineAnnealingLR stepping across multiple epoch boundaries,
  including the T_max minimum and the post-T_max rise (reference recipe:
  configs/DeepPhysiNet_NCEP_cfg.py:176 -- CosineAnnealingLR(T_max=5); the
  torch side steps ``torch.optim.lr_scheduler.CosineAnnealingLR``, the JAX
  side injects the closed form from train/schedules.py, so schedule parity
  is between two INDEPENDENT implementations),
* coupled-L2 Adam + grad clip every step.

Silent divergence that compounds over many steps (accumulation order,
schedule stepping, clip interaction) is exactly what a 3-step check cannot
see; here the loss curves must track per-epoch, the injected LR must match
torch's scheduler at every epoch, and the final held-out RMSE of the two
trained models must agree to a few percent -- the strongest accuracy-parity
proxy available without the reference's ERA5/TIGGE archives.

Runtime: ~2-3 min on CPU (the torch twin pays 18 autograd.grads per physics
step); dims are the tiny test dims from tests/test_train_step.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.ops.coords import CoordSpec, encode_coord
from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
from deepphysinet_tpu.train.optim import build_optimizer, set_learning_rate
from deepphysinet_tpu.train.schedules import cosine_annealing_lr
from deepphysinet_tpu.train.train_step import (
    Batch, PointBatch, StepConfig, create_train_state, make_train_step)
from tests.test_train_step import FACTORS, META, NET, OBS_CFG
from tests.test_torch_train_parity import TorchTwin, _pe, _t

N_STEPS = 150
STEPS_PER_EPOCH = 10
PDE_START = 50          # curriculum flips mid-run
LR, WD = 1e-3, 1e-4     # reference wd; lr scaled so 150 tiny-dim steps learn
T_MAX, ETA_MIN = 5, LR / 20.0  # reference lr/eta_min ratio (1e-4 : 5e-6)

CS = CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0,
               pred_t_span=86400.0)


def _truth_norm(cn):
    """Smooth per-variable truth in NORMALIZED output space, cn in [0,1]^3."""
    x, y, t = cn[..., 0], cn[..., 1], cn[..., 2]
    cols = []
    for i in range(6):
        cols.append(0.22 * np.sin(2 * np.pi * (x + 0.13 * i))
                    * np.cos(2 * np.pi * (y - 0.07 * i))
                    + 0.12 * np.sin(2 * np.pi * t + 0.9 * i))
    return np.stack(cols, -1).astype(np.float32)


def _bias(cn):
    """The systematic NWP error the model must learn to correct."""
    x, y, t = cn[..., 0], cn[..., 1], cn[..., 2]
    cols = []
    for i in range(6):
        cols.append(0.15 * np.cos(2 * np.pi * (x - 0.21 * i))
                    * np.sin(2 * np.pi * (y + 0.11 * i) + 0.5 * t))
    return np.stack(cols, -1).astype(np.float32)


def _points(rng, n):
    """(coords [n,3] meters/seconds, cn [n,3] normalized, nwp, labels, f)."""
    cn = rng.rand(n, 3).astype(np.float32)
    coords = np.stack([cn[:, 0] * CS.dx * (CS.lon_size - 1),
                       cn[:, 1] * CS.dy * (CS.lat_size - 1),
                       cn[:, 2] * CS.pred_t_span], -1).astype(np.float32)
    truth = _truth_norm(cn)
    nwp = truth - _bias(cn)
    f = (rng.rand(n, 1) * 1e-4).astype(np.float32)
    return coords, cn, nwp, truth, f


def _batch(rng, field, Nm=32, Ni=16):
    def pb(n, labels=True):
        coords, _, nwp, truth, f = _points(rng, n)
        return PointBatch(
            x=jnp.asarray(coords[None, :, 0]), y=jnp.asarray(coords[None, :, 1]),
            t=jnp.asarray(coords[None, :, 2]), f=jnp.asarray(f[None]),
            nwp=jnp.asarray(nwp[None]),
            labels=jnp.asarray(truth[None]) if labels else None)

    return Batch(field=field, forecast_h=jnp.array([24.0]),
                 margin=pb(Nm), inter=pb(Ni))


def test_convergence_trajectory_and_heldout_rmse_match_torch():
    model = PhysicsNet(meta_cfg=META, net_cfg=NET)
    specs = norm_specs_from_cfg(OBS_CFG)
    cfg = StepConfig(
        coord_spec=CS,
        obs_specs=tuple(specs[k] for k in OBS_NAME_ORDER),
        loss_factor=FACTORS,
        pde_start_step=PDE_START,
        pde_engine="jvp",
    )
    tx = build_optimizer("Adam", lr=LR, weight_decay=WD)
    rng = np.random.RandomState(77)
    field = jnp.asarray(rng.randn(1, 12, META["enc_in"]).astype(np.float32))
    state = create_train_state(model, tx, jax.random.PRNGKey(11),
                               _batch(np.random.RandomState(0), field))

    twin = TorchTwin(state.params, cfg)
    opt = torch.optim.Adam(twin.parameters(), lr=LR, weight_decay=WD,
                           betas=(0.9, 0.999), eps=1e-8)
    torch_sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=T_MAX, eta_min=ETA_MIN)
    jax_sched = cosine_annealing_lr(lr=LR, T_max=T_MAX, eta_min=ETA_MIN)

    step = make_train_step(model, tx, cfg)
    batch_rng = np.random.RandomState(1234)
    batches = [_batch(batch_rng, field) for _ in range(N_STEPS)]

    traj_j, traj_t, lr_pairs = [], [], []
    for i, b in enumerate(batches):
        epoch = i // STEPS_PER_EPOCH
        if i % STEPS_PER_EPOCH == 0 and i > 0:
            # epoch boundary: JAX injects the closed form, torch steps its
            # own recursive scheduler -- two independent implementations
            torch_sched.step()
            set_learning_rate(state.opt_state, jax_sched(epoch))
            lr_pairs.append((jax_sched(epoch), opt.param_groups[0]["lr"]))
        with_pde = i >= PDE_START
        state, mj = step(state, b, with_pde=with_pde)
        traj_j.append({k: float(v) for k, v in mj.items()})
        traj_t.append(twin.train_step(opt, b, with_pde=with_pde))

    # --- schedule parity at every epoch boundary (incl. T_max min + rise) ---
    for lj, lt in lr_pairs:
        np.testing.assert_allclose(lj, lt, rtol=1e-6)
    assert len(lr_pairs) == N_STEPS // STEPS_PER_EPOCH - 1

    # --- curriculum flip happened identically ---
    assert "margin_montion_u_loss" not in traj_j[PDE_START - 1]
    assert "margin_montion_u_loss" in traj_j[PDE_START]
    assert "margin_montion_u_loss" not in traj_t[PDE_START - 1]
    assert "margin_montion_u_loss" in traj_t[PDE_START]

    # --- loss curves track per-epoch over the whole horizon ---
    tj = np.array([m["total_loss"] for m in traj_j])
    tt = np.array([m["total_loss"] for m in traj_t])
    mj = np.array([m["margin_loss"] for m in traj_j])
    mt = np.array([m["margin_loss"] for m in traj_t])
    n_ep = N_STEPS // STEPS_PER_EPOCH
    for e in range(n_ep):
        s = slice(e * STEPS_PER_EPOCH, (e + 1) * STEPS_PER_EPOCH)
        np.testing.assert_allclose(tj[s].mean(), tt[s].mean(), rtol=0.10,
                                   err_msg=f"total_loss epoch {e}")
        np.testing.assert_allclose(mj[s].mean(), mt[s].mean(), rtol=0.10,
                                   err_msg=f"margin_loss epoch {e}")
    # learning actually happened (data loss fell substantially)
    assert mj[-STEPS_PER_EPOCH:].mean() < 0.2 * mj[:STEPS_PER_EPOCH].mean()

    # --- final held-out RMSE: the two trained models agree ---
    ho_rng = np.random.RandomState(99)
    coords, cn, nwp, truth, _ = _points(ho_rng, 512)
    fh_norm = np.array([[24.0]], np.float32) / cfg.forecast_time_period

    tokens_j = model.apply(state.params, field, jnp.asarray(fh_norm),
                           method=PhysicsNet.encode)
    pe = encode_coord(jnp.asarray(coords[:, 0]), jnp.asarray(coords[:, 1]),
                      jnp.asarray(coords[:, 2]), cfg.coord_spec)
    pred_j = np.asarray(model.apply(state.params, tokens_j[0], pe,
                                    jnp.asarray(nwp), jnp.asarray(fh_norm[0]),
                                    method=PhysicsNet.decode))

    with torch.no_grad():
        tokens_t = twin.encode(field, fh_norm)[0]
        cn_t = _t(cn)
        pred_t = twin.decode(tokens_t, _pe(cn_t, cfg.coord_spec.n_freqs),
                             _t(nwp), _t(fh_norm[0])).numpy()

    rmse_j = np.sqrt(((pred_j - truth) ** 2).mean(0))
    rmse_t = np.sqrt(((pred_t - truth) ** 2).mean(0))
    rmse_0 = np.sqrt((_bias(cn) ** 2).mean(0))  # untrained error = the bias
    print("held-out RMSE [jax / torch / raw-NWP bias]:")
    for v in range(6):
        print(f"  {OBS_NAME_ORDER[v]}: {rmse_j[v]:.5f} / {rmse_t[v]:.5f} "
              f"/ {rmse_0[v]:.5f}")
    for v in range(6):
        np.testing.assert_allclose(
            rmse_j[v], rmse_t[v], rtol=0.05,
            err_msg=f"held-out RMSE var {OBS_NAME_ORDER[v]}")
        # per-var guard is loose on purpose: the physics residuals actively
        # trade wind accuracy on this synthetic truth (which solves no PDE),
        # and BOTH frameworks agree on that trade (v10 ends ~1.05x bias in
        # each) -- the parity assert above is the point of this test
        assert rmse_j[v] < 1.15 * rmse_0[v], (
            f"{OBS_NAME_ORDER[v]}: diverged ({rmse_j[v]} vs bias "
            f"{rmse_0[v]})")
    # aggregate learning across the 6 heads (measured 0.78x at 150 steps;
    # the scalar heads reach ~0.65-0.70x, the wind heads lag under the
    # physics trade-off above)
    assert rmse_j.mean() < 0.85 * rmse_0.mean(), (
        f"no aggregate convergence: {rmse_j.mean()} vs bias {rmse_0.mean()}")

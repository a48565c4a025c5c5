"""Training-DYNAMICS parity: the full physics-informed training step vs a
faithful torch replica (round-2 VERDICT missing #3).

The north-star "ERA5 RMSE parity with the reference" is unverifiable here (no
TIGGE/ERA5 data), so this is the strongest achievable proxy: an INDEPENDENT
torch implementation of the reference's hot loop -- encode, decode, margin
SmoothL1 data loss, BOTH collocation batches through 18 reverse-mode
``torch.autograd.grad(create_graph=True)`` derivatives and the six equation
residuals with the reference's exact detach/clip/factor semantics
(/root/reference/DeepPhysiNet/interface/interface_physics.py:90-175,271-320,
433-515), global backward, grad-norm clip at 2.5e7 (:514), torch-coupled-L2
Adam -- stepped side by side with the JAX train step on identical weights and
batches.  Loss and gradient-norm trajectories must agree over 3 steps, and
every per-equation loss must agree at step 1.

The JAX engine computes derivatives forward-mode (analytic tangents) and the
twin reverse-mode like the reference: agreement here checks the MATH, not the
implementation strategy.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.ops.coords import CoordSpec
from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
from deepphysinet_tpu.train.optim import build_optimizer
from deepphysinet_tpu.train.train_step import (
    StepConfig, create_train_state, make_train_step)
from tests.test_train_step import FACTORS, META, NET, OBS_CFG, _make_batch

_CLIPPED = (False, False, True, True, True, True)  # u, v never clip
_EQ_FACTOR = dict(montion_u="motion_u_factor", montion_v="motion_v_factor",
                  continous="continuous_factor", energy="energy_factor",
                  vapor="vapor_factor", gas="gas_factor")
C_P, R_D, R_V, LHEAT, EPS_RHO = 1005.0, 287.0, 461.5, 2.5e6, 1e-6


def _t(x):
    return torch.from_numpy(np.array(x, np.float32, copy=True))


def _gelu(x):
    return F.gelu(x, approximate="tanh")  # jax.nn.gelu default


def _pe(x, n_freqs):
    """SineCos PE, the reference's expand/transpose/stack/reshape layout."""
    freq = 2.0 ** torch.linspace(0.0, 4.0, n_freqs)
    embeds = []
    for fn in (torch.sin, torch.cos):
        xf = x[..., None].expand(x.shape + (n_freqs,)) * freq
        embeds.append(fn(xf).transpose(-1, -2))
    return torch.stack(embeds, -2).reshape(*x.shape[:-1], -1)


class TorchTwin:
    """Differentiable torch replica of PhysicsNet + the training objective."""

    def __init__(self, jax_params, cfg: StepConfig):
        self.p = jax.tree.map(
            lambda x: torch.nn.Parameter(_t(x)), jax_params["params"])
        self.cfg = cfg

    def parameters(self):
        return jax.tree.leaves(self.p)

    # ---- encoder (TransformerNet twin, differentiable) ----

    def encode(self, field, fh_norm):
        p, d = self.p["meta_net"], META["d_model"]
        w = p["enc_embedding"]["value_embedding"]["kernel"]  # [k, c_in, d]
        x = _t(field).permute(0, 2, 1)  # [B, c_in, L]
        x = F.pad(x, (1, 1), mode="circular")
        v = F.conv1d(x, w.permute(2, 1, 0),
                     p["enc_embedding"]["value_embedding"]["bias"]).transpose(1, 2)
        tok = p["learnable_token"].expand(v.shape[0], -1, -1)
        h = torch.cat([tok, v], dim=1)
        L = h.shape[1]
        pe = torch.zeros(L, d)
        pos = torch.arange(0, L).float().unsqueeze(1)
        div = (torch.arange(0, d, 2).float() * -(np.log(10000.0) / d)).exp()
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        time_emb = _pe(_t(fh_norm), d // 2)  # [B, d]
        h = h + pe[None] + time_emb[:, None, :]
        for i in range(META["e_layers"]):
            h = self._layer(p[f"layer_{i}"], h)
        h = F.layer_norm(h, (d,), p["norm"]["scale"], p["norm"]["bias"])
        return h @ p["projection"]["kernel"] + p["projection"]["bias"]

    def _layer(self, lp, x):
        d, nh = META["d_model"], META["n_heads"]
        e = d // nh
        ap = lp["attention"]
        B, L, _ = x.shape
        q = (x @ ap["query_projection"]["kernel"]
             + ap["query_projection"]["bias"]).view(B, L, nh, e)
        k = (x @ ap["key_projection"]["kernel"]
             + ap["key_projection"]["bias"]).view(B, L, nh, e)
        v = (x @ ap["value_projection"]["kernel"]
             + ap["value_projection"]["bias"]).view(B, L, nh, e)
        scores = torch.einsum("blhe,bshe->bhls", q, k)
        a = torch.softmax(scores / np.sqrt(e), dim=-1)
        o = torch.einsum("bhls,bshd->blhd", a, v).reshape(B, L, d)
        o = o @ ap["out_projection"]["kernel"] + ap["out_projection"]["bias"]
        x = x + o
        x = F.layer_norm(x, (d,), lp["norm1"]["scale"], lp["norm1"]["bias"])
        y = _gelu(x @ lp["conv1"]["kernel"] + lp["conv1"]["bias"])
        y = y @ lp["conv2"]["kernel"] + lp["conv2"]["bias"]
        return F.layer_norm(x + y, (d,), lp["norm2"]["scale"], lp["norm2"]["bias"])

    # ---- hypernet decode (VariableNet twin, differentiable) ----

    def decode(self, tokens, pe_in, cd, fh):
        """[T,d] tokens, [N,in_ch] PE, [N,6] conditioning, scalar fh -> [N,6]."""
        vp = self.p["variable_nets"]
        in_ch, hid, tn = (NET["in_channels"], NET["hidden_channels"],
                          NET["learnable_token_num"])
        meta = tokens[:tn]
        cd_pe = _pe(cd, in_ch // 2 // 6)
        fh_pe = _pe(fh.reshape(1, 1), in_ch // 2).reshape(-1)
        outs = []
        for v in range(6):
            def lin(name, x):
                return x @ vp[name]["kernel"][v] + vp[name]["bias"][v]

            w = lin("coord_input_fc", meta.T)  # [d, in_ch+1]
            w1, b1 = w[:, :in_ch], w[:, in_ch]
            w = lin("coord_hidden_fc", meta.T)
            w2, b2 = w[:, :hid], w[:, hid]
            x = torch.relu(pe_in @ w1.T + b1) @ w2.T + b2
            c = x + lin("data_input_fc", cd_pe) + lin("fore_h_fc", fh_pe)
            f1 = c @ vp["cat_fc1"]["fc1"]["kernel"][v] + vp["cat_fc1"]["fc1"]["bias"][v]
            f2 = torch.relu(f1) @ vp["cat_fc1"]["fc2"]["kernel"][v] + vp["cat_fc1"]["fc2"]["bias"][v]
            y = (f2 + c) + c
            o = y @ vp["out_fc"]["kernel"][v] + vp["out_fc"]["bias"][v]
            outs.append(o[:, 0] + cd[:, v])
        return torch.stack(outs, -1)  # [N, 6] normalized

    # ---- physics (inverse norm + reference equations, reverse-mode) ----

    def phys(self, out_norm):
        cols = []
        for i, key in enumerate(OBS_NAME_ORDER):
            spec = self.cfg.obs_specs[i]
            mean, std = float(spec.norm_factor[0]), float(spec.norm_factor[1])
            x = out_norm[:, i] * std + mean
            if _CLIPPED[i] and spec.bound is not None:
                x = torch.clip(x, float(spec.bound[0]), float(spec.bound[1]))
            cols.append(x)
        return cols  # [u, v, p, T, q, rho], each [N]

    def pde_losses(self, tokens, coords, cd, cor_f, fh):
        """The six equation losses at ``coords`` [N,3] (x m, y m, t s), plus
        the normalized decode output (shared with the data loss), via 18
        reverse-mode derivatives like the reference (:90-95)."""
        cs = self.cfg.coord_spec
        coords = coords.clone().requires_grad_(True)
        cn = torch.stack(
            [coords[:, 0] / cs.dx / (cs.lon_size - 1),
             coords[:, 1] / cs.dy / (cs.lat_size - 1),
             coords[:, 2] / cs.pred_t_span], -1)
        pe_in = _pe(cn, cs.n_freqs)
        out_norm = self.decode(tokens, pe_in, cd, fh)
        u, v, p, T, q, rho = self.phys(out_norm)

        def d(field):  # du/d(x,y,t) with graph (reference autograd.grad calls)
            return torch.autograd.grad(field.sum(), coords, create_graph=True)[0]

        du, dv, dp, dT, dq, drho = d(u), d(v), d(p), d(T), d(q), d(rho)
        f = cor_f[:, 0]
        factors = self.cfg.factors()

        def mse(diff, const):
            return torch.mean((diff - const) ** 2)

        losses = {}
        diff = du[:, 2] + u * du[:, 0] + v * du[:, 1] + dp[:, 0] / rho
        losses["montion_u"] = mse(diff, f * v) * factors["motion_u_factor"]
        diff = dv[:, 2] + u * dv[:, 0] + v * dv[:, 1] + dp[:, 1] / rho
        losses["montion_v"] = mse(diff, -f * u) * factors["motion_v_factor"]
        diff = (drho[:, 2] + u * drho[:, 0] + v * drho[:, 1]
                + rho * du[:, 0] + rho * dv[:, 1])
        losses["continous"] = mse(diff, torch.zeros_like(diff)) * factors["continuous_factor"]
        diff = (C_P * (dT[:, 2] + u * dT[:, 0] + v * dT[:, 1])
                - (dp[:, 2] + u * dp[:, 0] + v * dp[:, 1]) / (rho + EPS_RHO)
                + LHEAT * (dq[:, 2] + u * dq[:, 0] + v * dq[:, 1]))
        losses["energy"] = mse(diff, torch.zeros_like(diff)) * factors["energy_factor"]

        # vapor: Tetens q_s, delta, F-factor all detached (:146-175,181-185)
        dpt = dp[:, 2] + u * dp[:, 0] + v * dp[:, 1]
        dqt = dq[:, 2] + u * dq[:, 0] + v * dq[:, 1]
        tC = T - 273.15
        e_s = 6.112 * torch.exp(17.67 * tC / (tC + 243.5)) * 100.0
        q_s = torch.clamp((0.622 * e_s / (p - 0.378 * e_s)).detach(), min=1e-6)
        delta = ((dpt < 0) & (q >= q_s)).float().detach()
        r_moist = (1.0 + 0.608 * q) * R_D
        f_fac = (LHEAT * r_moist - C_P * R_V * T) / (
            C_P * R_V + T * T + LHEAT ** 2 * q_s)
        f_fac = (f_fac * q_s * T).detach()
        diff = -dpt * delta * f_fac / (p + EPS_RHO) + dqt
        losses["vapor"] = mse(diff, torch.zeros_like(diff)) * factors["vapor_factor"]
        losses["gas"] = mse(p, rho * (1.0 + 0.608 * q) * R_D * T) * factors["gas_factor"]
        return losses, out_norm

    # ---- one full training step ----

    def train_step(self, opt, batch, with_pde=True):
        cfg = self.cfg
        fh_norm = np.asarray(batch.forecast_h)[:, None] / cfg.forecast_time_period
        tokens = self.encode(np.asarray(batch.field), fh_norm)[0]
        factors = cfg.factors()

        def pts(pb):
            coords = torch.stack(
                [_t(pb.x[0]), _t(pb.y[0]), _t(pb.t[0])], -1)
            return coords, _t(pb.nwp[0]), _t(pb.f[0])

        fh = _t(fh_norm[0])
        m_coords, m_cd, m_f = pts(batch.margin)
        if with_pde:
            m_losses, m_out = self.pde_losses(tokens, m_coords, m_cd, m_f, fh)
        else:
            # data-only curriculum phase (reference trains data-only until
            # pde_start_step, interface_physics.py:455-460)
            cs = cfg.coord_spec
            cn = torch.stack(
                [m_coords[:, 0] / cs.dx / (cs.lon_size - 1),
                 m_coords[:, 1] / cs.dy / (cs.lat_size - 1),
                 m_coords[:, 2] / cs.pred_t_span], -1)
            m_out = self.decode(tokens, _pe(cn, cs.n_freqs), m_cd, fh)
            m_losses = {}
        data_loss = F.smooth_l1_loss(
            m_out, _t(batch.margin.labels[0]), beta=0.1) * factors["margin_factor"]
        if with_pde:
            i_coords, i_cd, i_f = pts(batch.inter)
            i_losses, _ = self.pde_losses(tokens, i_coords, i_cd, i_f, fh)
        else:
            i_losses = {}
        total = data_loss + sum(m_losses.values()) + sum(i_losses.values())

        opt.zero_grad()
        total.backward()
        gnorm = torch.sqrt(sum((p.grad ** 2).sum() for p in self.parameters()
                               if p.grad is not None))
        scale = min(1.0, cfg.grad_clip_norm / (float(gnorm) + 1e-6))
        for p in self.parameters():
            if p.grad is not None:
                p.grad.mul_(scale)
        opt.step()
        metrics = {f"margin_{k}_loss": float(v) for k, v in m_losses.items()}
        metrics.update({f"inter_{k}_loss": float(v) for k, v in i_losses.items()})
        metrics.update(margin_loss=float(data_loss), grad_norm=float(gnorm),
                       total_loss=float(total))
        return metrics


@pytest.mark.parametrize("engine", ["jvp", "linearize"])
def test_training_trajectory_matches_torch_replica(engine):
    model = PhysicsNet(meta_cfg=META, net_cfg=NET)
    specs = norm_specs_from_cfg(OBS_CFG)
    cfg = StepConfig(
        coord_spec=CoordSpec(lon_size=257, lat_size=145, dx=27000.0,
                             dy=27000.0, pred_t_span=86400.0),
        obs_specs=tuple(specs[k] for k in OBS_NAME_ORDER),
        loss_factor=FACTORS,
        pde_start_step=0,
        pde_engine=engine,
    )
    lr, wd = 1e-3, 1e-4
    tx = build_optimizer("Adam", lr=lr, weight_decay=wd)
    batches = [_make_batch(np.random.RandomState(400 + i), B=1, Nm=32, Ni=16)
               for i in range(3)]
    state = create_train_state(model, tx, jax.random.PRNGKey(5), batches[0])

    twin = TorchTwin(state.params, cfg)
    opt = torch.optim.Adam(twin.parameters(), lr=lr, weight_decay=wd,
                           betas=(0.9, 0.999), eps=1e-8)

    step = make_train_step(model, tx, cfg)
    traj_j, traj_t = [], []
    for b in batches:
        state, mj = step(state, b, with_pde=True)
        traj_j.append({k: float(v) for k, v in mj.items()})
        traj_t.append(twin.train_step(opt, b))

    # per-equation losses at step 1 (both point sets)
    for eq in _EQ_FACTOR:
        for where in ("margin", "inter"):
            a = traj_j[0][f"{where}_{eq}_loss"]
            b = traj_t[0][f"{where}_{eq}_loss"]
            np.testing.assert_allclose(a, b, rtol=2e-3, err_msg=f"{where}_{eq}")
    # loss + gradient trajectories across 3 coupled optimizer steps
    for i, (mj, mt) in enumerate(zip(traj_j, traj_t)):
        np.testing.assert_allclose(mj["margin_loss"], mt["margin_loss"],
                                   rtol=2e-3, err_msg=f"margin step {i}")
        np.testing.assert_allclose(mj["total_loss"], mt["total_loss"],
                                   rtol=3e-3, err_msg=f"total step {i}")
        np.testing.assert_allclose(mj["grad_norm"], mt["grad_norm"],
                                   rtol=5e-3, err_msg=f"gnorm step {i}")

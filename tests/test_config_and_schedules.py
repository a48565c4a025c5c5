"""Config loader and LR schedule tests."""

import math
import os
import textwrap

import pytest

from deepphysinet_tpu.config import Config, update_params
from deepphysinet_tpu.train.losses import build_loss
from deepphysinet_tpu.train.schedules import build_lr_schedule


def test_config_fromfile(tmp_path):
    p = tmp_path / "cfg.py"
    p.write_text(textwrap.dedent("""
        mode = 'train'
        img_size = (145, 257)
        config = dict(
            name='InterfacePhysics',
            meta_cfg=dict(name='TransformerNet', enc_in=2405, d_model=256),
            train_cfg=dict(batch_size=1, dx=27000),
        )
    """))
    cfg = Config.fromfile(str(p))
    assert cfg.mode == "train"
    assert cfg.img_size == (145, 257)
    assert cfg.config.meta_cfg.enc_in == 2405
    assert cfg.config["train_cfg"]["dx"] == 27000


def test_reference_schema_config_loads():
    """The shipped config mirrors the reference schema and must load."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "configs", "DeepPhysiNet_NCEP_cfg.py")
    if not os.path.exists(path):
        pytest.skip("default config not present yet")
    cfg = Config.fromfile(path)
    c = cfg.config
    assert c.meta_cfg.enc_in == 2405
    assert c.net_cfg.token_num == 159
    assert c.train_cfg.losses.loss_factor.vapor_factor == 1e14
    assert set(c.obs_norm_cfg.keys()) >= {"u10", "v10", "pres", "t2", "q2", "rio"}


def test_update_params():
    cfg = {"a": {"b": 1, "c": 2}, "d": 3}
    update_params(cfg, {"a.b": 10, "d": 30, "e.f": 5})
    assert cfg["a"]["b"] == 10 and cfg["a"]["c"] == 2
    assert cfg["d"] == 30 and cfg["e"]["f"] == 5


def test_cosine_annealing_matches_torch_closed_form():
    lr, T_max, eta_min = 1e-4, 5, 5e-6
    sched = build_lr_schedule("CosineAnnealingLR", lr=lr, T_max=T_max, eta_min=eta_min)
    assert sched(0) == pytest.approx(lr)
    assert sched(T_max) == pytest.approx(eta_min)
    mid = eta_min + (lr - eta_min) * (1 + math.cos(math.pi * 2 / 5)) / 2
    assert sched(2) == pytest.approx(mid)


def test_step_lr():
    sched = build_lr_schedule("stepLR", lr=1.0, step_size=2, gamma=0.1)
    assert sched(0) == 1.0 and sched(1) == 1.0
    assert sched(2) == pytest.approx(0.1)


def test_warmup_multistep():
    sched = build_lr_schedule(
        "WarmupMultiStepLR", lr=1.0, milestones=[10, 20], gamma=0.1,
        warmup_factor=1 / 3, warmup_iters=4,
    )
    assert sched(0) == pytest.approx(1 / 3)
    assert sched(4) == pytest.approx(1.0)
    assert sched(15) == pytest.approx(0.1)


def test_warmup_step_lr():
    sched = build_lr_schedule("WarmupStepLR", lr=1.0, start_epoch=10, step_size=5,
                              step_gamma=0.5, warmup_factor=0.1)
    assert sched(0) == pytest.approx(0.1)
    assert sched(10) == pytest.approx(1.0)
    assert sched(15) == pytest.approx(0.5)


def test_smooth_l1_loss_values():
    import jax.numpy as jnp

    loss = build_loss("WeightSmoothL1Loss", beta=0.1)
    # |d| < beta -> quadratic: 0.5*d^2/beta
    assert float(loss(jnp.array([0.05]), jnp.array([0.0]))) == pytest.approx(0.5 * 0.05**2 / 0.1)
    # |d| >= beta -> linear: |d| - 0.5*beta
    assert float(loss(jnp.array([1.0]), jnp.array([0.0]))) == pytest.approx(1.0 - 0.05)


def test_mse_loss():
    import jax.numpy as jnp

    loss = build_loss("MSELoss")
    assert float(loss(jnp.array([2.0, 0.0]), jnp.array([0.0, 0.0]))) == pytest.approx(2.0)

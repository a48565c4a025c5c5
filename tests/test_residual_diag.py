"""Physics-consistency diagnostics (eval/residuals.py).

The paper's post-training check -- how well does the trained model satisfy the
six primitive equations -- which the reference never shipped as a tool (its
only residual numbers are TensorBoard training-loss curves,
reference interface_physics.py:271-320).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepphysinet_tpu.eval.residuals import (
    EQ_NAMES,
    evaluate_residuals,
    residual_field_maps,
)


@pytest.fixture(scope="module")
def diag_setup(tmp_path_factory):
    from deepphysinet_tpu.data.dataset import PhysicsDataset
    from deepphysinet_tpu.data.synthetic import generate_synthetic_dataset
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.train.train_step import StepConfig
    from tests.test_dataset import OBS_CFG, VARIABLE_CFG
    from tests.test_train_step import FACTORS

    root = str(tmp_path_factory.mktemp("resid_diag"))
    synth = generate_synthetic_dataset(root, n_init_times=1,
                                       bbox=(72.0, 18.0, 88.0, 27.0))
    h, w = synth["img_size"]
    dataset = PhysicsDataset(
        input_path=synth["input_path"], label_path=synth["label_path"],
        input_data_map_cfg={"NCEP": synth["input_map_file"]},
        start_time="2008-01-01_00_00_00", end_time="2008-01-10_00_00_00",
        input_variable_cfg=VARIABLE_CFG, out_variable_cfg=OBS_CFG,
        in_coord_file=synth["in_coord_file"], out_coord_file=synth["out_coord_file"],
        constant_path=synth["constant_path"],
        constant_variables=("landsea", "elevation", "lat", "lon"),
        label_img_size=(h, w), dx=27000.0, dy=27000.0,
        label_batch_size=256, inter_batch_size=64,
        forecast_time_period=24, seed=0,
    )
    specs = norm_specs_from_cfg(OBS_CFG)
    cfg = StepConfig(
        coord_spec=CoordSpec(lon_size=w, lat_size=h, dx=27000.0, dy=27000.0,
                             pred_t_span=86400.0),
        obs_specs=tuple(specs[k] for k in OBS_NAME_ORDER),
        loss_factor=FACTORS,
    )
    sample = dataset[0]
    meta = dict(enc_in=sample["field_data"].shape[-1], c_out=32, d_model=32,
                n_heads=4, e_layers=1, d_ff=32, activation="gelu",
                learnable_token_num=8)
    net = dict(in_channels=192, hidden_channels=32, learnable_token_num=16)
    model = PhysicsNet(meta_cfg=meta, net_cfg=net)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(sample["field_data"][None], jnp.float32),
                        jnp.zeros((4, 192)), jnp.zeros((4, 6)),
                        jnp.asarray([[0.1]]))
    return model, params, cfg, dataset, (h, w)


def test_evaluate_residuals_jvp(diag_setup):
    model, params, cfg, dataset, _ = diag_setup
    out = evaluate_residuals(model, params, cfg, dataset, max_windows=1,
                             use_kernel=False)
    for eq in EQ_NAMES:
        assert np.isfinite(out[f"residual_mse_{eq}"]), eq
        assert out[f"residual_mse_{eq}"] >= 0.0, eq
        assert np.isfinite(out[f"weighted_{eq}"]), eq
    # an untrained model cannot satisfy the physics
    assert out["residual_mse_momentum_u"] > 0.0
    assert out["weighted_total"] == pytest.approx(
        sum(out[f"weighted_{eq}"] for eq in EQ_NAMES), rel=1e-9)
    assert out["n_windows"] == 1.0
    h, w = dataset.label_lat_size, dataset.label_lon_size
    assert out["n_points_per_hour"] == float(h * w)


def test_evaluate_residuals_kernel_matches_jvp(diag_setup):
    """The fused Pallas path (interpret mode off-TPU: the REAL kernels) and
    the analytic-tangent XLA twin measure the same residuals."""
    model, params, cfg, dataset, _ = diag_setup
    ref = evaluate_residuals(model, params, cfg, dataset, max_windows=1,
                             use_kernel=False)
    ker = evaluate_residuals(model, params, cfg, dataset, max_windows=1,
                             use_kernel=True, interpret=True)
    for eq in EQ_NAMES:
        k = f"residual_mse_{eq}"
        assert ker[k] == pytest.approx(ref[k], rel=2e-2), eq


def test_residuals_cli_with_maps(tmp_path):
    """tools/evaluate.py --residuals --save_maps end-to-end: JSON metrics out,
    six per-equation jpg maps rendered."""
    import json
    import os
    import subprocess
    import sys

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.interface.build import builder_models
    from deepphysinet_tpu.train.checkpoint import save_checkpoint

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_file = os.path.join(repo, "configs", "smoke_cpu_cfg.py")
    cfg = Config.fromfile(cfg_file)
    interface = builder_models(**cfg["config"])
    meta = interface.physics_net.meta_cfg
    net = interface.physics_net.net_cfg
    variables = interface.physics_net.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, int(net["token_num"]), int(meta["enc_in"])), jnp.float32),
        jnp.zeros((2, int(net["in_channels"])), jnp.float32),
        jnp.zeros((2, 6), jnp.float32), jnp.asarray([[0.1]], jnp.float32))
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, 0, 1, variables)

    maps_dir = str(tmp_path / "maps")
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "evaluate.py"),
         "--config_file", cfg_file, "--checkpoint", ckpt_dir,
         "--residuals", "--max_windows", "1", "--save_maps", maps_dir],
        capture_output=True, text=True,
        env=dict(os.environ, DPN_PLATFORM="cpu"), cwd=repo, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    metrics = json.loads(res.stdout.strip().splitlines()[-1])
    for eq in EQ_NAMES:
        assert np.isfinite(metrics[f"residual_mse_{eq}"])
        path = os.path.join(maps_dir, f"residual_{eq}.jpg")
        assert os.path.exists(path) and os.path.getsize(path) > 1000, eq


def test_residual_field_maps(diag_setup):
    model, params, cfg, dataset, (h, w) = diag_setup
    maps = residual_field_maps(model, params, cfg, dataset, window=0, hour=0,
                               use_kernel=False)
    assert set(maps) == set(EQ_NAMES)
    for eq, m in maps.items():
        assert m.shape == (h, w), eq
        assert np.all(np.isfinite(m)), eq
        assert np.all(m >= 0.0), eq

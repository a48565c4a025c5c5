"""ProductsUtils against the MODEL path (round-5 VERDICT #8).

The pluggable ``gather_fn`` design was previously proven only against raw
NWP cubes; here the derived products run next to a trained checkpoint's
``predict_grid`` sweep over the same output grid, and the overlapping
surface quantities (t2 vs model T, wd10m vs model wind speed) are compared
in physical units — the workflow docs/DEMO.md documents.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("proddata"))
    os.environ["DPN_SMOKE_DATA"] = root
    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.interface.build import builder_models

    cfg = Config.fromfile(os.path.join(REPO, "configs", "smoke_cpu_cfg.py"))
    models = builder_models(**cfg["config"])
    state = models.run_train_interface(max_steps=10)
    return models, state


def test_products_vs_model_window(trained):
    from deepphysinet_tpu.data.dataset import PhysicsDataset
    from tools.derive_products import products_vs_model

    models, state = trained
    tc = models.train_cfg
    ds = PhysicsDataset(**tc["train_data"], input_variable_cfg=models.variable_cfg,
                        out_variable_cfg=models.obs_norm_cfg,
                        dx=models.dx, dy=models.dy)
    prod, model, stats = products_vs_model(
        models, state.params, ds, ds.input_files[0],
        products=("t2", "wd10m", "rh2"))

    assert set(prod) == {"t2", "wd10m", "rh2"}
    t2 = np.asarray(prod["t2"])
    assert np.isfinite(t2).all() and np.isfinite(model["T"]).all()
    # products derive on the coarse NWP grid; the sweep covers the output grid
    assert model["T"].shape == tuple(models.train_cfg["img_size"])
    assert "t2" in stats["pairs"] and "wd10m" in stats["pairs"]
    # both sides are physical Kelvin fields on the same grid; a barely
    # trained model is biased but both must sit in a plausible band
    assert 150 < stats["pairs"]["t2"]["product_mean"] < 350
    assert 150 < stats["pairs"]["t2"]["model_mean"] < 350
    assert np.isfinite(stats["pairs"]["t2"]["rmse"])
    assert stats["pairs"]["wd10m"]["rmse"] >= 0


def test_cli_vs_model_flag(trained, tmp_path):
    """tools/derive_products.py --vs_model CKPT end-to-end."""
    models, _state = trained
    ckpt_dir = models.train_cfg["checkpoints"]["checkpoints_path"]
    out_dir = str(tmp_path / "products")
    env = dict(os.environ)
    env["DPN_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "derive_products.py"),
         "--config_file", os.path.join(REPO, "configs", "smoke_cpu_cfg.py"),
         "--products", "t2,wd10m", "--times", "1", "--output", out_dir,
         "--vs_model", ckpt_dir],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert "vs_model" in info and "t2" in info["vs_model"]["pairs"]
    assert np.isfinite(info["vs_model"]["pairs"]["t2"]["rmse"])

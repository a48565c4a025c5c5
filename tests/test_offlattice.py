"""Off-lattice generalization evaluator (eval/offlattice.py).

Smoke-level here (CPU, untrained params): correctness of the plumbing --
paired draws, closed-form truth, finite outputs -- plus the key invariant
that the ON-lattice truth equals the labels the dataset actually serves
(the evaluator's truth function and the tree generator must agree).  The
accuracy claim itself (off/on ratio of a trained model) is measured on the
TPU soak and recorded in docs/PERF.md.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepphysinet_tpu.config import Config
from deepphysinet_tpu.data.dataset import PhysicsDataset
from deepphysinet_tpu.eval.offlattice import (
    SYNTH_NAMES, VAR_NAMES, _truth_at, evaluate_offlattice)
from deepphysinet_tpu.interface.build import builder_models


@pytest.fixture(scope="module")
def smoke_setup():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(os.path.join(root, "configs", "smoke_cpu_cfg.py"))
    interface = builder_models(**cfg["config"])
    tc = interface.train_cfg
    interface.dx = float(tc["dx"])
    interface.dy = float(tc["dy"])
    dataset = PhysicsDataset(
        **tc["train_data"], input_variable_cfg=interface.variable_cfg,
        out_variable_cfg=interface.obs_norm_cfg, dx=interface.dx,
        dy=interface.dy)
    window_h = dataset.input_time_step * dataset.input_time_step_nums
    step_cfg = interface._step_cfg(float(window_h * 3600),
                                   dataset.forecast_time_period)
    model = interface.physics_net
    field = np.concatenate(
        [dataset.get_item_input(dataset.input_files[0]),
         dataset.constant_variables], axis=0)[None]
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(field, jnp.float32),
        jnp.zeros((4, model.net_cfg["in_channels"]), jnp.float32),
        jnp.zeros((4, 6), jnp.float32), jnp.asarray([[0.1]], jnp.float32))
    return interface, dataset, step_cfg, params


def test_truth_matches_dataset_labels(smoke_setup):
    """_truth_at at integer lattice/hours == the labels the tree serves
    (physical units): the evaluator scores against the SAME truth the model
    trains on."""
    from deepphysinet_tpu.ops.normalization import norm_specs_from_cfg

    interface, dataset, _, _ = smoke_setup
    input_file = dataset.input_files[0]
    label_cube = np.asarray(dataset.get_label_cube(input_file))  # [6, H, W, T] norm
    _, date_str, forecast_h, _ = dataset._parse_item(input_file)

    import datetime
    init = datetime.datetime.strptime(date_str, "%Y-%m-%d-%H-%M-%S")
    start = datetime.datetime(2008, 1, 1)
    base_hours = (init - start).total_seconds() / 3600.0 + float(forecast_h)

    H, W = dataset.label_lat_size, dataset.label_lon_size
    rng = np.random.RandomState(3)
    xs, ys = rng.randint(0, W, 64), rng.randint(0, H, 64)
    lon = dataset.begin_lon + xs * float(dataset.out_lon[1] - dataset.out_lon[0])
    lat = dataset.begin_lat + ys * float(dataset.out_lat[1] - dataset.out_lat[0])
    t_slot = 5  # in-window hour (label_time_step=1)

    truth = _truth_at(lon, lat, base_hours + t_slot, synth_seed=0)

    specs = norm_specs_from_cfg(interface.obs_norm_cfg)
    # label cube rows follow OBS order (u, v, p, T, q, rho); un-normalize
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER
    for i, obs_key in enumerate(OBS_NAME_ORDER):
        mean, std = specs[obs_key].factors()
        lab_norm = label_cube[i, ys, xs, t_slot]
        lab_phys = lab_norm * std + mean
        np.testing.assert_allclose(lab_phys, truth[:, i], rtol=2e-4, atol=1e-5,
                                   err_msg=obs_key)


def test_evaluator_runs_and_pairs(smoke_setup):
    """Paired metrics present, finite, with equal point counts; untrained
    params give ratios near 1 (both sets equally wrong)."""
    interface, dataset, step_cfg, params = smoke_setup
    out = evaluate_offlattice(
        interface.physics_net, params, step_cfg, dataset,
        n_points=256, times_per_window=2, max_windows=1, seed=1)
    for k in VAR_NAMES:
        assert np.isfinite(out[f"rmse_{k}"]), k
        assert np.isfinite(out[f"rmse_{k}_ongrid"]), k
        assert out[f"ratio_{k}"] > 0
    assert out["n_points"] == 256

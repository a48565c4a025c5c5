"""Inference surfaces: continuous station queries and grid prediction."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepphysinet_tpu.parallel.multihost import process_shard


def test_process_shard_covers_all_items():
    idx = list(process_shard(10))  # single-host: everything
    assert idx == list(range(10))


class TestStationInference:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        import os

        root = str(tmp_path_factory.mktemp("stationdata"))
        os.environ["DPN_SMOKE_DATA"] = root
        import importlib
        from deepphysinet_tpu.config import Config

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = Config.fromfile(os.path.join(here, "configs", "smoke_cpu_cfg.py"))
        from deepphysinet_tpu.interface.build import builder_models

        models = builder_models(**cfg["config"])
        state = models.run_train_interface(max_steps=10)
        return models, state

    def test_predict_points_continuous(self, trained, rng):
        from deepphysinet_tpu.data.dataset import PhysicsDataset
        from deepphysinet_tpu.inference.runner import predict_points

        models, state = trained
        tc = models.train_cfg
        ds = PhysicsDataset(**tc["train_data"], input_variable_cfg=models.variable_cfg,
                            out_variable_cfg=models.obs_norm_cfg,
                            dx=models.dx, dy=models.dy)
        cfg = models._step_cfg(86400.0, ds.forecast_time_period)
        input_file = ds.input_files[0]
        field = np.concatenate([ds.get_item_input(input_file), ds.constant_variables], 0)[None]

        # arbitrary continuous coordinates: off-grid lon/lat, fractional hours
        lon = np.array([75.37, 80.123, 84.9])
        lat = np.array([19.61, 23.456, 26.2])
        t = np.array([2.5, 13.75, 21.1])  # hours, not on the 6h input grid
        out = predict_points(models.physics_net, state.params, cfg, ds, input_file,
                             jnp.asarray(field, jnp.float32), 0.0, lon, lat, t)
        assert out.shape == (3, 6)
        assert np.isfinite(out).all()
        # physical plausibility of the (clipped) outputs
        assert (out[:, 2] > 10000).all() and (out[:, 2] < 500000).all()  # P
        assert (out[:, 3] > 50).all() and (out[:, 3] < 500).all()  # T

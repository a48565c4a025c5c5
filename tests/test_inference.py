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

    def test_chunked_decode_matches_single_batch(self, trained, rng):
        """_decode_points chunking (large queries, inference/runner.py) is
        numerically identical to one whole-batch decode, including the
        edge-padded last chunk."""
        from deepphysinet_tpu.data.dataset import PhysicsDataset
        from deepphysinet_tpu.inference.runner import _decode_points, _jitted_encode

        models, state = trained
        tc = models.train_cfg
        ds = PhysicsDataset(**tc["train_data"], input_variable_cfg=models.variable_cfg,
                            out_variable_cfg=models.obs_norm_cfg,
                            dx=models.dx, dy=models.dy)
        cfg = models._step_cfg(86400.0, ds.forecast_time_period)
        input_file = ds.input_files[0]
        field = np.concatenate([ds.get_item_input(input_file), ds.constant_variables], 0)[None]
        tokens = _jitted_encode(models.physics_net)(
            state.params, jnp.asarray(field, jnp.float32),
            jnp.asarray([[0.0]], jnp.float32))[0]

        n = 53  # not a multiple of the chunk -> exercises last-chunk padding
        x = rng.rand(n).astype(np.float32) * cfg.coord_spec.dx * (cfg.coord_spec.lon_size - 1)
        y = rng.rand(n).astype(np.float32) * cfg.coord_spec.dy * (cfg.coord_spec.lat_size - 1)
        t = rng.rand(n).astype(np.float32) * 86400.0
        nwp = rng.randn(n, 6).astype(np.float32) * 0.1

        whole = _decode_points(models.physics_net, state.params, cfg, tokens,
                               x, y, t, nwp, 0.0, True)
        chunked = _decode_points(models.physics_net, state.params, cfg, tokens,
                                 x, y, t, nwp, 0.0, True, chunk=16)
        # batch shape changes XLA fusion/reduction order -> f32-level noise
        np.testing.assert_allclose(np.asarray(whole), np.asarray(chunked),
                                   rtol=1e-4, atol=1e-3)

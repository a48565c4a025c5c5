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


    def test_small_query_bucket_padding_consistent(self, trained, rng):
        """Distinct small Ns share a compiled bucket (edge-pad + trim,
        inference/runner.py:_DECODE_BUCKETS); shared points are identical."""
        from deepphysinet_tpu.data.dataset import PhysicsDataset
        from deepphysinet_tpu.inference.runner import (_decode_points,
                                                       _jitted_encode)

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

        n = 200
        x = rng.rand(n).astype(np.float32) * cfg.coord_spec.dx * (cfg.coord_spec.lon_size - 1)
        y = rng.rand(n).astype(np.float32) * cfg.coord_spec.dy * (cfg.coord_spec.lat_size - 1)
        t = rng.rand(n).astype(np.float32) * 86400.0
        nwp = rng.randn(n, 6).astype(np.float32) * 0.1
        big = np.asarray(_decode_points(models.physics_net, state.params, cfg,
                                        tokens, x, y, t, nwp, 0.0, True))
        small = np.asarray(_decode_points(models.physics_net, state.params, cfg,
                                          tokens, x[:5], y[:5], t[:5], nwp[:5],
                                          0.0, True))
        assert big.shape == (6, 200) and small.shape == (6, 5)
        # same bucket (256) -> the SAME compiled program; per-point rows are
        # independent, so shared points are bitwise identical
        np.testing.assert_array_equal(small, big[:, :5])

    def test_predict_grid_out_size_resample(self, trained):
        """out_size resamples the field continuously over the same area; the
        training-grid out_size reproduces the default sweep, and the dense
        grid's even-index samples sit on the training lattice."""
        from deepphysinet_tpu.data.dataset import PhysicsDataset
        from deepphysinet_tpu.inference.runner import predict_grid

        models, state = trained
        tc = models.train_cfg
        ds = PhysicsDataset(**tc["train_data"], input_variable_cfg=models.variable_cfg,
                            out_variable_cfg=models.obs_norm_cfg,
                            dx=models.dx, dy=models.dy)
        cfg = models._step_cfg(86400.0, ds.forecast_time_period)
        input_file = ds.input_files[0]
        field = jnp.asarray(np.concatenate(
            [ds.get_item_input(input_file), ds.constant_variables], 0)[None],
            jnp.float32)
        la, lo = cfg.coord_spec.lat_size, cfg.coord_spec.lon_size

        base = predict_grid(models.physics_net, state.params, cfg, ds,
                            input_file, field, 0.0, 3.0)
        same = predict_grid(models.physics_net, state.params, cfg, ds,
                            input_file, field, 0.0, 3.0, out_size=(la, lo))
        dense = predict_grid(models.physics_net, state.params, cfg, ds,
                             input_file, field, 0.0, 3.0,
                             out_size=(2 * la - 1, 2 * lo - 1))
        for k in base:
            np.testing.assert_array_equal(same[k], base[k])
            assert dense[k].shape == (2 * la - 1, 2 * lo - 1)
            assert np.isfinite(dense[k]).all()
            # every-other dense sample sits exactly on the training lattice
            np.testing.assert_allclose(dense[k][::2, ::2], base[k],
                                       rtol=1e-4, atol=1e-3)


def test_predict_points_uses_derived_fine_step(monkeypatch):
    """Station lon/lat -> model-coordinate mapping divides by the dataset's
    DERIVED label-grid spacing (was hardcoded 0.25 deg)."""
    import types

    from deepphysinet_tpu.inference import runner

    class FakeDS:
        begin_lon, begin_lat = 70.0, 10.0
        fine_lon_step, fine_lat_step = 0.5, 0.5
        dx = dy = 10800.0

        def _nwp_cube(self, f):
            return np.zeros((6, 2, 2, 2), np.float32)

        def _interp_cube_at(self, cube, lon, lat, t):
            return np.zeros((len(lon), 6), np.float32)

    captured = {}

    def fake_decode(model, params, cfg, tokens, x, y, t, nwp, fh, clip):
        captured["x"], captured["y"] = np.asarray(x), np.asarray(y)
        return jnp.zeros((6, len(np.asarray(x))), jnp.float32)

    monkeypatch.setattr(runner, "_decode_points", fake_decode)
    monkeypatch.setattr(runner, "_jitted_encode",
                        lambda m: (lambda p, f, fh: jnp.zeros((1, 4, 8))))
    cfg = types.SimpleNamespace(forecast_time_period=360.0)
    runner.predict_points(None, None, cfg, FakeDS(), "f", None, 0.0,
                          np.array([71.0]), np.array([11.0]), np.array([1.0]))
    # (71 - 70) / 0.5 = index 2 -> 2 * dx  (0.25 would give 4 * dx)
    assert captured["x"][0] == 2 * 10800.0
    assert captured["y"][0] == 2 * 10800.0

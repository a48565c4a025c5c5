"""Unit tests for core ops: position encoding, normalization, coords."""

import numpy as np
import jax.numpy as jnp
import pytest

from deepphysinet_tpu.ops.position_encoding import SineCosPE, make_freq_bands, sinecos_pe
from deepphysinet_tpu.ops.normalization import NormSpec, inverse_normalize, normalize, norm_specs_from_cfg
from deepphysinet_tpu.ops.coords import CoordSpec, coriolis, encode_coord, make_latlon_grid


class TestSineCosPE:
    def test_out_dim(self):
        pe = SineCosPE(3, N_freqs=32, include_input=False)
        assert pe.out_dim == 192
        x = jnp.ones((5, 3))
        assert pe(x).shape == (5, 192)

    def test_layout_freq_major_then_fn_then_channel(self):
        """Layout must match the reference's transpose/stack/reshape order
        (utils/position_encoding.py:38-49): [F, {sin,cos}, C] flattened."""
        fb = make_freq_bands(2, max_freq=1.0)  # [1, 2]
        x = np.array([[0.3, 0.7]], dtype=np.float32)
        out = np.asarray(sinecos_pe(jnp.array(x), fb))
        expect = []
        for f in fb:
            for fn in (np.sin, np.cos):
                for c in range(2):
                    expect.append(fn(x[0, c] * f))
        np.testing.assert_allclose(out[0], np.array(expect), rtol=1e-6)

    def test_include_input(self):
        pe = SineCosPE(2, N_freqs=4, include_input=True)
        x = jnp.array([[0.5, -0.5]])
        out = pe(x)
        assert out.shape == (1, 2 + 2 * 2 * 4)
        np.testing.assert_allclose(np.asarray(out[0, :2]), [0.5, -0.5])

    def test_freq_bands_log_spaced(self):
        fb = make_freq_bands(5, max_freq=4.0)
        np.testing.assert_allclose(fb, 2.0 ** np.linspace(0, 4, 5), rtol=1e-6)


class TestNormalization:
    def test_mean_norm_roundtrip(self):
        spec = NormSpec(name="t2", norm_type="mean_norm", norm_factor=(283.5, 15.5))
        x = jnp.array([250.0, 283.5, 310.0])
        n = normalize(x, spec)
        np.testing.assert_allclose(np.asarray(n[1]), 0.0, atol=1e-6)
        back = inverse_normalize(n, spec)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-5)

    def test_min_max_two_factor_roundtrip(self):
        spec = NormSpec(name="x", norm_type="min_max", norm_factor=(10.0, 20.0))
        x = jnp.array([10.0, 15.0, 20.0])
        n = normalize(x, spec)
        np.testing.assert_allclose(np.asarray(n), [0.0, 0.5, 1.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(inverse_normalize(n, spec)), np.asarray(x))

    def test_min_max_three_factor_roundtrip(self):
        """sqrt-compressed min_max (dataset/physics_dataset.py:278-282)."""
        spec = NormSpec(name="x", norm_type="min_max", norm_factor=(1.0, 5.0, 2.0))
        x = jnp.array([3.0, 11.0, 27.0])
        n = normalize(x, spec)
        np.testing.assert_allclose(np.asarray(inverse_normalize(n, spec)), np.asarray(x), rtol=1e-5)

    def test_clip_bounds(self):
        spec = NormSpec(name="t2", norm_factor=(283.5, 15.5), bound=(50.0, 500.0))
        n = jnp.array([-100.0, 100.0])  # wildly out of physical range
        out = inverse_normalize(n, spec, with_clip=True)
        assert float(out[0]) == 50.0 and float(out[1]) == 500.0
        out_noclip = inverse_normalize(n, spec, with_clip=False)
        assert float(out_noclip[0]) < 50.0

    def test_pressure_level_vector_factors(self):
        spec = NormSpec(
            name="GHT",
            norm_factor=((100.0, 700.0), (80.0, 60.0)),
        )
        x = jnp.ones((4, 2)) * jnp.array([180.0, 760.0])
        n = normalize(x, spec)
        np.testing.assert_allclose(np.asarray(n), np.ones((4, 2)), rtol=1e-6)

    def test_specs_from_reference_cfg(self):
        cfg = {
            "pres": dict(name="PSFC", norm_factor=[89741.36, 13296.75],
                         norm_type="mean_norm", bound=[10000, 500000], use_norm=True),
        }
        specs = norm_specs_from_cfg(cfg)
        assert specs["pres"].bound == (10000, 500000)


class TestCoords:
    def test_coriolis(self):
        f = coriolis(jnp.array([0.0, 30.0, 90.0]))
        assert f.shape == (3, 1)
        np.testing.assert_allclose(np.asarray(f[:, 0]),
                                   2 * 7.29e-5 * np.sin(np.deg2rad([0, 30, 90])), rtol=1e-6)

    def test_encode_coord_dims_and_normalization(self):
        spec = CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0, pred_t_span=86400.0)
        x = jnp.array([27000.0 * 256])  # right edge -> normalized 1.0
        y = jnp.array([0.0])
        t = jnp.array([86400.0])
        pe = encode_coord(x, y, t, spec)
        assert pe.shape == (1, 192)
        # first feature = sin(1.0 * first freq band) for x
        np.testing.assert_allclose(float(pe[0, 0]), np.sin(1.0), rtol=1e-6)

    def test_grid_geometry(self):
        lon, lat = make_latlon_grid(step=1.0)
        assert lon.shape == (37, 65)
        lon, lat = make_latlon_grid(step=0.25)
        assert lon.shape == (145, 257)
        assert lon[0, 0] == 72.0 and lat[0, 0] == 18.0
        assert lon[0, -1] == 136.0 and lat[-1, 0] == 54.0

"""Tests for auxiliary components: ProbSparse attention, ResNet backbones,
CoordUtils, windowed raster reads, Mercator transforms."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepphysinet_tpu.data.geotiff import (
    geo2lonlat,
    lonlat2geo,
    read_image,
    write_tiff,
)
from deepphysinet_tpu.models.backbone import build_backbone
from deepphysinet_tpu.models.transformer_net import TransformerNet
from deepphysinet_tpu.ops.attention import attention_xla
from deepphysinet_tpu.ops.prob_attention import prob_attention
from deepphysinet_tpu.utils.coord_utils import CoordUtils


class TestProbAttention:
    def test_shapes_and_finite(self, rng):
        B, L, H, E = 2, 64, 4, 8
        q, k, v = (jnp.asarray(rng.randn(B, L, H, E), jnp.float32) for _ in range(3))
        out = prob_attention(q, k, v, jax.random.PRNGKey(0))
        assert out.shape == (B, L, H, E)
        assert np.isfinite(np.asarray(out)).all()

    def test_top_queries_match_full_attention(self, rng):
        """Selected queries get exact full attention; others get the V mean."""
        B, L, H, E = 1, 40, 2, 8
        q, k, v = (jnp.asarray(rng.randn(B, L, H, E), jnp.float32) for _ in range(3))
        out = np.asarray(prob_attention(q, k, v, jax.random.PRNGKey(1), factor=5))
        full = np.asarray(attention_xla(q, k, v, 1.0 / np.sqrt(E)))
        vmean = np.asarray(jnp.mean(v, axis=1))  # [B, H, E]
        for h in range(H):
            for i in range(L):
                row = out[0, i, h]
                is_full = np.allclose(row, full[0, i, h], atol=1e-5)
                is_mean = np.allclose(row, vmean[0, h], atol=1e-5)
                assert is_full or is_mean

    def test_encoder_with_prob_attention_runs(self, rng):
        enc = TransformerNet(enc_in=33, c_out=16, d_model=16, n_heads=2, e_layers=1,
                             d_ff=16, learnable_token_num=4, attn_type="prob")
        x = jnp.asarray(rng.randn(1, 10, 33), jnp.float32)
        fh = jnp.array([[0.1]])
        params = enc.init(jax.random.PRNGKey(0), x, fh)
        out = enc.apply(params, x, fh)
        assert out.shape == (1, 14, 16)


class TestBackbones:
    def test_resnet18_endpoints(self, rng):
        net = build_backbone("resnet18", out_keys=("C3", "C5"))
        x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(variables, x)
        assert set(out.keys()) == {"C3", "C5"}
        assert out["C3"].shape == (1, 8, 8, 128)
        assert out["C5"].shape == (1, 2, 2, 512)

    def test_resnet50_bottleneck_widths(self, rng):
        net = build_backbone("resnet50", out_keys=("C5",))
        x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(variables, x)
        assert out["C5"].shape[-1] == 2048


class TestCoordUtils:
    def test_geo2xy_roundtrip(self, tmp_path):
        from deepphysinet_tpu.ops.coords import make_latlon_grid, save_coord_pickle

        lon, lat = make_latlon_grid(72, 18, 88, 27, 0.25)
        p = str(tmp_path / "coord.pickle")
        save_coord_pickle(p, lon, lat)
        cu = CoordUtils(p)
        x, y = cu.geo2xy(np.array([72.0, 80.0, 88.0]), np.array([18.0, 22.5, 27.0]))
        np.testing.assert_allclose(x, [0, 32, 64], atol=1e-9)
        np.testing.assert_allclose(y, [0, 18, 36], atol=1e-9)
        lon2, lat2 = cu.xy2geo(x, y, (lat.shape[0], lon.shape[1]))
        np.testing.assert_allclose(lon2, [72, 80, 88], atol=1e-9)
        np.testing.assert_allclose(lat2, [18, 22.5, 27], atol=1e-9)


class TestRasterExtras:
    def test_windowed_read_with_padding(self, tmp_path, rng):
        img = rng.randn(10, 12, 2).astype(np.float32)
        p = str(tmp_path / "w.tiff")
        write_tiff(p, img)
        # window overhanging the edge -> zero-padded to requested size
        out = read_image(p, 8, 6, 8, 8, as_rgb=False, normalize=False,
                         data_format="NUMPY_FORMAT")
        assert out.shape == (8, 8, 2)
        np.testing.assert_allclose(out[:4, :4], img[6:10, 8:12], rtol=1e-6)
        assert (out[4:] == 0).all() and (out[:, 4:] == 0).all()

    def test_band_selection(self, tmp_path, rng):
        img = rng.randn(5, 6, 3).astype(np.float32)
        p = str(tmp_path / "b.tiff")
        write_tiff(p, img)
        out = read_image(p, 0, 0, 6, 5, as_rgb=False, normalize=False,
                         data_format="GDAL_FORMAT", band_idx=[2])
        assert out.shape == (1, 5, 6)
        np.testing.assert_allclose(out[0], img[:, :, 1], rtol=1e-6)

    def test_mercator_roundtrip(self):
        lon, lat = 110.0, 30.0
        x, y = lonlat2geo(lon, lat)
        lon2, lat2 = geo2lonlat(x, y)
        np.testing.assert_allclose([lon2, lat2], [lon, lat], rtol=1e-12)
        # known value: lon 180 -> ~20037508 m
        x180, _ = lonlat2geo(180.0, 0.0)
        np.testing.assert_allclose(x180, 20037508.34, rtol=1e-6)

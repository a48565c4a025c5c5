"""Visualization smoke tests (matplotlib Agg backend)."""

import os

import numpy as np

from deepphysinet_tpu.ops.coords import make_latlon_grid, save_coord_pickle
from deepphysinet_tpu.utils.vis import VisUtils, build_project


def test_render_with_coord_grid(tmp_path, rng):
    lon, lat = make_latlon_grid(72, 18, 88, 27, 0.25)
    cf = str(tmp_path / "coord.pickle")
    save_coord_pickle(cf, lon, lat)
    vis = VisUtils(coord_file=cf, project_dict={"name": "LatLon"})
    field = (285 + 8 * np.sin(lon / 5) * np.cos(lat / 3)).astype(np.float32)
    out = str(tmp_path / "t2.jpg")
    vis.forward(field, out, title="T2 test")
    assert os.path.exists(out) and os.path.getsize(out) > 2000


def test_render_without_coords(tmp_path, rng):
    vis = VisUtils()
    out = str(tmp_path / "raw.jpg")
    vis.forward(rng.randn(20, 30).astype(np.float32), out)
    assert os.path.exists(out)


def test_mercator_projection_monotone():
    proj = build_project("Mercator", stand_lon=110.0)
    x1, y1 = proj.to_xy(np.array([100.0]), np.array([20.0]))
    x2, y2 = proj.to_xy(np.array([120.0]), np.array([40.0]))
    assert x2 > x1 and y2 > y1


def test_coastline_overlay_from_landsea(tmp_path, rng):
    """A landsea raster adds its 0.5-contour to the render (reference
    drawcoastlines parity, downscale_utils.py:60-63)."""
    from deepphysinet_tpu.data.geotiff import write_tiff
    from deepphysinet_tpu.utils.vis import VisUtils

    # coarse land/sea mask: land in the lower-left quadrant
    ls = np.zeros((10, 17), np.float32)
    ls[:5, :8] = 1.0
    ls_file = str(tmp_path / "landsea.tiff")
    write_tiff(ls_file, ls)

    data = rng.randn(37, 65).astype(np.float32)
    plain, coast = str(tmp_path / "plain.jpg"), str(tmp_path / "coast.jpg")
    VisUtils(coord_file=None).forward(data, plain)
    VisUtils(coord_file=None, landsea_file=ls_file).forward(data, coast)
    assert os.path.exists(coast)
    with open(plain, "rb") as a, open(coast, "rb") as b:
        assert a.read() != b.read()  # the contour changed the render

    # a flat raster (all sea) must not break rendering
    flat_file = str(tmp_path / "flat.tiff")
    write_tiff(flat_file, np.zeros((10, 17), np.float32))
    VisUtils(coord_file=None, landsea_file=flat_file).forward(
        data, str(tmp_path / "flat.jpg"))

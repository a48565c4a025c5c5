"""CRS transforms (data/crs.py): independent-truth property tests.

No pyproj in this environment, so correctness is pinned three ways:
published exact constants (Web-Mercator bounds), independently integrated
ellipsoidal geodesy (meridian/parallel arc lengths via scipy.quad -- a
different algorithm family than the projection series), and exact
round-trips.
"""

import numpy as np
import pytest
from scipy.integrate import quad

from deepphysinet_tpu.data.crs import (
    LambertConformalConic, geo2lonlat, lonlat2geo, transform)

A = 6378137.0
F = 1 / 298.257223563
E2 = F * (2 - F)


def meridian_arc(lat_deg: float) -> float:
    """Ellipsoidal meridian arc length from the equator, by quadrature."""
    integrand = lambda p: A * (1 - E2) / (1 - E2 * np.sin(p) ** 2) ** 1.5
    return quad(integrand, 0.0, np.deg2rad(lat_deg), epsabs=1e-6)[0]


def parallel_radius(lat_deg: float) -> float:
    """Radius of the circle of latitude on the ellipsoid."""
    p = np.deg2rad(lat_deg)
    return A * np.cos(p) / np.sqrt(1 - E2 * np.sin(p) ** 2)


class TestWebMercator:
    def test_published_bounds(self):
        x, _ = lonlat2geo(180.0, 0.0, 3857)
        assert x == pytest.approx(20037508.342789244, abs=1e-6)
        _, y = lonlat2geo(0.0, 85.05112877980659, 3857)
        assert y == pytest.approx(20037508.342789244, rel=1e-9)

    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        lon = rng.uniform(-179, 179, 100)
        lat = rng.uniform(-84, 84, 100)
        x, y = lonlat2geo(lon, lat, "EPSG:3857")
        lon2, lat2 = geo2lonlat(x, y, 3857)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_matches_geotiff_module(self):
        from deepphysinet_tpu.data import geotiff

        lon, lat = np.array([116.4, -70.0]), np.array([39.9, -33.0])
        np.testing.assert_allclose(geotiff.lonlat2geo(lon, lat),
                                   lonlat2geo(lon, lat, 3857), rtol=1e-12)


class TestUTM:
    def test_central_meridian_equator(self):
        # zone 31N central meridian is 3E: equator point maps to the false
        # easting exactly, northing 0
        x, y = lonlat2geo(3.0, 0.0, 32631)
        assert x == pytest.approx(500000.0, abs=1e-6)
        assert y == pytest.approx(0.0, abs=1e-6)

    @pytest.mark.parametrize("lat", [15.0, 45.0, 70.0])
    def test_central_meridian_scale(self, lat):
        # on the central meridian, northing = k0 * meridian arc (independent
        # quadrature truth); the Krueger series must agree to < 1 mm
        _, y = lonlat2geo(3.0, lat, 32631)
        assert y == pytest.approx(0.9996 * meridian_arc(lat), abs=1e-3)

    def test_south_zone_false_northing(self):
        _, y = lonlat2geo(3.0, -30.0, 32731)
        assert y == pytest.approx(1e7 - 0.9996 * meridian_arc(30.0), abs=1e-3)

    def test_roundtrip_across_zone(self):
        rng = np.random.RandomState(1)
        lon = rng.uniform(0.5, 5.5, 200)  # zone 31 validity
        lat = rng.uniform(-79, 83, 200)
        x, y = lonlat2geo(lon, lat, 32631)
        lon2, lat2 = geo2lonlat(x, y, 32631)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_known_point_cn_tower(self):
        # widely published UTM reference (Wikipedia UTM article): CN Tower,
        # 43 38'33.24"N 79 23'13.7"W -> zone 17N (630084, 4833438); the
        # series is mm-accurate, the anchor is published at ~1 m precision
        x, y = lonlat2geo(-79.387139, 43.642567, 32617)
        assert x == pytest.approx(630084, abs=2.0)
        assert y == pytest.approx(4833438, abs=2.0)


class TestLCC:
    # the CONUS HRRR/NAM-style projection
    P = LambertConformalConic(lat_1=38.5, lat_2=38.5, lat_0=38.5, lon_0=-97.5)
    P2 = LambertConformalConic(lat_1=30.0, lat_2=60.0, lat_0=40.0, lon_0=-97.0)

    @pytest.mark.parametrize("proj", [P, P2])
    def test_roundtrip(self, proj):
        rng = np.random.RandomState(2)
        lon = rng.uniform(-130, -60, 200)
        lat = rng.uniform(20, 55, 200)
        x, y = proj.forward(lon, lat)
        lon2, lat2 = proj.inverse(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    @pytest.mark.parametrize("proj,lat_sp", [(P, 38.5), (P2, 30.0), (P2, 60.0)])
    def test_true_scale_at_standard_parallel(self, proj, lat_sp):
        # conformal conic is TRUE along its standard parallels: projected arc
        # between two meridians at lat_sp == ellipsoidal parallel arc
        dlon = 2.0
        x1, y1 = proj.forward(proj.lon_0, lat_sp)
        x2, y2 = proj.forward(proj.lon_0 + dlon, lat_sp)
        # chord vs arc: use many segments for the projected length
        lons = np.linspace(proj.lon_0, proj.lon_0 + dlon, 2001)
        xs, ys = proj.forward(lons, np.full_like(lons, lat_sp))
        proj_len = np.hypot(np.diff(xs), np.diff(ys)).sum()
        true_len = parallel_radius(lat_sp) * np.deg2rad(dlon)
        assert proj_len == pytest.approx(true_len, rel=1e-7)

    def test_origin_maps_to_false_origin(self):
        x, y = self.P2.forward(self.P2.lon_0, self.P2.lat_0)
        assert x == pytest.approx(0.0, abs=1e-6)
        assert y == pytest.approx(0.0, abs=1e-6)

    def test_north_is_up(self):
        _, y1 = self.P2.forward(-97.0, 40.0)
        _, y2 = self.P2.forward(-97.0, 45.0)
        assert y2 > y1

    def test_transform_dispatch(self):
        inv, fwd = transform(self.P2)
        x, y = fwd(-100.0, 35.0)
        lon, lat = inv(x, y)
        assert lon == pytest.approx(-100.0, abs=1e-9)
        assert lat == pytest.approx(35.0, abs=1e-9)


def test_unknown_crs_raises():
    with pytest.raises(ValueError, match="unsupported"):
        transform(27700)  # OSGB needs its own ellipsoid -- not claimed

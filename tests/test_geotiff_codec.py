"""GeoTIFF codec: compressed/tiled/predictor layouts + CRS, incl. PIL interop.

The reference's ETL tools emit TILED=TRUE COMPRESS=DEFLATE rasters
(tools/extract_variable_from_nc.py:34); these tests pin down that such files
round-trip through data/geotiff.py, and cross-check the codec against
Pillow's independent TIFF implementation in both directions.
"""

import numpy as np
import pytest

from deepphysinet_tpu.data.geotiff import (
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    get_projection,
    read_tiff,
    read_tiff_meta,
    save_full_image,
    write_tiff,
)

GEO = (100.0, 0.25, 0.0, 60.0, 0.0, -0.25)


def _img(rng, h=70, w=53, c=3, dtype=np.float32):
    if np.issubdtype(dtype, np.floating):
        return (rng.randn(h, w, c) * 100).astype(dtype)
    return rng.randint(0, 200, (h, w, c)).astype(dtype)


@pytest.mark.parametrize("compression", ["none", "deflate", "lzw", "packbits"])
@pytest.mark.parametrize("tiled", [False, True])
def test_roundtrip_compressions(tmp_path, rng, compression, tiled):
    img = _img(rng)
    p = str(tmp_path / f"{compression}_{tiled}.tiff")
    write_tiff(p, img, GEO, projection=4326, compression=compression,
               tiled=tiled, tile_size=32)
    got, geo, proj = read_tiff_meta(p)
    np.testing.assert_array_equal(got, img)
    np.testing.assert_allclose(geo, GEO)
    assert proj == "EPSG:4326"


@pytest.mark.parametrize("tiled", [False, True])
def test_roundtrip_int_predictor(tmp_path, rng, tiled):
    img = rng.randint(-500, 500, (41, 37, 2)).astype(np.int16)
    p = str(tmp_path / "pred2.tiff")
    write_tiff(p, img, GEO, compression="deflate", predictor=2,
               tiled=tiled, tile_size=16)
    got, _ = read_tiff(p)
    np.testing.assert_array_equal(got, img)


@pytest.mark.parametrize("tiled", [False, True])
def test_roundtrip_float_predictor(tmp_path, rng, tiled):
    img = _img(rng, 33, 45, 1)
    p = str(tmp_path / "pred3.tiff")
    write_tiff(p, img, GEO, compression="deflate", predictor=3,
               tiled=tiled, tile_size=16)
    got, _ = read_tiff(p)
    np.testing.assert_array_equal(got, img)


def test_lzw_codec_raw():
    data = b"TOBEORNOTTOBEORTOBEORNOT" * 50 + bytes(range(256)) * 3
    assert _lzw_decode(_lzw_encode(data)) == data


def test_packbits_codec_raw():
    data = b"\x00" * 300 + b"varied-data-here" + b"\xff" * 5 + b"x"
    assert _packbits_decode(_packbits_encode(data)) == data


def test_pil_reads_our_tiled_deflate(tmp_path, rng):
    """Pillow (independent libtiff-family implementation) must decode ours."""
    from PIL import Image

    img = _img(rng, 80, 64, 1)
    p = str(tmp_path / "ours.tiff")
    write_tiff(p, img, GEO, compression="deflate", tiled=True, tile_size=32)
    with Image.open(p) as im:
        got = np.asarray(im)
    np.testing.assert_array_equal(got, img[:, :, 0])


def test_pil_reads_our_lzw_strips(tmp_path, rng):
    from PIL import Image

    img = (rng.rand(40, 50) * 255).astype(np.uint8)
    p = str(tmp_path / "ours_lzw.tiff")
    write_tiff(p, img, compression="lzw")
    with Image.open(p) as im:
        got = np.asarray(im)
    np.testing.assert_array_equal(got, img)


@pytest.mark.parametrize("pil_comp", ["tiff_adobe_deflate", "tiff_lzw", "packbits"])
def test_we_read_pil_compressed(tmp_path, rng, pil_comp):
    """Decode TIFFs produced by Pillow's encoders (deflate / LZW / packbits)."""
    from PIL import Image

    arr = (rng.rand(45, 61) * 255).astype(np.uint8)
    p = str(tmp_path / f"pil_{pil_comp}.tiff")
    Image.fromarray(arr).save(p, compression=pil_comp)
    got, _ = read_tiff(p)
    np.testing.assert_array_equal(got[:, :, 0], arr)


def test_we_read_pil_float_deflate(tmp_path, rng):
    from PIL import Image

    arr = (rng.randn(30, 40) * 50).astype(np.float32)
    p = str(tmp_path / "pil_f32.tiff")
    Image.fromarray(arr, mode="F").save(p, compression="tiff_adobe_deflate")
    got, _ = read_tiff(p)
    np.testing.assert_array_equal(got[:, :, 0], arr)


def test_projection_from_wkt(tmp_path, rng):
    wkt = ('GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
           '298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
           'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],'
           'AUTHORITY["EPSG","4326"]]')
    p = str(tmp_path / "wkt.tiff")
    save_full_image(p, _img(rng, 8, 8, 1), geo_transform=GEO, projection=wkt)
    assert get_projection(p) == "EPSG:4326"


def test_projected_crs_geokey(tmp_path, rng):
    p = str(tmp_path / "merc.tiff")
    write_tiff(p, _img(rng, 8, 8, 1), GEO, projection="EPSG:3857")
    assert get_projection(p) == "EPSG:3857"


def test_reference_format_ingest_path(tmp_path, rng):
    """A reference-tool-formatted raster (tiled DEFLATE f32 multiband) feeds
    the windowed-read path used by the dataset."""
    from deepphysinet_tpu.data.geotiff import read_full_image, read_image

    img = _img(rng, 145, 257, 4)
    p = str(tmp_path / "ref_format.tiff")
    save_full_image(p, img, geo_transform=GEO, projection="EPSG:4326",
                    compression="deflate", tiled=True)
    full = read_full_image(p, data_format="NUMPY_FORMAT")
    np.testing.assert_array_equal(full, img)
    win = read_image(p, 10, 20, 64, 32, as_rgb=False, normalize=False,
                     data_format="NUMPY_FORMAT")
    np.testing.assert_array_equal(win, img[20:52, 10:74])


def test_native_lzw_decoder_matches_python(rng):
    """C++ dpn_lzw_decode == the pure-Python reference decoder."""
    from deepphysinet_tpu import native

    if not native.available():
        pytest.skip("no C++ toolchain")
    for blob in (
        b"TOBEORNOTTOBEORTOBEORNOT" * 80,
        bytes(range(256)) * 20,  # forces 9->10->11 bit widths
        (rng.rand(40000) * 255).astype(np.uint8).tobytes(),  # incompressible
        b"\x00" * 5000,
    ):
        enc = _lzw_encode(blob)
        got = native.lzw_decode(enc, len(blob))
        assert got == blob == _lzw_decode(enc)
    # corrupt stream -> graceful None (python raises; caller falls back)
    assert native.lzw_decode(b"\xff\xff\xff\xff\xff\xff", 64) is None


def test_lzw_eoi_width_boundary_fuzz(rng):
    """Regression: EOI must be emitted at the width the decoder reads it at
    (decoder's table is one entry ahead after the final data code).  Fuzz
    across sizes that land the table on early-change boundaries, through
    both the Python and native decoders."""
    from deepphysinet_tpu import native

    for trial in range(300):
        n = int(rng.randint(200, 9000))
        data = rng.randint(0, 256, n).astype(np.uint8).tobytes()
        enc = _lzw_encode(data)
        assert _lzw_decode(enc) == data, f"python decoder, trial {trial} n={n}"
        if native.available():
            assert native.lzw_decode(enc, n) == data, f"native, trial {trial} n={n}"


def test_epsg_classification():
    from deepphysinet_tpu.data.geotiff import _is_geographic_epsg

    assert _is_geographic_epsg(4326)  # WGS84
    assert _is_geographic_epsg(4490)  # CGCS2000
    assert _is_geographic_epsg(6318)  # NAD83(2011)
    assert _is_geographic_epsg(7844)  # GDA2020
    assert not _is_geographic_epsg(4087)  # World Equidistant Cylindrical
    assert not _is_geographic_epsg(3857)  # Web Mercator
    assert not _is_geographic_epsg(32650)  # UTM 50N


def test_metadata_accessors_no_pixel_decode(tmp_path, rng, monkeypatch):
    """get_projection/get_geo_transform/get_image_shape parse tags only."""
    import deepphysinet_tpu.data.geotiff as gt

    img = _img(rng, 30, 40, 2)
    p = str(tmp_path / "meta.tiff")
    write_tiff(p, img, GEO, projection=4326, compression="deflate", tiled=True,
               tile_size=16)
    monkeypatch.setattr(gt, "_segment_to_values",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("pixel decode on metadata query")))
    assert gt.get_projection(p) == "EPSG:4326"
    np.testing.assert_allclose(gt.get_geo_transform(p), GEO)
    assert gt.get_image_shape(p) == (30, 40, 2)


def test_planar_config_2_read(tmp_path, rng):
    """Hand-crafted PlanarConfiguration=2 (separate planes) TIFF reads back
    band-interleaved -- no writer in the repo emits this layout, so the
    reader branch needs its own fixture."""
    import struct
    import zlib

    h, w, c = 9, 11, 3
    img = (rng.rand(h, w, c) * 1000).astype(np.float32)
    planes = [zlib.compress(np.ascontiguousarray(img[:, :, k]).tobytes())
              for k in range(c)]

    tags = []  # (tag, type, count, inline_value or bytes)
    def short(t, v): tags.append((t, 3, 1, v))
    short(256, w); short(257, h)
    tags.append((258, 3, c, struct.pack("<3H", 32, 32, 32)))
    short(259, 8)  # deflate
    short(262, 1)
    short(277, c)
    short(278, h)  # one strip per plane
    short(284, 2)  # PLANAR
    tags.append((339, 3, c, struct.pack("<3H", 3, 3, 3)))
    counts = [len(p) for p in planes]
    tags.append((279, 4, c, struct.pack("<3I", *counts)))
    tags.append((273, 4, c, b"\0" * 12))  # patched below
    tags.sort()

    ifd_size = 2 + len(tags) * 12 + 4
    extra, extra_off = b"", {}
    for t, ty, n, v in tags:
        if isinstance(v, bytes) and len(v) > 4:
            extra_off[t] = 8 + ifd_size + len(extra)
            extra += v
    data_off = 8 + ifd_size + len(extra)
    offs = []
    cur = data_off
    for p in planes:
        offs.append(cur)
        cur += len(p)
    patched = struct.pack("<3I", *offs)
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", len(tags))
    for t, ty, n, v in tags:
        if t == 273:
            out += struct.pack("<HHII", t, ty, n, extra_off[t])
            extra = extra[: extra_off[t] - 8 - ifd_size] + patched + \
                extra[extra_off[t] - 8 - ifd_size + 12:]
        elif isinstance(v, bytes):
            if len(v) > 4:
                out += struct.pack("<HHII", t, ty, n, extra_off[t])
            else:
                out += struct.pack("<HHI", t, ty, n) + v.ljust(4, b"\0")
        else:
            out += struct.pack("<HHIHH", t, ty, n, v, 0)
    out += struct.pack("<I", 0)
    out += extra
    for p in planes:
        out += p
    path = str(tmp_path / "planar2.tiff")
    with open(path, "wb") as fp:
        fp.write(bytes(out))

    got, _ = read_tiff(path)
    np.testing.assert_array_equal(got, img)

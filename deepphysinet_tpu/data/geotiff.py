"""Self-contained GeoTIFF reader/writer (no GDAL dependency).

The reference's raster IO goes through GDAL (utils/gdal_utils.py:90-227:
``read_full_image`` / ``save_full_image`` with multiband float rasters and
geo-transform metadata).  GDAL is not available in this environment, so this
module implements the subset of TIFF 6.0 + GeoTIFF the framework needs in pure
numpy: uncompressed striped baseline TIFFs, 1..N samples/pixel, uint8 / int16 /
int32 / float32 / float64, contiguous or planar layout, little or big endian,
plus the ModelPixelScale/ModelTiepoint tags carrying the affine geo-transform.

API mirrors gdal_utils so call sites translate one-to-one:
  read_full_image(path, data_format='NUMPY_FORMAT') -> [H, W, C]  (or [C, H, W])
  save_full_image(path, img, geo_transform=...)
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np

# TIFF tag ids
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284
_SAMPLE_FORMAT = 339
_MODEL_PIXEL_SCALE = 33550  # GeoTIFF
_MODEL_TIEPOINT = 33922  # GeoTIFF

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8, 16: 8, 17: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 11: "f", 12: "d", 16: "Q", 17: "q"}


def _dtype_from(bits: int, sample_format: int) -> np.dtype:
    if sample_format == 3:  # IEEE float
        return np.dtype({32: np.float32, 64: np.float64}[bits])
    if sample_format == 2:  # signed int
        return np.dtype({8: np.int8, 16: np.int16, 32: np.int32}[bits])
    return np.dtype({8: np.uint8, 16: np.uint16, 32: np.uint32}[bits])


def _read_ifd_entries(buf: bytes, offset: int, bo: str):
    (count,) = struct.unpack_from(bo + "H", buf, offset)
    entries = {}
    for i in range(count):
        tag, typ, n = struct.unpack_from(bo + "HHI", buf, offset + 2 + i * 12)
        value_off = offset + 2 + i * 12 + 8
        size = _TYPE_SIZES.get(typ, 1) * n
        if size > 4:
            (ptr,) = struct.unpack_from(bo + "I", buf, value_off)
            data_off = ptr
        else:
            data_off = value_off
        if typ == 5:  # RATIONAL
            vals = []
            for k in range(n):
                num, den = struct.unpack_from(bo + "II", buf, data_off + 8 * k)
                vals.append(num / den if den else 0.0)
        else:
            fmt = _TYPE_FMT.get(typ)
            if fmt is None:
                continue
            vals = list(struct.unpack_from(bo + fmt * n, buf, data_off))
        entries[tag] = vals
    (next_ifd,) = struct.unpack_from(bo + "I", buf, offset + 2 + count * 12)
    return entries, next_ifd


def read_tiff(path: str) -> Tuple[np.ndarray, Optional[Tuple[float, ...]]]:
    """Read a TIFF -> ([H, W, C] array, geo_transform or None).

    geo_transform is GDAL-ordered: (x0, dx, 0, y0, 0, dy).
    """
    with open(path, "rb") as fp:
        buf = fp.read()
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError(f"{path}: not a TIFF file")
    magic, first_ifd = struct.unpack_from(bo + "HI", buf, 2)
    if magic != 42:
        raise ValueError(f"{path}: bad TIFF magic {magic}")
    tags, _ = _read_ifd_entries(buf, first_ifd, bo)

    width = tags[_IMAGE_WIDTH][0]
    height = tags[_IMAGE_LENGTH][0]
    spp = tags.get(_SAMPLES_PER_PIXEL, [1])[0]
    bits = tags.get(_BITS_PER_SAMPLE, [8])[0]
    comp = tags.get(_COMPRESSION, [1])[0]
    if comp != 1:
        raise NotImplementedError(f"{path}: compressed TIFF (compression={comp}) not supported")
    sample_format = tags.get(_SAMPLE_FORMAT, [1])[0]
    planar = tags.get(_PLANAR_CONFIG, [1])[0]
    offsets = tags[_STRIP_OFFSETS]
    counts = tags[_STRIP_BYTE_COUNTS]

    dtype = _dtype_from(bits, sample_format).newbyteorder(bo)
    raw = b"".join(buf[o : o + c] for o, c in zip(offsets, counts))
    data = np.frombuffer(raw, dtype=dtype)
    if planar == 2:  # separate planes
        img = data[: height * width * spp].reshape(spp, height, width)
        img = np.moveaxis(img, 0, -1)
    else:
        img = data[: height * width * spp].reshape(height, width, spp)

    geo = None
    if _MODEL_PIXEL_SCALE in tags and _MODEL_TIEPOINT in tags:
        sx, sy = tags[_MODEL_PIXEL_SCALE][0], tags[_MODEL_PIXEL_SCALE][1]
        tie = tags[_MODEL_TIEPOINT]
        # tiepoint: (i, j, k, x, y, z) for raster (i, j)
        x0 = tie[3] - tie[0] * sx
        y0 = tie[4] + tie[1] * sy
        geo = (x0, sx, 0.0, y0, 0.0, -sy)
    return np.ascontiguousarray(img.astype(img.dtype.newbyteorder("="))), geo


def write_tiff(
    path: str,
    img: np.ndarray,
    geo_transform: Optional[Tuple[float, ...]] = None,
) -> None:
    """Write [H, W], [H, W, C] or [C, H, W] as an uncompressed striped TIFF."""
    if img.ndim == 2:
        img = img[:, :, None]
    elif img.ndim == 3 and img.shape[0] < min(img.shape[1], img.shape[2]):
        img = np.moveaxis(img, 0, -1)  # [C, H, W] -> [H, W, C]
    h, w, c = img.shape
    img = np.ascontiguousarray(img)

    dt = img.dtype
    if dt == np.float64:
        bits, sf = 64, 3
    elif dt == np.float32:
        bits, sf = 32, 3
    elif dt == np.int32:
        bits, sf = 32, 2
    elif dt == np.int16:
        bits, sf = 16, 2
    elif dt == np.uint8:
        bits, sf = 8, 1
    else:
        img = img.astype(np.float32)
        dt, bits, sf = np.dtype(np.float32), 32, 3

    pixel_data = img.astype(dt.newbyteorder("<")).tobytes()

    tags = []  # (tag, type, count, value-or-bytes)

    def short(tag, v):
        tags.append((tag, 3, 1, v))

    def long(tag, v):
        tags.append((tag, 4, 1, v))

    short(_IMAGE_WIDTH, w)
    short(_IMAGE_LENGTH, h)
    shorts = struct.pack("<" + "H" * c, *([bits] * c))
    tags.append((_BITS_PER_SAMPLE, 3, c, shorts))
    short(_COMPRESSION, 1)
    short(_PHOTOMETRIC, 1)  # BlackIsZero
    short(_SAMPLES_PER_PIXEL, c)
    short(_ROWS_PER_STRIP, h)  # single strip
    long(_STRIP_BYTE_COUNTS, len(pixel_data))
    short(_PLANAR_CONFIG, 1)
    sfs = struct.pack("<" + "H" * c, *([sf] * c))
    tags.append((_SAMPLE_FORMAT, 3, c, sfs))
    if geo_transform is not None:
        x0, dx, _, y0, _, dy = geo_transform
        scale = struct.pack("<3d", abs(dx), abs(dy), 0.0)
        tie = struct.pack("<6d", 0.0, 0.0, 0.0, x0, y0, 0.0)
        tags.append((_MODEL_PIXEL_SCALE, 12, 3, scale))
        tags.append((_MODEL_TIEPOINT, 12, 6, tie))
    long(_STRIP_OFFSETS, 0)  # patched below

    tags.sort(key=lambda t: t[0])
    n = len(tags)
    header_size = 8
    ifd_size = 2 + n * 12 + 4
    # out-of-line data area after IFD
    extra = b""
    extra_offsets = {}
    cursor = header_size + ifd_size
    for tag, typ, count, val in tags:
        if isinstance(val, bytes) and len(val) > 4:
            extra_offsets[tag] = cursor + len(extra)
            extra += val
    data_offset = header_size + ifd_size + len(extra)

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, header_size)
    out += struct.pack("<H", n)
    for tag, typ, count, val in tags:
        if tag == _STRIP_OFFSETS:
            out += struct.pack("<HHII", tag, 4, 1, data_offset)
        elif isinstance(val, bytes):
            if len(val) > 4:
                out += struct.pack("<HHII", tag, typ, count, extra_offsets[tag])
            else:
                out += struct.pack("<HHI", tag, typ, count) + val.ljust(4, b"\0")
        else:
            if typ == 3:
                out += struct.pack("<HHIHH", tag, typ, count, val, 0)
            else:
                out += struct.pack("<HHII", tag, typ, count, val)
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    out += pixel_data
    with open(path, "wb") as fp:
        fp.write(out)


# ---- gdal_utils-compatible surface (utils/gdal_utils.py:90-227) ----

def read_full_image(
    img_file: str,
    scale_factor: float = 1.0,
    as_rgb: bool = False,
    data_format: str = "GDAL_FORMAT",
    normalize: bool = False,
) -> np.ndarray:
    """Read a raster; GDAL_FORMAT -> [C, H, W], NUMPY_FORMAT -> [H, W, C]."""
    img, _ = read_tiff(img_file)  # [H, W, C]
    if normalize:
        lo, hi = img.min(), img.max()
        img = (img - lo) / (hi - lo + 1e-12) * 255.0
    if as_rgb and img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    if data_format == "NUMPY_FORMAT":
        return img
    return np.moveaxis(img, -1, 0)


def save_full_image(
    img_file: str,
    img: np.ndarray,
    data_format: str = "NUMPY_FORMAT",
    geo_transform: Optional[Tuple[float, ...]] = None,
    projection=None,  # accepted for signature parity; CRS strings are not stored
) -> None:
    if data_format == "GDAL_FORMAT" and img.ndim == 3:
        img = np.moveaxis(img, 0, -1)
    write_tiff(img_file, np.asarray(img), geo_transform)


def get_geo_transform(img_file: str):
    _, geo = read_tiff(img_file)
    return geo


# gdal_utils naming parity (utils/gdal_utils.py:229)
def get_geoTransform(img_file: str):  # noqa: N802
    return get_geo_transform(img_file)


def get_image_shape(img_file: str) -> Tuple[int, int, int]:
    """(height, width, bands), matching gdal_utils.get_image_shape usage."""
    img, _ = read_tiff(img_file)
    return img.shape[0], img.shape[1], img.shape[2]


def read_image(
    img_path: str,
    width_offset: int,
    height_offset: int,
    width: int,
    height: int,
    scale_factor: float = 1,
    as_rgb: bool = True,
    data_format: str = "GDAL_FORMAT",
    normalize: bool = True,
    normalize_factor=16,
    band_idx=None,
) -> np.ndarray:
    """Windowed read with zero-padding past the raster edge
    (utils/gdal_utils.py:150-227).  ``scale_factor`` decimates by striding
    (nearest), which is what GDAL's ReadAsArray resampling amounts to for the
    integer factors the reference uses.
    """
    if data_format not in ("GDAL_FORMAT", "NUMPY_FORMAT"):
        raise ValueError("data_format must be GDAL_FORMAT or NUMPY_FORMAT")
    full, _ = read_tiff(img_path)  # [H, W, C]
    im_h, im_w, im_bands = full.shape
    if band_idx is not None:
        full = full[:, :, [i - 1 for i in band_idx]]  # GDAL bands are 1-based
        im_bands = full.shape[-1]

    block_w = min(width, im_w - width_offset)
    block_h = min(height, im_h - height_offset)
    block = full[height_offset : height_offset + block_h,
                 width_offset : width_offset + block_w].astype(np.float64)
    if scale_factor != 1:
        stride = int(scale_factor)
        block = block[::stride, ::stride]
    out = np.moveaxis(block, -1, 0)  # [C, h, w]

    if im_bands == 1 and as_rgb:
        out = np.tile(out, (3, 1, 1))
    elif im_bands >= 4 and as_rgb:
        out = out[0:3]

    if normalize:
        if isinstance(normalize_factor, int):
            out = (out.astype(np.float32) / normalize_factor).astype(np.uint16)
        elif len(normalize_factor) == 2:
            lo, hi = normalize_factor
            out = np.clip((out.astype(np.float32) - lo) / (hi - lo), 0.0, 1.0) * 255
            out = out.astype(np.uint16)
        else:
            raise NotImplementedError
        out = out.astype(np.uint8)

    scale_w = int(width / scale_factor)
    scale_h = int(height / scale_factor)
    if out.shape[1] != scale_h or out.shape[2] != scale_w:
        out = np.pad(out, ((0, 0), (0, scale_h - out.shape[1]), (0, scale_w - out.shape[2])),
                     mode="constant")
    if data_format == "NUMPY_FORMAT":
        out = np.moveaxis(out, 0, -1)
    return out


# ---- geographic <-> Web Mercator transforms (utils/gdal_utils.py:344-397) ----
# Implemented in closed form (EPSG:4326 <-> EPSG:3857); no pyproj/osr needed.

_EARTH_R = 6378137.0


def lonlat2geo(lon, lat):
    """(lon, lat) degrees -> Web Mercator (x, y) meters."""
    x = np.deg2rad(np.asarray(lon, np.float64)) * _EARTH_R
    y = np.log(np.tan(np.pi / 4 + np.deg2rad(np.asarray(lat, np.float64)) / 2)) * _EARTH_R
    return x, y


def geo2lonlat(x, y):
    """Web Mercator (x, y) meters -> (lon, lat) degrees."""
    lon = np.rad2deg(np.asarray(x, np.float64) / _EARTH_R)
    lat = np.rad2deg(2 * np.arctan(np.exp(np.asarray(y, np.float64) / _EARTH_R)) - np.pi / 2)
    return lon, lat

"""Minimal pure-python (Geo)TIFF codec — no GDAL/rasterio required.

The reference's raster IO rides on geowombat/rasterio/GDAL (data/create.py,
utils/model_preprocessing.py); in environments without those C libraries
this module supplies a dependency-free baseline-TIFF reader/writer that
covers the subset the framework produces and consumes:

- single- or multi-band (chunky interleaved), single-strip, uncompressed,
  little-endian
- uint8/uint16/int16/int32/uint32/float32/float64 sample formats
- GeoTIFF georeferencing: ModelPixelScale + ModelTiepoint tags and the
  GeoKeyDirectory ProjectedCSType/GeographicType EPSG code

``data/geotiff.py`` uses rasterio when importable and falls back to this
codec, so the GeoTIFF ingestion path is exercised in any environment.
"""

import struct
import typing as T
from pathlib import Path

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
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922
_GEO_KEY_DIRECTORY = 34735

# TIFF field types
_T_SHORT = 3
_T_LONG = 4
_T_DOUBLE = 12

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8}
_TYPE_FMT = {3: "H", 4: "I", 12: "d", 1: "B", 2: "c", 6: "b", 8: "h",
             9: "i", 11: "f"}

# (sample_format, bits) -> numpy dtype
_DTYPES = {
    (1, 8): np.uint8,
    (1, 16): np.uint16,
    (1, 32): np.uint32,
    (2, 16): np.int16,
    (2, 32): np.int32,
    (3, 32): np.float32,
    (3, 64): np.float64,
}
_REV_DTYPES = {np.dtype(v): k for k, v in _DTYPES.items()}

# GeoKey ids
_GK_MODEL_TYPE = 1024
_GK_RASTER_TYPE = 1025
_GK_GEOGRAPHIC_TYPE = 2048
_GK_PROJECTED_CS_TYPE = 3072


def write_tiff(
    path: T.Union[str, Path],
    array: np.ndarray,  # (H, W) or (bands, H, W)
    bounds: T.Optional[T.Tuple[float, float, float, float]] = None,
    crs: T.Optional[str] = None,
) -> Path:
    """Write a georeferenced baseline TIFF (multi-band = chunky interleave).

    ``bounds`` = (left, bottom, right, top); ``crs`` like "EPSG:32633".
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    array = np.ascontiguousarray(array)
    if array.ndim == 2:
        array = array[None]
    if array.ndim != 3:
        raise ValueError(f"Expected (H, W) or (bands, H, W), got {array.shape}")
    spp, h, w = array.shape
    dt = np.dtype(array.dtype).newbyteorder("<")
    if np.dtype(array.dtype) not in _REV_DTYPES:
        raise ValueError(f"Unsupported dtype {array.dtype}")
    sample_format, bits = _REV_DTYPES[np.dtype(array.dtype)]
    # chunky (pixel-interleaved) layout: (H, W, spp)
    data = np.ascontiguousarray(
        np.moveaxis(array, 0, -1).astype(dt)
    ).tobytes()

    entries: T.List[T.Tuple[int, int, int, T.Union[int, bytes]]] = []

    def entry(tag, ftype, values):
        if not isinstance(values, (list, tuple)):
            values = [values]
        count = len(values)
        fmt = "<" + _TYPE_FMT[ftype] * count
        packed = struct.pack(fmt, *values)
        entries.append((tag, ftype, count, packed))

    entry(_IMAGE_WIDTH, _T_LONG, w)
    entry(_IMAGE_LENGTH, _T_LONG, h)
    entry(_BITS_PER_SAMPLE, _T_SHORT, [bits] * spp)
    entry(_COMPRESSION, _T_SHORT, 1)
    entry(_PHOTOMETRIC, _T_SHORT, 1)
    entry(_STRIP_OFFSETS, _T_LONG, 0)  # patched below
    entry(_SAMPLES_PER_PIXEL, _T_SHORT, spp)
    entry(_ROWS_PER_STRIP, _T_LONG, h)
    entry(_STRIP_BYTE_COUNTS, _T_LONG, len(data))
    entry(_PLANAR_CONFIG, _T_SHORT, 1)
    entry(_SAMPLE_FORMAT, _T_SHORT, [sample_format] * spp)

    if bounds is not None:
        left, bottom, right, top = bounds
        sx = (right - left) / w
        sy = (top - bottom) / h
        entry(_MODEL_PIXEL_SCALE, _T_DOUBLE, [sx, sy, 0.0])
        entry(_MODEL_TIEPOINT, _T_DOUBLE, [0.0, 0.0, 0.0, left, top, 0.0])
    if crs is not None:
        code = int(str(crs).upper().replace("EPSG:", ""))
        geographic = 4000 <= code < 5000
        keys = [
            (_GK_MODEL_TYPE, 0, 1, 2 if geographic else 1),
            (_GK_RASTER_TYPE, 0, 1, 1),
            (
                _GK_GEOGRAPHIC_TYPE if geographic else _GK_PROJECTED_CS_TYPE,
                0,
                1,
                code,
            ),
        ]
        flat = [1, 1, 0, len(keys)]
        for k in keys:
            flat.extend(k)
        entry(_GEO_KEY_DIRECTORY, _T_SHORT, flat)

    entries.sort(key=lambda e: e[0])

    # Layout: header (8) | IFD | out-of-line values | strip data
    ifd_offset = 8
    ifd_size = 2 + len(entries) * 12 + 4
    extra_offset = ifd_offset + ifd_size
    extra = b""
    packed_entries = []
    for tag, ftype, count, payload in entries:
        size = _TYPE_SIZES[ftype] * count
        if size <= 4:
            value_field = payload + b"\x00" * (4 - size)
        else:
            value_field = struct.pack("<I", extra_offset + len(extra))
            extra += payload
        packed_entries.append((tag, ftype, count, value_field))

    data_offset = extra_offset + len(extra)
    # Patch StripOffsets (its 4-byte inline value)
    packed_entries = [
        (
            tag,
            ftype,
            count,
            struct.pack("<I", data_offset)
            if tag == _STRIP_OFFSETS
            else value,
        )
        for tag, ftype, count, value in packed_entries
    ]

    with open(path, "wb") as fh:
        fh.write(b"II*\x00")
        fh.write(struct.pack("<I", ifd_offset))
        fh.write(struct.pack("<H", len(packed_entries)))
        for tag, ftype, count, value in packed_entries:
            fh.write(struct.pack("<HHI", tag, ftype, count))
            fh.write(value)
        fh.write(struct.pack("<I", 0))  # no next IFD
        fh.write(extra)
        fh.write(data)
    return path


def read_tiff(
    path: T.Union[str, Path],
) -> T.Tuple[
    np.ndarray,
    T.Optional[T.Tuple[float, float, float, float]],
    T.Optional[float],
    T.Optional[str],
]:
    """Read a single-band baseline TIFF -> (array, bounds, cell_res, crs)."""
    blob = Path(path).read_bytes()
    if blob[:2] == b"II":
        bo = "<"
    elif blob[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError(f"Not a TIFF: {path}")
    magic, ifd_offset = struct.unpack(bo + "HI", blob[2:8])
    if magic != 42:
        raise ValueError(f"Not a classic TIFF: {path}")

    (num_entries,) = struct.unpack(
        bo + "H", blob[ifd_offset : ifd_offset + 2]
    )
    tags: T.Dict[int, T.List] = {}
    for i in range(num_entries):
        off = ifd_offset + 2 + i * 12
        tag, ftype, count = struct.unpack(bo + "HHI", blob[off : off + 8])
        if ftype not in _TYPE_FMT:
            continue
        size = _TYPE_SIZES[ftype] * count
        if size <= 4:
            payload = blob[off + 8 : off + 8 + size]
        else:
            (value_offset,) = struct.unpack(
                bo + "I", blob[off + 8 : off + 12]
            )
            payload = blob[value_offset : value_offset + size]
        values = list(
            struct.unpack(bo + _TYPE_FMT[ftype] * count, payload)
        )
        tags[tag] = values

    w = int(tags[_IMAGE_WIDTH][0])
    h = int(tags[_IMAGE_LENGTH][0])
    bits = int(tags.get(_BITS_PER_SAMPLE, [8])[0])
    compression = int(tags.get(_COMPRESSION, [1])[0])
    if compression != 1:
        raise ValueError(
            f"Only uncompressed TIFFs supported (compression={compression})"
        )
    spp = int(tags.get(_SAMPLES_PER_PIXEL, [1])[0])
    planar = int(tags.get(_PLANAR_CONFIG, [1])[0])
    if spp > 1 and planar != 1:
        raise ValueError("Only chunky (interleaved) multi-band supported")
    sample_format = int(tags.get(_SAMPLE_FORMAT, [1])[0])
    dtype = _DTYPES.get((sample_format, bits))
    if dtype is None:
        raise ValueError(f"Unsupported sample format {sample_format}/{bits}")

    offsets = tags[_STRIP_OFFSETS]
    counts = tags[_STRIP_BYTE_COUNTS]
    data = b"".join(
        blob[int(o) : int(o) + int(c)] for o, c in zip(offsets, counts)
    )
    array = np.frombuffer(data, dtype=np.dtype(dtype).newbyteorder(bo))
    if spp > 1:
        array = np.moveaxis(
            array.reshape(h, w, spp), -1, 0
        ).astype(dtype)  # -> (bands, H, W)
    else:
        array = array.reshape(h, w).astype(dtype)

    bounds = None
    cell_res = None
    if _MODEL_PIXEL_SCALE in tags and _MODEL_TIEPOINT in tags:
        sx, sy = tags[_MODEL_PIXEL_SCALE][:2]
        tp = tags[_MODEL_TIEPOINT]
        # tiepoint: raster (i, j, k) -> model (x, y, z); standard top-left
        left = tp[3] - tp[0] * sx
        top = tp[4] + tp[1] * sy
        bounds = (left, top - h * sy, left + w * sx, top)
        cell_res = float(sx)

    crs = None
    if _GEO_KEY_DIRECTORY in tags:
        keys = tags[_GEO_KEY_DIRECTORY]
        num_keys = int(keys[3])
        for i in range(num_keys):
            kid, _, cnt, val = keys[4 + 4 * i : 8 + 4 * i]
            if kid in (_GK_PROJECTED_CS_TYPE, _GK_GEOGRAPHIC_TYPE) and (
                cnt == 1
            ):
                crs = f"EPSG:{int(val)}"
    return array, bounds, cell_res, crs

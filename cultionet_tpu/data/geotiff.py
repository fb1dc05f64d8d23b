"""Rasterio-gated GeoTIFF time-series reading and writing.

The reference's raster IO rides on geowombat/rasterio/GDAL (data/create.py,
utils/model_preprocessing.py). Those libraries are optional here: when
rasterio is importable these helpers read banded time series from
``<region>/<variable>/<date>.tif`` layouts and write georeferenced outputs;
otherwise ``scene.npz`` manifests are the input path (scripts/cli.py).
"""

import typing as T
from pathlib import Path

import numpy as np


def _require_rasterio():
    try:
        import rasterio

        return rasterio
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "rasterio is required for GeoTIFF IO; provide scene.npz "
            "manifests instead (see scripts/cli.py docstring)."
        ) from e


def read_time_series(
    region_path: T.Union[str, Path],
) -> T.Tuple[
    np.ndarray,
    T.Tuple[float, float, float, float],
    float,
    T.Optional[str],
]:
    """Read ``<region>/<variable>/*.tif`` into (T, H, W, C) + bounds +
    res + CRS string.

    Variables are sorted directories (one per band/vegetation index); dates
    are sorted file stems — the reference's time-series layout
    (utils/model_preprocessing.py:57-105).
    """
    rasterio = _require_rasterio()
    region_path = Path(region_path)

    var_dirs = sorted(p for p in region_path.iterdir() if p.is_dir())
    if not var_dirs:
        raise FileNotFoundError(f"No variable directories in {region_path}")

    bands = []
    bounds = None
    cell_res = None
    crs = None
    for var_dir in var_dirs:
        files = sorted(var_dir.glob("*.tif"))
        frames = []
        for tif in files:
            with rasterio.open(tif) as src:
                frames.append(src.read(1))
                if bounds is None:
                    bounds = tuple(src.bounds)
                    cell_res = abs(src.transform.a)
                    crs = str(src.crs) if src.crs else None
        bands.append(np.stack(frames))  # (T, H, W)

    x = np.stack(bands, axis=-1)  # (T, H, W, C)
    return x, bounds, cell_res, crs


def write_geotiff(
    path: T.Union[str, Path],
    raster: np.ndarray,  # (bands, H, W)
    bounds: T.Tuple[float, float, float, float],
    crs: T.Optional[str] = None,
    dtype: str = "uint16",
    compress: str = "lzw",
) -> Path:
    """Write a multi-band GeoTIFF (reference callbacks.py:85-107)."""
    rasterio = _require_rasterio()
    from rasterio.transform import from_bounds

    path = Path(path)
    count, height, width = raster.shape
    transform = from_bounds(*bounds, width=width, height=height)
    with rasterio.open(
        path,
        "w",
        driver="GTiff",
        height=height,
        width=width,
        count=count,
        dtype=dtype,
        transform=transform,
        crs=crs,
        compress=compress,
    ) as dst:
        dst.write(raster.astype(dtype))
    return path

"""GeoTIFF time-series reading and writing (rasterio or pure-python).

The reference's raster IO rides on geowombat/rasterio/GDAL (data/create.py,
utils/model_preprocessing.py). Here rasterio is optional: when importable
it handles every TIFF flavor; otherwise the pure-python baseline codec
(``data/tiny_tiff.py`` — uncompressed single-band GeoTIFFs) keeps the
``<region>/<variable>/<date>.tif`` ingestion path fully functional, so the
GeoTIFF pipeline is exercised in any environment. ``scene.npz`` manifests
remain the compact alternative input (scripts/cli.py).
"""

import typing as T
from pathlib import Path

import numpy as np


def _rasterio():
    try:
        import rasterio

        return rasterio
    except ImportError:
        return None


def read_tiff_band(
    path: T.Union[str, Path],
) -> T.Tuple[
    np.ndarray,
    T.Optional[T.Tuple[float, float, float, float]],
    T.Optional[float],
    T.Optional[str],
]:
    """One band + georeferencing from a TIFF, via rasterio when present
    else the pure-python codec."""
    rio = _rasterio()
    if rio is not None:
        with rio.open(path) as src:
            return (
                src.read(1),
                tuple(src.bounds),
                abs(src.transform.a),
                str(src.crs) if src.crs else None,
            )
    from .tiny_tiff import read_tiff

    return read_tiff(path)


def read_time_series(
    region_path: T.Union[str, Path],
    end_year: T.Optional[int] = None,
    start_mmdd: T.Optional[str] = None,
    end_mmdd: T.Optional[str] = None,
    num_months: T.Optional[int] = None,
) -> T.Tuple[
    np.ndarray,
    T.Tuple[float, float, float, float],
    float,
    T.Optional[str],
]:
    """Read ``<region>/<variable>/*.tif`` into (T, H, W, C) + bounds +
    res + CRS string.

    Variables are sorted directories (one per band/vegetation index); dates
    are sorted file stems. When a seasonal window is given the files are
    selected with ``get_time_series_list`` — the reference's date-windowed
    listing (utils/model_preprocessing.py:57-105).
    """
    region_path = Path(region_path)

    var_dirs = sorted(p for p in region_path.iterdir() if p.is_dir())
    if not var_dirs:
        raise FileNotFoundError(f"No variable directories in {region_path}")

    def list_files(var_dir: Path) -> T.List[Path]:
        if end_year is not None and start_mmdd and end_mmdd:
            from ..utils.model_preprocessing import get_time_series_list

            return get_time_series_list(
                var_dir,
                end_year=end_year,
                start_mmdd=start_mmdd,
                end_mmdd=end_mmdd,
                num_months=num_months,
            )
        return sorted(var_dir.glob("*.tif"))

    bands = []
    bounds = None
    cell_res = None
    crs = None
    for var_dir in var_dirs:
        files = list_files(var_dir)
        if not files:
            raise FileNotFoundError(f"No .tif files in {var_dir}")
        frames = []
        for tif in files:
            frame, fb, fres, fcrs = read_tiff_band(tif)
            frames.append(frame)
            if bounds is None and fb is not None:
                bounds, cell_res, crs = fb, fres, fcrs
        bands.append(np.stack(frames))  # (T, H, W)

    x = np.stack(bands, axis=-1)  # (T, H, W, C)
    if bounds is None:
        bounds = (0.0, 0.0, float(x.shape[2]), float(x.shape[1]))
        cell_res = 1.0
    return x, bounds, cell_res, crs


def write_geotiff(
    path: T.Union[str, Path],
    raster: np.ndarray,  # (bands, H, W)
    bounds: T.Tuple[float, float, float, float],
    crs: T.Optional[str] = None,
    dtype: str = "uint16",
    compress: str = "lzw",
) -> Path:
    """Write a multi-band GeoTIFF (reference callbacks.py:85-107).

    Without rasterio the pure-python codec writes an uncompressed chunky
    multi-band GeoTIFF.
    """
    path = Path(path)
    rio = _rasterio()
    if rio is not None:
        from rasterio.transform import from_bounds

        count, height, width = raster.shape
        transform = from_bounds(*bounds, width=width, height=height)
        with rio.open(
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

    from .tiny_tiff import write_tiff

    return write_tiff(path, raster.astype(dtype), bounds=bounds, crs=crs)

"""Synthesize label-conditioned VI time series for the bundled USA grids.

The reference ships real training *labels* for 120 USA grids
(``/root/reference/data/user_train_usa.tar.gz``: ``<grid>_grid_<year>.gpkg``
bounds + ``<grid>_poly_<year>.gpkg`` field polygons) but no imagery — the
only bundled imagery is one grid (reference tests/data/time_series_vars/
000064). To produce an accuracy-parity experiment (train this framework AND
the torch reference on identical data, compare crop-mask F1), this script
generates a plausible 13-date x 3-VI GeoTIFF time series per grid,
conditioned on the real parcel geometry:

- crop parcels follow a seasonal phenology curve (Gaussian bump over
  day-of-year) with per-parcel amplitude/peak/width/base drawn from an rng
  seeded by (grid, parcel), plus mild within-parcel texture;
- background follows a low, spatially smooth field with weak seasonality;
- per-pixel observation noise everywhere.

Format matches the reference's bundled imagery exactly: uint16 x 10000,
100x100 px @ 10 m, ``<grid>/<vi>/<YYYYDDD>.tif`` (reference
tests/data/time_series_vars layout), grid CRS/bounds from the real grid
gpkg. Labels keep their real-world geometry, so edge/boundary-distance
targets are real; only the pixel radiometry is synthetic. Both frameworks
train on the same chips, which is what the parity comparison needs.
"""

import sys
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cultionet_tpu.data.label_math import polygons_to_array  # noqa: E402
from cultionet_tpu.data.tiny_tiff import write_tiff  # noqa: E402
from cultionet_tpu.data.vector import read_gpkg  # noqa: E402

RES = 10.0
# 13 monthly composites: Jan <year> .. Jan <year+1> (the reference's
# bundled series is Jan 2020 .. Jan 2021, %Y%j names). The USA labels mix
# 2021 and 2022 grids, so dates are generated per grid year.
DOYS = [1, 32, 60, 91, 121, 152, 182, 213, 244, 274, 305, 335]
VIS = ("evi2", "gcvi", "kndvi")


def dates_for_year(year: int):
    return [(year, d) for d in DOYS] + [(year + 1, 1)]


def smooth_field(rng, shape, sigma_px=12.0):
    noise = rng.normal(size=shape).astype(np.float32)
    k = int(sigma_px * 4) | 1
    return cv2.GaussianBlur(noise, (k, k), sigma_px)


def synthesize_grid(
    grid_id: str, year: int, src: Path, out_root: Path, seed: int
):
    DATES = dates_for_year(year)
    grid = read_gpkg(src / f"{grid_id}_grid_{year}.gpkg")
    polys = read_gpkg(src / f"{grid_id}_poly_{year}.gpkg")
    ring = np.asarray(grid[0][0])
    left, bottom = ring.min(axis=0)
    right, top = ring.max(axis=0)
    # A few USA grids are 5-10 km; clamp to a centered 1 km window so every
    # chip is the canonical 100x100 (the reference asserts uniform chip
    # dims via --grid-size, create.py:438-458).
    max_span = 100 * RES
    if right - left > max_span:
        cx = (left + right) / 2.0
        left, right = cx - max_span / 2.0, cx + max_span / 2.0
    if top - bottom > max_span:
        cy = (bottom + top) / 2.0
        bottom, top = cy - max_span / 2.0, cy + max_span / 2.0
    bounds = (float(left), float(bottom), float(right), float(top))
    ncols = int(round((right - left) / RES))
    nrows = int(round((top - bottom) / RES))
    shape = (nrows, ncols)

    import sqlite3

    con = sqlite3.connect(src / f"{grid_id}_grid_{year}.gpkg")
    srs = con.execute(
        "select srs_id from gpkg_geometry_columns"
    ).fetchone()[0]
    con.close()
    crs = f"EPSG:{srs}"

    # Rasterize each crop parcel with its own id (row index + 1).
    shapes = [
        (r, i + 1)
        for i, (r, cls) in enumerate(polys)
        if cls > 0 and np.asarray(r).shape[0] >= 4
    ]
    parcel_id = polygons_to_array(shapes, bounds, shape, dtype="int32")

    rng = np.random.default_rng(seed)
    t_doy = np.array(
        [doy + (365 if yr != DATES[0][0] else 0) for yr, doy in DATES],
        dtype=np.float32,
    )

    # Background: smooth low field + weak seasonality + texture.
    bg_base = 0.08 + 0.10 * (smooth_field(rng, shape) * 0.5 + 0.5)
    bg_amp = 0.04 + 0.06 * (smooth_field(rng, shape) * 0.5 + 0.5)
    bg_peak = 190.0 + 30.0 * smooth_field(rng, shape)
    bg_width = 90.0

    # Per-parcel phenology.
    n_parcels = int(parcel_id.max())
    base = rng.uniform(0.05, 0.12, size=n_parcels + 1).astype(np.float32)
    amp = rng.uniform(0.35, 0.65, size=n_parcels + 1).astype(np.float32)
    peak = rng.normal(200.0, 22.0, size=n_parcels + 1).astype(np.float32)
    width = rng.uniform(45.0, 75.0, size=n_parcels + 1).astype(np.float32)

    is_crop = parcel_id > 0
    p_base = np.where(is_crop, base[parcel_id], bg_base)
    p_amp = np.where(is_crop, amp[parcel_id], bg_amp)
    p_peak = np.where(is_crop, peak[parcel_id], bg_peak)
    p_width = np.where(is_crop, width[parcel_id], bg_width)

    # Within-parcel/site texture (static over time, mild).
    texture = 1.0 + 0.08 * smooth_field(rng, shape, sigma_px=4.0)

    # (T, H, W) canonical signal.
    t = t_doy[:, None, None]
    v = p_base[None] + p_amp[None] * np.exp(
        -0.5 * ((t - p_peak[None]) / p_width[None]) ** 2
    )
    v = v * texture[None]

    # VI flavors: monotone transforms with distinct ranges, like real
    # evi2/gcvi/kndvi differ. All kept within [0, ~1].
    flavors = {
        "evi2": lambda s: s,
        "gcvi": lambda s: np.clip(1.35 * s + 0.02, 0.0, 1.2),
        "kndvi": lambda s: np.clip(np.tanh(1.8 * s), 0.0, 1.0),
    }

    for vi in VIS:
        sig = flavors[vi](v)
        sig = sig + rng.normal(0.0, 0.02, size=sig.shape).astype(np.float32)
        sig = np.clip(sig, 0.0, 1.2)
        out_dir = out_root / grid_id / vi
        out_dir.mkdir(parents=True, exist_ok=True)
        for (yr, doy), frame in zip(DATES, sig):
            arr = np.round(frame * 10000.0).astype(np.uint16)
            write_tiff(
                out_dir / f"{yr}{doy:03d}.tif", arr, bounds=bounds, crs=crs
            )
    return n_parcels


def main():
    src = Path(__file__).parent / "user_train_usa"
    project = Path(__file__).parent / "usa_project"
    ts_root = project / "time_series_vars"
    train_dir = project / "user_train"
    train_dir.mkdir(parents=True, exist_ok=True)

    grids = sorted(
        tuple(p.name.replace(".gpkg", "").split("_grid_"))
        for p in src.glob("*_grid_*.gpkg")
    )
    print(f"{len(grids)} grids")
    for i, (grid_id, year) in enumerate(grids):
        n = synthesize_grid(grid_id, int(year), src, ts_root, seed=1000 + i)
        # real labels move into the project for `create`
        dst = train_dir / f"{grid_id}_poly_{year}.gpkg"
        if not dst.exists():
            import shutil

            shutil.copy(src / f"{grid_id}_poly_{year}.gpkg", dst)
        print(f"  {grid_id}/{year}: {n} parcels")


if __name__ == "__main__":
    main()

"""Offline data engineering: train chips and overlapping predict windows.

Capability parity with the reference's data/create.py + data/store.py on a
geo-free core: the reference reads GeoTIFF time series through
geowombat/xarray/dask and parallelizes with Ray; here chip creation consumes
in-memory numpy time series (a thin rasterio-gated reader provides the
GeoTIFF path when available, see data/geotiff.py) and predict-window
generation runs in a thread pool with write-then-verify retries.

Layout: time series arrive (T, H, W, C) channel-last float (gain-applied) or
raw int (gain 1e-4 applied here); chips are written as this framework's
``.npz`` batches.
"""

import typing as T
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from .batch import Batch
from .label_math import (
    cleanup_edges,
    edge_gradient,
    fillz,
    get_crop_count,
    normalize_boundary_distances,
    polygons_to_array,
)

Shapes = T.Sequence[T.Tuple[T.Any, int]]


def is_grid_processed(
    process_path: Path,
    transforms: T.Sequence[str],
    region: str,
    start_date: str,
    end_date: str,
) -> bool:
    """Idempotency check (reference data/create.py:40-68)."""
    batches_stored = []
    for aug in transforms:
        train_id = f"data_{region}_{start_date}_{end_date}_{aug}"
        batch_stored = (Path(process_path) / f"{train_id}.npz").is_file()
        batches_stored.append(batch_stored)
    return all(batches_stored)


@dataclass
class ReferenceArrays:
    """Label arrays derived from training polygons
    (reference data/create.py:248-362)."""

    labels_array: T.Optional[np.ndarray] = None
    boundary_distance: T.Optional[np.ndarray] = None
    orientation: T.Optional[np.ndarray] = None
    edge_array: T.Optional[np.ndarray] = None

    @classmethod
    def from_polygons(
        cls,
        polygons: Shapes,
        bounds: T.Tuple[float, float, float, float],
        out_shape: T.Tuple[int, int],
        max_crop_class: int,
        edge_class: int,
        cell_res: float,
        keep_crop_classes: bool = False,
        nonag_is_unknown: bool = False,
        geom_type: str = "Polygon",
        all_touched: bool = True,
    ) -> "ReferenceArrays":
        # Unique id per polygon (instance raster)
        unique_shapes = [
            (poly, idx + 1) for idx, (poly, _) in enumerate(polygons)
        ]
        labels_array_unique = polygons_to_array(
            unique_shapes, bounds, out_shape, all_touched=all_touched
        )

        fill_value, dtype = 0, "uint8"
        if nonag_is_unknown:
            # Background is unknown -> weak-label -1
            fill_value, dtype = -1, "int16"

        labels_array = polygons_to_array(
            polygons,
            bounds,
            out_shape,
            fill_value=fill_value,
            dtype=dtype,
            all_touched=all_touched,
        )

        # Polygon boundaries: morphological gradient of the instance raster
        # (the reference burns geometric boundaries then intersects with the
        # gradient; with integer-pixel burn-in the gradient IS the boundary).
        edge_array = edge_gradient(labels_array_unique)
        image_grad_count = get_crop_count(edge_array, edge_class)
        edge_array = np.where(image_grad_count > 0, edge_array, 0)

        if not keep_crop_classes:
            labels_array = np.where(
                labels_array > 0, max_crop_class, fill_value
            )

        labels_array = labels_array.astype("int16")
        labels_array[edge_array == 1] = edge_class
        labels_array = cleanup_edges(
            np.where(labels_array == fill_value, 0, labels_array),
            labels_array_unique,
            edge_class,
        )
        labels_array = np.where(labels_array == 0, fill_value, labels_array)

        assert labels_array.max() <= edge_class, (
            "The labels array has larger than expected values."
        )

        boundary_distance, orientation = normalize_boundary_distances(
            np.uint8((labels_array > 0) & (labels_array != edge_class)),
            geom_type,
            cell_res,
        )
        return cls(
            labels_array=labels_array,
            boundary_distance=boundary_distance,
            orientation=orientation,
            edge_array=edge_array,
        )


def prepare_image_time_series(
    time_series: np.ndarray,
    gain: float = 1e-4,
    offset: float = 0.0,
    apply_gain: T.Optional[bool] = None,
    fill_zeros: bool = True,
) -> np.ndarray:
    """Gain/offset scaling, NaN masking, and focal-mean zero fill
    (reference data/create.py:71-112 ``reshape_and_mask_array`` + fillz)."""
    x = np.asarray(time_series, dtype="float64")
    if apply_gain is None:
        apply_gain = np.issubdtype(time_series.dtype, np.integer) or (
            np.nanmax(x) > 2.0 if x.size else False
        )
    if apply_gain:
        x = x * gain + offset
    x = np.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
    if fill_zeros:
        # fillz expects (..., H, W): move channel out of the way
        x = np.moveaxis(x, -1, 1)  # (T, C, H, W)
        x = fillz(x)
        x = np.moveaxis(x, 1, -1)
    return np.clip(x, 0.0, 1.0).astype("float32")


def create_train_batch(
    image_time_series: np.ndarray,  # (T, H, W, C)
    polygons: T.Optional[Shapes],
    bounds: T.Tuple[float, float, float, float],
    cell_res: float,
    region: str,
    process_path: T.Union[str, Path],
    start_date: str = "0",
    end_date: str = "1",
    max_crop_class: int = 1,
    edge_class: T.Optional[int] = None,
    gain: float = 1e-4,
    offset: float = 0.0,
    keep_crop_classes: bool = False,
    nonag_is_unknown: bool = False,
    overwrite: bool = False,
    all_touched: bool = True,
    zero_padding: int = 0,
    grid_size: T.Optional[T.Tuple[int, int]] = None,
    compression: str = "zlib",
) -> T.Optional[Path]:
    """Build one training chip and write it (reference data/create.py:559-778).

    ``grid_size`` asserts the chip dims match the expected (rows, cols)
    (reference create.py:438-458 — a guard against mixed-size grids);
    ``zero_padding`` pads H/W with zeros on every side (reference args.yml
    zero_padding); ``all_touched`` controls polygon rasterization.
    """
    process_path = Path(process_path)
    process_path.mkdir(parents=True, exist_ok=True)
    if edge_class is None:
        edge_class = max_crop_class + 1

    if not overwrite and is_grid_processed(
        process_path, ["none"], region, start_date, end_date
    ):
        return None

    x = prepare_image_time_series(image_time_series, gain=gain, offset=offset)
    num_time, height, width, _ = x.shape
    if grid_size is not None:
        expected_rows, expected_cols = grid_size
        if (height, width) != (int(expected_rows), int(expected_cols)):
            raise ValueError(
                f"Grid {region} is {height} rows x {width} columns, but "
                f"--grid-size expects {expected_rows} x {expected_cols}"
            )

    if polygons:
        ref = ReferenceArrays.from_polygons(
            polygons=polygons,
            bounds=bounds,
            out_shape=(height, width),
            max_crop_class=max_crop_class,
            edge_class=edge_class,
            cell_res=cell_res,
            keep_crop_classes=keep_crop_classes,
            nonag_is_unknown=nonag_is_unknown,
            all_touched=all_touched,
        )
        labels = ref.labels_array
        bdist = ref.boundary_distance
    else:
        fill = -1 if nonag_is_unknown else 0
        labels = np.full((height, width), fill, dtype="int16")
        bdist = np.zeros((height, width), dtype="float32")

    if zero_padding > 0:
        pad = int(zero_padding)
        x = np.pad(
            x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="constant"
        )
        fill = -1 if nonag_is_unknown else 0
        labels = np.pad(
            labels, ((pad, pad), (pad, pad)), constant_values=fill
        )
        bdist = np.pad(bdist, ((pad, pad), (pad, pad)))
        left_pad = pad * cell_res
        bounds = (
            bounds[0] - left_pad,
            bounds[1] - left_pad,
            bounds[2] + left_pad,
            bounds[3] + left_pad,
        )

    left, bottom, right, top = bounds
    train_id = f"data_{region}_{start_date}_{end_date}_none"
    batch = Batch(
        x=np.asarray(x[None], dtype="float32"),
        y=np.asarray(labels[None], dtype="int32"),
        bdist=np.asarray(bdist[None], dtype="float32"),
        left=np.asarray([left], dtype="float32"),
        bottom=np.asarray([bottom], dtype="float32"),
        right=np.asarray([right], dtype="float32"),
        top=np.asarray([top], dtype="float32"),
        batch_id=(f"{train_id}.npz",),
    )
    out_path = process_path / f"{train_id}.npz"
    batch.to_file(out_path, compression=compression)
    return out_path


# ---------------------------------------------------------------------------
# Predict-window creation (reference data/create.py:114-246 + store.py)
# ---------------------------------------------------------------------------


class BatchStore:
    """Write overlapping windows as uniform-size chips with stamped offsets
    (reference data/store.py:21-158): edge windows are zero-padded to
    window_size + 2*padding, window geometry rides in the Batch, and every
    write is verified by a read-back with retries."""

    def __init__(
        self,
        write_path: T.Union[str, Path],
        window_size: int,
        padding: int,
        region: str,
        start_date: str,
        end_date: str,
        bounds: T.Tuple[float, float, float, float] = (0.0, 0.0, 1.0, 1.0),
        retries: int = 5,
        compression: str = "zlib",
    ):
        self.write_path = Path(write_path)
        self.write_path.mkdir(parents=True, exist_ok=True)
        self.window_size = window_size
        self.padding = padding
        self.region = region
        self.start_date = start_date
        self.end_date = end_date
        self.bounds = bounds
        self.retries = retries
        self.compression = compression

    def write_window(
        self,
        x_window: np.ndarray,  # (T, Hw, Ww, C), may be smaller at edges
        row_off: int,
        col_off: int,
        window_height: int,
        window_width: int,
    ) -> Path:
        image_size = self.window_size + self.padding * 2
        pad_bottom = image_size - x_window.shape[1]
        pad_right = image_size - x_window.shape[2]
        if pad_bottom > 0 or pad_right > 0:
            x_window = np.pad(
                x_window,
                ((0, 0), (0, pad_bottom), (0, pad_right), (0, 0)),
                mode="constant",
            )
        assert x_window.shape[1:3] == (image_size, image_size)

        batch_id = (
            f"data_{self.region}_{self.start_date}_{self.end_date}_"
            f"{row_off}_{col_off}"
        )
        left, bottom, right, top = self.bounds
        batch = Batch(
            x=np.asarray(x_window[None], dtype="float32"),
            window_row_off=np.asarray([row_off], dtype="int32"),
            window_col_off=np.asarray([col_off], dtype="int32"),
            window_height=np.asarray([window_height], dtype="int32"),
            window_width=np.asarray([window_width], dtype="int32"),
            window_pad_bottom=np.asarray([max(pad_bottom, 0)], dtype="int32"),
            window_pad_right=np.asarray([max(pad_right, 0)], dtype="int32"),
            left=np.asarray([left], dtype="float32"),
            bottom=np.asarray([bottom], dtype="float32"),
            right=np.asarray([right], dtype="float32"),
            top=np.asarray([top], dtype="float32"),
            batch_id=(f"{batch_id}.npz",),
        )
        out_path = self.write_path / f"{batch_id}.npz"

        last_error: T.Optional[Exception] = None
        for _ in range(self.retries):
            batch.to_file(out_path, compression=self.compression)
            try:
                Batch.from_file(out_path)
                return out_path
            except Exception as exc:  # corrupted write: retry
                last_error = exc
        raise IOError(f"Failed to verify window write {out_path}: {last_error}")


def _fork_available() -> bool:
    import multiprocessing

    return "fork" in multiprocessing.get_all_start_methods()


def iter_window_jobs(
    height: int, width: int, window_size: int, padding: int
) -> T.Iterator[dict]:
    """Window index geometry for one scene: interior offsets plus the
    padded read slice and the top/left zero-pad a window near the scene
    edge needs. Pure indices — workers slice the scene themselves so a
    process pool never pickles pixel data per job."""
    for row_off in range(0, height, window_size):
        for col_off in range(0, width, window_size):
            window_height = min(window_size, height - row_off)
            window_width = min(window_size, width - col_off)
            read_r0 = max(0, row_off - padding)
            read_c0 = max(0, col_off - padding)
            read_r1 = min(height, row_off + window_height + padding)
            read_c1 = min(width, col_off + window_width + padding)
            yield dict(
                row_off=row_off,
                col_off=col_off,
                window_height=window_height,
                window_width=window_width,
                read=(read_r0, read_r1, read_c0, read_c1),
                pad_top=padding - (row_off - read_r0),
                pad_left=padding - (col_off - read_c0),
            )


def _slice_window(x: np.ndarray, job: dict) -> np.ndarray:
    read_r0, read_r1, read_c0, read_c1 = job["read"]
    window = x[:, read_r0:read_r1, read_c0:read_c1]
    if job["pad_top"] > 0 or job["pad_left"] > 0:
        window = np.pad(
            window,
            ((0, 0), (job["pad_top"], 0), (job["pad_left"], 0), (0, 0)),
            mode="constant",
        )
    return window


# Fork-inherited worker context: the prepared scene and the store travel
# to ProcessPoolExecutor workers by copy-on-write fork, not per-job
# pickling (the reference ships windows through Ray's object store,
# create.py:216-246; on one host fork sharing is strictly cheaper).
_WORKER_CTX: T.Optional[T.Tuple[np.ndarray, "BatchStore"]] = None


def _window_worker(job: dict) -> Path:
    x, store = _WORKER_CTX
    return store.write_window(
        x_window=_slice_window(x, job),
        row_off=job["row_off"],
        col_off=job["col_off"],
        window_height=job["window_height"],
        window_width=job["window_width"],
    )


def create_predict_dataset(
    image_time_series: np.ndarray,  # (T, H, W, C)
    region: str,
    process_path: T.Union[str, Path],
    start_date: str = "0",
    end_date: str = "1",
    window_size: int = 100,
    padding: int = 20,
    gain: float = 1e-4,
    offset: float = 0.0,
    bounds: T.Tuple[float, float, float, float] = (0.0, 0.0, 1.0, 1.0),
    num_workers: int = 4,
    use_processes: T.Union[bool, str] = "auto",
    compression: str = "zlib",
) -> T.List[Path]:
    """Split a full scene into overlapping uniform windows and write one chip
    per window in parallel (reference data/create.py:114-246; the Ray+dask
    scheduler becomes a fork-based process pool — with the pure-python TIFF
    codec active the npz serialization is GIL-bound Python, so threads
    cannot scale it).

    ``use_processes``: True forces the process pool, False the thread
    pool, "auto" picks processes when fork is available and num_workers>1.
    """
    x = prepare_image_time_series(
        image_time_series, gain=gain, offset=offset, fill_zeros=False
    )
    _, height, width, _ = x.shape

    store = BatchStore(
        write_path=process_path,
        window_size=window_size,
        padding=padding,
        region=region,
        start_date=start_date,
        end_date=end_date,
        bounds=bounds,
        compression=compression,
    )

    jobs = list(iter_window_jobs(height, width, window_size, padding))
    num_workers = max(1, num_workers)
    if use_processes == "auto":
        use_processes = num_workers > 1 and _fork_available()

    if num_workers == 1:
        paths = [
            store.write_window(
                x_window=_slice_window(x, job),
                row_off=job["row_off"],
                col_off=job["col_off"],
                window_height=job["window_height"],
                window_width=job["window_width"],
            )
            for job in jobs
        ]
    elif use_processes:
        import multiprocessing
        from concurrent.futures import ProcessPoolExecutor

        global _WORKER_CTX
        _WORKER_CTX = (x, store)
        try:
            ctx = multiprocessing.get_context("fork")
            with ProcessPoolExecutor(
                max_workers=num_workers, mp_context=ctx
            ) as pool:
                paths = list(pool.map(_window_worker, jobs, chunksize=4))
        finally:
            _WORKER_CTX = None
    else:
        _WORKER_CTX_local = (x, store)

        def run(job):
            xx, st = _WORKER_CTX_local
            return st.write_window(
                x_window=_slice_window(xx, job),
                row_off=job["row_off"],
                col_off=job["col_off"],
                window_height=job["window_height"],
                window_width=job["window_width"],
            )

        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            paths = list(pool.map(run, jobs))
    return paths

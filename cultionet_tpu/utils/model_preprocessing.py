"""Time-series file listing and preprocessing helpers.

Capability parity with the reference's utils/model_preprocessing.py:11-105:
seasonal-window file listing over per-variable date-named imagery and the
vegetation-index registry; the joblib+tqdm ParallelProgress pool becomes a
ThreadPoolExecutor with optional tqdm.
"""

import datetime
import typing as T
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class VegetationIndices:
    """Vegetation-index names used as input channels
    (reference model_preprocessing.py:31)."""

    image_vis: T.List[str] = field(
        default_factory=lambda: ["evi2", "gcvi", "kndvi"]
    )

    @property
    def n_vis(self) -> int:
        return len(self.image_vis)


def _parse_date(stem: str) -> datetime.date:
    digits = "".join(ch for ch in stem if ch.isdigit())
    if len(digits) >= 8:
        return datetime.date(
            int(digits[:4]), int(digits[4:6]), int(digits[6:8])
        )
    if len(digits) == 7:
        # %Y%j day-of-year (the reference's default date_format and the
        # naming of its bundled time series, e.g. 2020001.tif)
        return datetime.date(int(digits[:4]), 1, 1) + datetime.timedelta(
            days=int(digits[4:7]) - 1
        )
    if len(digits) >= 6:
        return datetime.date(int(digits[:4]), int(digits[4:6]), 1)
    raise ValueError(f"Cannot parse a date from {stem!r}")


def get_time_series_list(
    feature_path: T.Union[str, Path],
    end_year: int,
    start_mmdd: str,
    end_mmdd: str,
    num_months: T.Optional[int] = None,
    date_format: str = "%Y%j",
) -> T.List[Path]:
    """List image files inside the seasonal window ending in ``end_year``
    (reference model_preprocessing.py:57-105).

    The window runs from ``start_mmdd`` of the PREVIOUS year (when the start
    month-day is after the end month-day) or of ``end_year`` to ``end_mmdd``
    of ``end_year``. Files are sorted by parsed date.
    """
    feature_path = Path(feature_path)
    start_m, start_d = int(start_mmdd[:2]), int(start_mmdd[3:5])
    end_m, end_d = int(end_mmdd[:2]), int(end_mmdd[3:5])

    start_year = end_year
    if (start_m, start_d) >= (end_m, end_d):
        start_year = end_year - 1
    start = datetime.date(start_year, start_m, start_d)
    end = datetime.date(end_year, end_m, end_d)

    dated = []
    for path in sorted(feature_path.glob("*.tif")) + sorted(
        feature_path.glob("*.npy")
    ):
        try:
            # Honor an explicit --image-date-format first (reference
            # args.yml date_format, default %Y%j); fall back to the
            # digit heuristic for mixed naming.
            try:
                when = datetime.datetime.strptime(
                    path.stem, date_format
                ).date()
            except (ValueError, TypeError):
                when = _parse_date(path.stem)
        except ValueError:
            continue
        if start <= when <= end:
            dated.append((when, path))

    dated.sort(key=lambda pair: pair[0])
    files = [path for _, path in dated]
    if num_months is not None:
        files = files[: num_months]
    return files


def parallel_map(
    fn: T.Callable,
    items: T.Sequence,
    num_workers: int = 4,
    progress: bool = False,
    desc: str = "",
) -> list:
    """Threaded map with optional progress bar (reference ParallelProgress,
    model_preprocessing.py:11)."""
    iterator: T.Iterable = items
    with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        futures = pool.map(fn, iterator)
        if progress:
            try:
                from tqdm import tqdm

                return list(tqdm(futures, total=len(items), desc=desc))
            except ImportError:
                pass
        return list(futures)

"""Chip datasets: file-backed training/prediction data.

Capability parity with the reference's EdgeDataset (data/datasets.py:54-500):
file-list dataset over ``processed/*`` chips, 1/10000 scaling + clip,
per-sample random augmentation, optional Dynamic-World log transform,
z-score normalization, per-sample lat/lon centroid, random or spatially
balanced train/val split, spatial k-fold iteration, and a parallel dimension
audit. Reads both this framework's ``.npz`` chips and the reference's joblib
``.pt`` chips.
"""

import typing as T
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..errors import TensorShapeError
from .batch import Batch
from .constant import SCALE_FACTOR
from .spatial import spatial_kfold_indices, spatially_balanced_sample


class ChipDataset:
    """Dataset over chip files under ``root/processed``."""

    def __init__(
        self,
        root: T.Union[str, Path],
        pattern: str = "data*",
        norm_values=None,
        augment_prob: float = 0.0,
        augmentations: T.Optional[T.Sequence[str]] = None,
        log_transform: bool = False,
        random_seed: int = 42,
        files: T.Optional[T.Sequence[Path]] = None,
        preload: bool = False,
    ):
        self.root = Path(root)
        self.pattern = pattern
        self.norm_values = norm_values
        self.augment_prob = augment_prob
        self.log_transform = log_transform
        self.random_seed = random_seed
        self.rng = np.random.default_rng(random_seed)

        if augmentations is None:
            # Imported lazily: augment depends on data.batch (circularity).
            from ..augment import AUGMENTATION_NAMES

            augmentations = [n for n in AUGMENTATION_NAMES if n != "none"]
        self.augmentations = list(augmentations)

        if files is not None:
            self.files = [Path(f) for f in files]
        else:
            processed = self.root / "processed"
            search_dir = processed if processed.is_dir() else self.root
            self.files = sorted(
                list(search_dir.glob(f"{pattern}.npz"))
                + list(search_dir.glob(f"{pattern}.pt"))
            )
        # --preload-data (reference args.yml preload_data): cache raw
        # chips in RAM so epoch loading skips file IO.
        self.preload = bool(preload)
        self._cache: T.Dict[Path, Batch] = {}

    # ------------------------------------------------------------------

    def __len__(self) -> int:
        return len(self.files)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def _subset(self, files: T.Sequence[Path]) -> "ChipDataset":
        return ChipDataset(
            root=self.root,
            pattern=self.pattern,
            norm_values=self.norm_values,
            augment_prob=self.augment_prob,
            augmentations=self.augmentations,
            log_transform=self.log_transform,
            random_seed=self.random_seed,
            files=files,
            preload=self.preload,
        )

    def shuffle(self, rng: T.Optional[np.random.Generator] = None):
        rng = rng or self.rng
        order = rng.permutation(len(self.files))
        self.files = [self.files[i] for i in order]

    def index_select(self, indices: T.Sequence[int]) -> "ChipDataset":
        return self._subset([self.files[int(i)] for i in indices])

    # ------------------------------------------------------------------

    @staticmethod
    def _scale(values, clip_min: float, clip_max: float) -> np.ndarray:
        """1/10000 scaling for int16-packed chips; floats already in range
        pass through (reference datasets.py:443-446 always divides because
        its chips are always packed). Pure numpy — no device sync on the
        hot loading path."""
        arr = np.asarray(values)
        if np.issubdtype(arr.dtype, np.integer) or (
            float(arr.max()) > 2.0 if arr.size else False
        ):
            arr = arr.astype(np.float32) / SCALE_FACTOR
        return np.clip(arr.astype(np.float32), clip_min, clip_max)

    def load_file(self, path: Path) -> Batch:
        if self.preload:
            cached = self._cache.get(path)
            if cached is None:
                cached = Batch.from_file(path)
                self._cache[path] = cached
            # defensive array copies: augmenters must not touch the cache
            return cached.replace(
                x=np.array(cached.x),
                y=None if cached.y is None else np.array(cached.y),
                bdist=(
                    None if cached.bdist is None else np.array(cached.bdist)
                ),
            )
        return Batch.from_file(path)

    def __getitem__(self, idx: int) -> Batch:
        # The whole per-sample pipeline is host work: jnp ops (augmenters,
        # normalization) are pinned to the CPU backend so nothing touches
        # the accelerator until the per-batch device_put.
        from ..utils.host import host_context

        with host_context():
            return self._get_host(idx)

    def _get_host(self, idx: int) -> Batch:
        batch = self.load_file(self.files[int(idx)])

        batch = batch.replace(x=self._scale(batch.x, 1e-9, 1.0))
        if batch.bdist is not None:
            batch = batch.replace(bdist=self._scale(batch.bdist, 1e-9, 1.0))

        if batch.y is not None and self.augment_prob > 0:
            if self.rng.random() > (1.0 - self.augment_prob):
                from ..augment import Augmenters

                aug_name = str(self.rng.choice(self.augmentations))
                batch = Augmenters([aug_name], rng=self.rng)(batch)

        if self.log_transform:
            # Dynamic World log transform (reference datasets.py:481-484)
            batch = batch.replace(
                x=jnp.maximum(jnp.log(batch.x * 50.0 + 1.0), 1e-9)
            )

        if self.norm_values is not None:
            batch = self.norm_values(batch)

        return batch.with_centroids()

    # ------------------------------------------------------------------

    def centroids(self) -> np.ndarray:
        """(N, 2) lon/lat chip centroids from geo bounds (metadata-only read)."""
        points = np.zeros((len(self.files), 2), dtype=np.float64)
        for i, path in enumerate(self.files):
            batch = Batch.read_meta(path)
            if batch.left is None:
                continue
            points[i, 0] = float(batch.left[0] + batch.right[0]) / 2.0
            points[i, 1] = float(batch.bottom[0] + batch.top[0]) / 2.0
        return points

    def split_train_val(
        self,
        val_frac: float,
        spatial_balance: bool = False,
        rng: T.Optional[np.random.Generator] = None,
    ) -> T.Tuple["ChipDataset", "ChipDataset"]:
        """Random or spatially balanced train/val split
        (reference datasets.py:368-430)."""
        rng = rng or self.rng
        n = len(self.files)
        num_val = max(1, int(round(n * val_frac)))

        if spatial_balance:
            val_idx = spatially_balanced_sample(
                self.centroids(), num_val, rng=rng
            )
        else:
            val_idx = np.sort(rng.permutation(n)[:num_val])

        val_mask = np.zeros(n, dtype=bool)
        val_mask[val_idx] = True
        train_files = [f for f, v in zip(self.files, val_mask) if not v]
        val_files = [f for f, v in zip(self.files, val_mask) if v]

        val_ds = self._subset(val_files)
        val_ds.augment_prob = 0.0  # no augmentation on validation
        return self._subset(train_files), val_ds

    # -- named spatial partitions (reference datasets.py:177-259) -------

    def get_spatial_partitions(
        self, spatial_partitions: T.Union[str, Path]
    ) -> T.List[T.Tuple[str, T.Any]]:
        """Load a user partition polygon file (GeoPackage or GeoJSON) as
        (partition attributes, exterior ring) features. Partition
        coordinates must share the chips' CRS (the reference reprojects
        via geopandas; no GDAL here).
        """
        from .vector import read_feature_table

        self.spatial_partitions = read_feature_table(spatial_partitions)
        return self.spatial_partitions

    def query_partition_by_name(
        self,
        partition_column: str,
        partition_name: str,
    ) -> T.List[int]:
        """Chip indices whose centroid falls inside the named partition
        polygon(s) (reference datasets.py:202-237)."""
        from .vector import points_in_ring

        assert getattr(self, "spatial_partitions", None) is not None, (
            "call get_spatial_partitions(file) first"
        )
        rings = [
            ring
            for ring, props in self.spatial_partitions
            if str(props.get(partition_column)) == str(partition_name)
        ]
        if not rings:
            return []
        points = self.centroids()
        inside = np.zeros(len(points), dtype=bool)
        for ring in rings:
            inside |= points_in_ring(points, ring)
        return np.nonzero(inside)[0].tolist()

    def split_by_partition(
        self,
        spatial_partitions: T.Union[str, Path],
        partition_name: str,
        partition_column: str = "name",
    ) -> T.Tuple["ChipDataset", "ChipDataset"]:
        """Train/val split by a named partition: chips inside the named
        polygon(s) validate, the rest train (reference split_indices,
        datasets.py:239-258)."""
        self.get_spatial_partitions(spatial_partitions)
        val_idx = self.query_partition_by_name(
            partition_column, partition_name
        )
        if not val_idx:
            raise ValueError(
                f"Partition {partition_name!r} contains no chips"
            )
        val_mask = np.zeros(len(self.files), dtype=bool)
        val_mask[val_idx] = True
        train_files = [f for f, v in zip(self.files, val_mask) if not v]
        val_files = [f for f, v in zip(self.files, val_mask) if v]
        val_ds = self._subset(val_files)
        val_ds.augment_prob = 0.0
        return self._subset(train_files), val_ds

    def partition_kfoldcv_iter(
        self,
        spatial_partitions: T.Union[str, Path],
        partition_column: str = "name",
    ) -> T.Iterator[T.Tuple[str, "ChipDataset", "ChipDataset"]]:
        """Yield one fold per named partition polygon (reference
        spatial_kfoldcv_iter over partitions, datasets.py:259-273)."""
        self.get_spatial_partitions(spatial_partitions)
        names = []
        for _, props in self.spatial_partitions:
            name = props.get(partition_column)
            if name is not None and name not in names:
                names.append(name)
        for name in names:
            try:
                train_ds, val_ds = self.split_by_partition(
                    spatial_partitions, name, partition_column
                )
            except ValueError:
                continue
            yield str(name), train_ds, val_ds

    def spatial_kfoldcv_iter(
        self, k: int, rng: T.Optional[np.random.Generator] = None
    ) -> T.Iterator[T.Tuple[str, "ChipDataset", "ChipDataset"]]:
        """Yield (fold_name, train_ds, val_ds) over spatial folds
        (reference datasets.py:259-273)."""
        folds = spatial_kfold_indices(self.centroids(), k, rng=rng)
        for fold_num, fold_idx in enumerate(folds):
            mask = np.zeros(len(self.files), dtype=bool)
            mask[fold_idx] = True
            train_files = [f for f, m in zip(self.files, mask) if not m]
            val_files = [f for f, m in zip(self.files, mask) if m]
            if not train_files or not val_files:
                continue
            val_ds = self._subset(val_files)
            val_ds.augment_prob = 0.0
            yield f"fold{fold_num}", self._subset(train_files), val_ds

    def check_dims(
        self,
        expected_time: T.Optional[int] = None,
        expected_channels: T.Optional[int] = None,
        expected_height: T.Optional[int] = None,
        expected_width: T.Optional[int] = None,
        num_workers: int = 4,
        delete_mismatches: bool = False,
    ) -> T.List[Path]:
        """Parallel shape audit (reference datasets.py:274-367). Returns the
        mismatching files (optionally deleting them). Height/width are only
        checked when explicitly expected (reference expected_height/width
        args); time/channels default to the first readable chip."""
        ref_time = expected_time
        ref_channels = expected_channels

        def audit(path: Path):
            try:
                batch = self.load_file(path)
                return (
                    path,
                    batch.num_time,
                    batch.num_channels,
                    batch.height,
                    batch.width,
                )
            except Exception:
                return path, -1, -1, -1, -1

        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            results = list(pool.map(audit, self.files))

        if ref_time is None or ref_channels is None:
            for _, t, c, _, _ in results:
                if t > 0:
                    ref_time = ref_time or t
                    ref_channels = ref_channels or c
                    break

        mismatched = [
            path
            for path, t, c, h, w in results
            if (t, c) != (ref_time, ref_channels)
            or (expected_height is not None and h != expected_height)
            or (expected_width is not None and w != expected_width)
        ]
        if mismatched and delete_mismatches:
            for path in mismatched:
                path.unlink(missing_ok=True)
            self.files = [f for f in self.files if f not in set(mismatched)]
        elif mismatched:
            raise TensorShapeError(
                f"{len(mismatched)} chips have mismatched dims "
                f"(expected T={ref_time}, C={ref_channels}): "
                f"{[p.name for p in mismatched[:5]]}..."
            )
        return mismatched

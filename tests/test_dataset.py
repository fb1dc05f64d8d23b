"""Dataset + normalization pipeline tests (modeled on the reference's
tests/test_dataset.py, test_norm.py, test_data_splits.py)."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from cultionet_tpu.data import (
    Batch,
    ChipDataset,
    ChipLoader,
    SCALE_FACTOR,
    collate,
    create_batch,
)
from cultionet_tpu.utils.normalize import NormValues
from cultionet_tpu.utils.stats import Quantile, Variance


def temporary_dataset(tmp_path, num_samples=10, seed=100, **kwargs):
    rng = np.random.default_rng(seed)
    processed = Path(tmp_path) / "processed"
    for _ in range(num_samples):
        batch = create_batch(rng=rng)
        batch.to_file(processed / batch.batch_id[0])
    return ChipDataset(tmp_path, **kwargs)


def test_batch_file_roundtrip(tmp_path):
    batch = create_batch(rng=np.random.default_rng(0))
    path = Path(tmp_path) / "chip.npz"
    batch.to_file(path)
    loaded = Batch.from_file(path)
    np.testing.assert_allclose(np.asarray(loaded.x), np.asarray(batch.x))
    np.testing.assert_array_equal(np.asarray(loaded.y), np.asarray(batch.y))
    assert loaded.batch_id == batch.batch_id


def test_reference_pt_chip_reader(tmp_path):
    """Read a joblib .pt chip in the reference's (B, C, T, H, W) layout."""
    joblib = pytest.importorskip("joblib")
    rng = np.random.default_rng(1)
    x_ref = (rng.random((1, 3, 12, 10, 10)) * SCALE_FACTOR).astype("int16")
    stored = {
        "x": x_ref,
        "y": rng.integers(-1, 3, size=(1, 10, 10)),
        "bdist": (rng.random((1, 10, 10)) * SCALE_FACTOR).astype("int16"),
        "left": np.array([10.0]),
        "bottom": np.array([40.0]),
        "right": np.array([10.1]),
        "top": np.array([40.1]),
    }
    path = Path(tmp_path) / "processed" / "data_000001_2022_none.pt"
    path.parent.mkdir(parents=True)
    joblib.dump(stored, path)

    ds = ChipDataset(tmp_path)
    assert len(ds) == 1
    batch = ds[0]
    assert batch.x.shape == (1, 12, 10, 10, 3)  # (B, T, H, W, C)
    assert float(batch.x.max()) <= 1.0
    assert float(batch.x.min()) >= float(np.float32(1e-9))
    assert float(batch.lon[0]) == pytest.approx(10.05)


def test_dataset_iteration_and_scaling(tmp_path):
    ds = temporary_dataset(tmp_path, num_samples=6)
    assert len(ds) == 6
    batch = ds[0]
    assert float(batch.x.min()) >= float(np.float32(1e-9))
    assert float(batch.x.max()) <= 1.0
    assert batch.lat is not None and batch.lon is not None


def test_loader_collates(tmp_path):
    ds = temporary_dataset(tmp_path, num_samples=7)
    loader = ChipLoader(ds, batch_size=3, shuffle=True)
    batches = list(loader)
    assert len(loader) == 3
    assert batches[0].x.shape[0] == 3
    total = sum(b.x.shape[0] for b in batches)
    assert total == 7
    assert len(batches[0].batch_id) == 3


def test_norm_values_roundtrip_and_transform(tmp_path):
    ds = temporary_dataset(tmp_path, num_samples=8)
    loader = ChipLoader(ds, batch_size=4)
    norm = NormValues.from_dataset(
        loader, class_info={"max_crop_class": 1, "edge_class": 2}
    )
    assert norm.num_channels == 3
    assert norm.dataset_crop_counts.shape == (2,)

    batch = ds[0]
    transformed = norm(batch)
    # z-scored values should differ and have reduced offset
    assert not np.allclose(np.asarray(transformed.x), np.asarray(batch.x))
    back = norm.inverse_transform(transformed)
    np.testing.assert_allclose(
        np.asarray(back.x), np.asarray(batch.x), rtol=1e-4, atol=1e-5
    )

    path = Path(tmp_path) / "last.norm.npz"
    norm.to_file(path)
    restored = NormValues.from_file(path)
    np.testing.assert_allclose(restored.dataset_mean, norm.dataset_mean)
    np.testing.assert_allclose(restored.dataset_std, norm.dataset_std)


def test_norm_values_closed_form():
    """z-score parity against closed-form stats (reference test_norm.py)."""
    rng = np.random.default_rng(0)
    data = rng.normal(loc=3.0, scale=2.0, size=(100_000, 2))

    var = Variance(method="median")
    q = Quantile(r=6144)
    for chunk in np.array_split(data, 10):
        var.add(chunk)
        q.add(chunk)

    np.testing.assert_allclose(var.std(), data.std(axis=0, ddof=1), rtol=0.01)
    np.testing.assert_allclose(
        q.median(), np.median(data, axis=0), atol=0.05
    )
    np.testing.assert_allclose(
        q.quantiles(0.05), np.quantile(data, 0.05, axis=0), atol=0.12
    )


def test_train_val_split(tmp_path):
    ds = temporary_dataset(tmp_path, num_samples=20)
    train_ds, val_ds = ds.split_train_val(val_frac=0.2)
    assert len(train_ds) == 16
    assert len(val_ds) == 4
    assert set(train_ds.files).isdisjoint(set(val_ds.files))
    assert val_ds.augment_prob == 0.0


def test_spatial_split_and_kfold(tmp_path):
    ds = temporary_dataset(tmp_path, num_samples=24)
    train_ds, val_ds = ds.split_train_val(val_frac=0.25, spatial_balance=True)
    assert len(val_ds) == 6
    assert set(train_ds.files).isdisjoint(set(val_ds.files))

    folds = list(ds.spatial_kfoldcv_iter(k=4))
    assert len(folds) >= 2
    all_val_files = [f for _, _, val in folds for f in val.files]
    assert len(all_val_files) == 24  # every chip in exactly one fold
    assert len(set(all_val_files)) == 24


def test_check_dims(tmp_path):
    ds = temporary_dataset(tmp_path, num_samples=4)
    assert ds.check_dims() == []

    # Corrupt one file with different time steps
    rng = np.random.default_rng(9)
    bad = create_batch(num_time=5, rng=rng)
    bad_path = Path(tmp_path) / "processed" / "data_zzz_bad.npz"
    bad.to_file(bad_path)
    ds2 = ChipDataset(tmp_path)
    mismatched = ds2.check_dims(
        expected_time=12, expected_channels=3, delete_mismatches=True
    )
    assert len(mismatched) == 1
    assert not bad_path.exists()


def test_dataset_augmentation_probability(tmp_path):
    ds = temporary_dataset(
        tmp_path, num_samples=3, augment_prob=1.0, random_seed=7
    )
    raw_ds = ChipDataset(ds.root, augment_prob=0.0)
    changed = 0
    for i in range(len(ds)):
        if not np.allclose(
            np.asarray(ds[i].x), np.asarray(raw_ds[i].x), atol=1e-7
        ):
            changed += 1
    assert changed >= 1


def test_kll_sketch_accuracy_and_state():
    """KLL sketch: rank error stays bounded on long, drifting streams
    (where a uniform reservoir's variance grows), and state round-trips."""
    rng = np.random.default_rng(5)
    q = Quantile(r=1024, seed=1)
    # 400k items with distribution drift across the stream
    chunks = []
    for i in range(20):
        chunk = rng.normal(loc=i * 0.1, scale=1.0, size=(20_000, 3))
        chunks.append(chunk)
        q.add(chunk)
    data = np.concatenate(chunks)

    for prob, tol in [(0.05, 0.05), (0.5, 0.05), (0.95, 0.05)]:
        est = q.quantiles(prob)
        # compare by RANK error (the KLL guarantee), not value error
        for c in range(3):
            rank = (data[:, c] <= est[c]).mean()
            assert abs(rank - prob) < tol, (prob, c, rank)

    # vector query shape + monotonicity
    qs = q.quantiles([0.05, 0.5, 0.95])
    assert qs.shape == (3, 3)
    assert (np.diff(qs, axis=0) >= 0).all()

    # state round-trip preserves estimates exactly
    q2 = Quantile(r=1024)
    q2.load_state_dict(q.state_dict())
    np.testing.assert_allclose(q2.quantiles(0.5), q.quantiles(0.5))
    np.testing.assert_allclose(q2.mean(), q.mean())


def test_to_dataset_payload_reference_fields():
    """Batch.to_dataset export contract (reference data/data.py:278-318):
    bands/labels/distances over channel/time/y/x, top->bottom y coords.
    Payload is validated structurally; the xarray wrapper is import-gated
    (xarray is not bundled in this image)."""
    batch = create_batch(num_channels=3, num_time=5, height=8, width=10)
    batch = batch.replace(
        left=np.asarray([100.0]),
        bottom=np.asarray([200.0]),
        right=np.asarray([110.0]),
        top=np.asarray([208.0]),
        batch_id=("chip_0.npz",),
    )
    payload = batch._dataset_payload()
    assert set(payload["data_vars"]) == {"bands", "labels", "distances"}
    dims, bands = payload["data_vars"]["bands"]
    assert dims == ["channel", "time", "y", "x"]
    assert bands.shape == (3, 5, 8, 10)
    np.testing.assert_allclose(
        bands[2, 4], np.asarray(batch.x)[0, 4, :, :, 2]
    )
    dims_y, labels = payload["data_vars"]["labels"]
    assert dims_y == ["y", "x"] and labels.shape == (8, 10)
    coords = payload["coords"]
    assert list(coords["channel"]) == [1, 2, 3]
    assert list(coords["time"]) == [1, 2, 3, 4, 5]
    assert coords["y"][0] == 208.0 and coords["y"][-1] == 200.0  # top->bottom
    assert coords["x"][0] == 100.0 and coords["x"][-1] == 110.0
    assert payload["attrs"]["name"] == "chip_0.npz"
    assert payload["attrs"]["_FillValue"] == -1

    try:
        import xarray  # noqa: F401
    except ImportError:
        import pytest

        with pytest.raises(ImportError, match="xarray"):
            batch.to_dataset()
    else:
        ds = batch.to_dataset()
        assert set(ds.data_vars) == {"bands", "labels", "distances"}

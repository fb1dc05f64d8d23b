"""Offline data engineering + large-scene predict pipeline tests (reference
tests/_test_create_dataset.py pattern on synthetic scenes)."""

from pathlib import Path

import numpy as np
import pytest

from cultionet_tpu.data.create import (
    BatchStore,
    create_predict_dataset,
    create_train_batch,
    is_grid_processed,
)
from cultionet_tpu.data.datasets import ChipDataset
from cultionet_tpu.data.label_math import (
    cleanup_edges,
    edge_gradient,
    fillz,
    normalize_boundary_distances,
    polygons_to_array,
)

pytestmark = pytest.mark.slow


def square_polygon(x0, y0, x1, y1):
    return np.asarray(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype="float64"
    )


BOUNDS = (0.0, 0.0, 100.0, 100.0)  # 100x100 @ 1.0 res


def test_polygons_to_array():
    arr = polygons_to_array(
        [(square_polygon(10, 10, 30, 30), 1)],
        bounds=BOUNDS,
        out_shape=(100, 100),
    )
    assert arr.dtype == np.uint8
    assert arr[80, 20] == 1  # y=10..30 -> rows 70..90
    assert arr[20, 20] == 0
    assert 350 <= arr.sum() <= 500  # ~20x20 square


def test_edge_gradient_and_cleanup():
    labels = np.zeros((50, 50), dtype="uint8")
    labels[10:20, 10:20] = 1
    edges = edge_gradient(labels)
    assert edges.max() == 1
    assert edges[10, 10] == 1  # boundary pixel
    assert edges[15, 15] == 0  # interior

    arr = labels.copy().astype("int16")
    arr[edges == 1] = 2
    cleaned = cleanup_edges(arr, labels, edge_class=2)
    assert set(np.unique(cleaned)) <= {0, 1, 2}


def test_normalize_boundary_distances():
    labels = np.zeros((50, 50), dtype="uint8")
    labels[5:20, 5:20] = 1
    labels[30:45, 30:45] = 1
    bdist, ori = normalize_boundary_distances(labels, "Polygon", 1.0)
    assert bdist.max() <= 1.0
    assert bdist.min() >= 0.0
    # Each segment normalized to its own max of 1
    assert bdist[12, 12] == pytest.approx(1.0, abs=1e-6)
    assert bdist[37, 37] == pytest.approx(1.0, abs=1e-6)
    assert ori.min() >= 0 and ori.max() <= 1


def test_fillz():
    x = np.ones((2, 1, 5, 5), dtype="float64")
    x[0, 0, 2, 2] = 0.0
    filled = fillz(x)
    assert filled[0, 0, 2, 2] > 0


def test_create_train_batch(tmp_path):
    rng = np.random.default_rng(0)
    ts = (rng.random((6, 100, 100, 3)) * 10000).astype("int16")
    polygons = [
        (square_polygon(10, 10, 40, 40), 1),
        (square_polygon(55, 55, 90, 85), 1),
    ]
    out = create_train_batch(
        image_time_series=ts,
        polygons=polygons,
        bounds=BOUNDS,
        cell_res=1.0,
        region="000001",
        process_path=tmp_path / "processed",
        max_crop_class=1,
    )
    assert out is not None and out.exists()

    # Idempotency
    again = create_train_batch(
        image_time_series=ts,
        polygons=polygons,
        bounds=BOUNDS,
        cell_res=1.0,
        region="000001",
        process_path=tmp_path / "processed",
        max_crop_class=1,
    )
    assert again is None
    assert is_grid_processed(tmp_path / "processed", ["none"], "000001", "0", "1")

    ds = ChipDataset(tmp_path)
    batch = ds[0]
    assert batch.x.shape == (1, 6, 100, 100, 3)
    y = np.asarray(batch.y[0])
    assert set(np.unique(y)) <= {0, 1, 2}
    assert (y == 1).sum() > 100  # crop interior
    assert (y == 2).sum() > 50  # edges
    bd = np.asarray(batch.bdist[0])
    assert bd.max() <= 1.0


def test_create_predict_dataset_and_stitch(tmp_path):
    rng = np.random.default_rng(1)
    scene = rng.random((6, 75, 130, 2)).astype("float32")
    paths = create_predict_dataset(
        image_time_series=scene,
        region="r1",
        process_path=tmp_path / "predict" / "processed",
        window_size=50,
        padding=10,
        num_workers=2,
    )
    # 2 rows x 3 cols of windows
    assert len(paths) == 6
    ds = ChipDataset(tmp_path / "predict")
    assert len(ds) == 6
    chip = ds.load_file(ds.files[0])
    assert chip.x.shape[2] == 70  # 50 + 2*10
    assert chip.window_row_off is not None

    # Stitch with a tiny model
    from cultionet_tpu.models import CultioNet
    from cultionet_tpu.predict import ScenePredictor
    from cultionet_tpu.train.optim import build_optimizer
    from cultionet_tpu.train.step import create_train_state

    model = CultioNet(
        in_time=6, hidden_channels=4, attention_weights=None, dilations=[1]
    )
    state = create_train_state(
        model, build_optimizer("AdamW", 1e-3), ds[0], seed=0
    )
    predictor = ScenePredictor(state, batch_size=3)
    raster, (scene_h, scene_w) = predictor.predict_windows(ds)
    assert (scene_h, scene_w) == (75, 130)
    assert raster.shape == (75, 130, 3)
    assert np.isfinite(raster).all()
    assert raster.min() >= 0.0 and raster.max() <= 1.0

    out = predictor.predict_to_raster(ds, tmp_path / "out.tif")
    assert out.exists()
    # without rasterio: a REAL GeoTIFF (pure-python codec) + npz sidecar
    from cultionet_tpu.data.tiny_tiff import read_tiff

    raster_tif, *_ = read_tiff(out)
    assert raster_tif.shape == (3, 75, 130)
    assert raster_tif.dtype == np.uint16
    data = np.load(out.with_suffix(".npz"))
    assert data["raster"].shape == (3, 75, 130)
    assert data["raster"].dtype == np.uint16
    np.testing.assert_array_equal(data["raster"], raster_tif)


def test_create_predict_processes_match_threads(tmp_path):
    """The fork process pool writes the same windows as the thread pool
    (reference Ray+dask scheduler, create.py:216-246)."""
    import hashlib

    rng = np.random.default_rng(3)
    scene = rng.random((4, 60, 90, 2)).astype("float32")

    def run(mode, sub):
        paths = create_predict_dataset(
            image_time_series=scene,
            region="rp",
            process_path=tmp_path / sub / "processed",
            window_size=40,
            padding=5,
            num_workers=3,
            use_processes=mode,
        )
        h = hashlib.sha256()
        for f in sorted(paths):
            h.update(Path(f).name.encode())
            with np.load(f, allow_pickle=False) as z:
                for k in sorted(z.files):
                    h.update(k.encode())
                    h.update(np.ascontiguousarray(z[k]).tobytes())
        return len(paths), h.hexdigest()

    n_thread, d_thread = run(False, "threads")
    n_proc, d_proc = run(True, "procs")
    assert n_thread == n_proc == 6  # 2 rows x 3 cols at 40 px windows
    assert d_thread == d_proc


def test_predict_scene_in_memory_matches_file_path(tmp_path):
    """ScenePredictor.predict_scene (no chip files) stitches the same
    raster as create_predict_dataset -> predict_windows (the reference's
    two-stage flow, create.py:114-246 + callbacks.py:148-227)."""
    from cultionet_tpu.models import CultioNet
    from cultionet_tpu.predict import ScenePredictor
    from cultionet_tpu.train.optim import build_optimizer
    from cultionet_tpu.train.step import create_train_state

    rng = np.random.default_rng(7)
    scene = rng.random((5, 70, 110, 2)).astype("float32")

    paths = create_predict_dataset(
        image_time_series=scene,
        region="mem",
        process_path=tmp_path / "predict" / "processed",
        window_size=50,
        padding=10,
        num_workers=1,
    )
    assert len(paths) == 6
    ds = ChipDataset(tmp_path / "predict")
    model = CultioNet(
        in_time=5, hidden_channels=4, attention_weights=None, dilations=[1]
    )
    state = create_train_state(
        model, build_optimizer("AdamW", 1e-3), ds[0], seed=0
    )
    predictor = ScenePredictor(state, batch_size=4)
    file_raster, (h, w) = predictor.predict_windows(ds)

    mem_raster, (mh, mw) = predictor.predict_scene(
        scene, window_size=50, padding=10
    )
    assert (mh, mw) == (h, w) == (70, 110)
    # The two paths trace different programs (float-x vs the clip/scale
    # fused file pipeline), so XLA reassociation leaves ~1e-5 noise that
    # a random-init net amplifies; exact trained-model parity is the
    # golden-raster gate's job (tests/test_golden_raster.py).
    np.testing.assert_allclose(mem_raster, file_raster, atol=1e-4)

    # The per-batch host-slicing path (what multi-device predictions use)
    # must agree with the fused whole-scene scan — same windows, same
    # taper blend, different program structure.
    nonfused_raster, _ = predictor.predict_scene(
        scene, window_size=50, padding=10, fused=False
    )
    np.testing.assert_allclose(nonfused_raster, mem_raster, atol=1e-4)

    # int16 x 10000 scenes ride packed and dequantize in-step
    packed_scene = np.round(scene * 10000.0).astype("int16")
    packed_raster, _ = predictor.predict_scene(
        packed_scene, window_size=50, padding=10
    )
    # int16 packing quantizes inputs at 1e-4 resolution (5e-5 half-quantum
    # deltas), which the random-init network amplifies ~30x; anything
    # structurally wrong (scale, offsets, stitching) would be O(0.1).
    np.testing.assert_allclose(packed_raster, file_raster, atol=5e-3)

"""The create/partition CLI tail (VERDICT r2 #6/#7/#9): mixed-resolution
resampling, crop-column/replace-dict class handling, grid-size guard,
zero-padding, all_touched rasterization, named spatial partitions, chip
preloading, and the reference-image predict profile."""

import json
from pathlib import Path

import numpy as np
import pytest

from cultionet_tpu.data.create import create_train_batch
from cultionet_tpu.data.datasets import ChipDataset
from cultionet_tpu.data.geotiff import read_time_series, resample_frame
from cultionet_tpu.data.label_math import polygons_to_array
from cultionet_tpu.data.synthetic import create_batch
from cultionet_tpu.data.tiny_tiff import write_tiff
from cultionet_tpu.data.vector import (
    points_in_ring,
    read_region_polygons,
)


def test_resample_frame_nearest_and_bilinear():
    frame = np.arange(16, dtype=np.float32).reshape(4, 4)
    up = resample_frame(frame, (8, 8), method="nearest")
    assert up.shape == (8, 8)
    # nearest keeps original values only
    assert set(np.unique(up)) <= set(np.unique(frame))
    bil = resample_frame(frame, (8, 8), method="bilinear")
    assert bil.shape == (8, 8)
    # bilinear preserves the mean and range
    assert abs(bil.mean() - frame.mean()) < 0.5
    assert bil.min() >= frame.min() and bil.max() <= frame.max()
    # identity
    np.testing.assert_array_equal(
        resample_frame(frame, (4, 4), method="bilinear"), frame
    )
    with pytest.raises(ValueError):
        resample_frame(frame, (2, 2), method="cubic")


def test_read_time_series_mixed_resolution(tmp_path):
    """10 m and 20 m bands stack onto one ref_res grid — the capability
    the reference gets from GDAL (create.py:568-570)."""
    bounds = (500000.0, 4000000.0, 500400.0, 4000400.0)  # 400 m square
    rng = np.random.default_rng(0)
    fine = tmp_path / "region" / "b10"
    coarse = tmp_path / "region" / "b20"
    fine.mkdir(parents=True)
    coarse.mkdir(parents=True)
    for date in ("2022001", "2022032"):
        write_tiff(
            fine / f"{date}.tif",
            (rng.random((40, 40)) * 10000).astype("uint16"),
            bounds=bounds,
            crs="EPSG:32615",
        )
        write_tiff(
            coarse / f"{date}.tif",
            (rng.random((20, 20)) * 10000).astype("uint16"),
            bounds=bounds,
            crs="EPSG:32615",
        )
    x, got_bounds, res, crs = read_time_series(
        tmp_path / "region", ref_res=10.0, resampling="bilinear"
    )
    assert x.shape == (2, 40, 40, 2)
    assert res == 10.0
    assert crs == "EPSG:32615"
    # without ref_res the coarse band resamples onto the first band's grid
    x2, *_ = read_time_series(tmp_path / "region")
    assert x2.shape == (2, 40, 40, 2)


def test_crop_column_and_replace_dict(tmp_path):
    region = tmp_path / "region"
    region.mkdir()
    square = [[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]]
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"class": 1, "cdl": 61},
                "geometry": {"type": "Polygon", "coordinates": [square]},
            }
        ],
    }
    (region / "polygons.geojson").write_text(json.dumps(fc))
    default = read_region_polygons(region)
    assert default[0][1] == 1  # auto-detected 'class'
    by_cdl = read_region_polygons(region, class_column="cdl")
    assert by_cdl[0][1] == 61
    recoded = read_region_polygons(
        region, class_column="cdl", replace_dict={61: 1}
    )
    assert recoded[0][1] == 1


def test_grid_size_guard_and_zero_padding(tmp_path):
    rng = np.random.default_rng(3)
    x = rng.random((4, 20, 20, 2)).astype("float32")
    square = np.array(
        [[2.0, 2.0], [2.0, 12.0], [12.0, 12.0], [12.0, 2.0], [2.0, 2.0]]
    )
    bounds = (0.0, 0.0, 20.0, 20.0)
    with pytest.raises(ValueError, match="grid-size"):
        create_train_batch(
            image_time_series=x,
            polygons=[(square, 1)],
            bounds=bounds,
            cell_res=1.0,
            region="g1",
            process_path=tmp_path / "processed",
            grid_size=(32, 32),
        )
    out = create_train_batch(
        image_time_series=x,
        polygons=[(square, 1)],
        bounds=bounds,
        cell_res=1.0,
        region="g2",
        process_path=tmp_path / "processed",
        grid_size=(20, 20),
        zero_padding=5,
    )
    from cultionet_tpu.data.batch import Batch

    chip = Batch.from_file(out)
    assert chip.x.shape[2:4] == (30, 30)  # 20 + 2*5
    assert chip.y.shape[1:] == (30, 30)
    # padded border is background / zero signal
    assert np.all(np.asarray(chip.y)[0, :5, :] == 0)
    assert float(np.asarray(chip.bdist)[0, :5, :].max()) == 0.0
    # bounds grew by the pad
    assert float(chip.left[0]) == -5.0 and float(chip.top[0]) == 25.0


def test_all_touched_burns_outline():
    # thin sliver polygon: center-only rasterization drops pixels the
    # outline touches; all_touched keeps them
    ring = np.array(
        [[0.2, 0.2], [0.2, 8.8], [1.2, 8.8], [1.2, 0.2], [0.2, 0.2]]
    )
    bounds = (0.0, 0.0, 10.0, 10.0)
    center_only = polygons_to_array(
        [(ring, 1)], bounds, (10, 10), all_touched=False
    )
    touched = polygons_to_array(
        [(ring, 1)], bounds, (10, 10), all_touched=True
    )
    assert touched.sum() >= center_only.sum()
    assert touched.sum() > 0


def test_points_in_ring():
    ring = np.array(
        [[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0], [0.0, 0.0]]
    )
    points = np.array([[5.0, 5.0], [15.0, 5.0], [-1.0, 2.0], [9.9, 9.9]])
    inside = points_in_ring(points, ring)
    np.testing.assert_array_equal(inside, [True, False, False, True])


def _partitioned_dataset(tmp_path):
    """6 chips on a row: x-centers 5, 15, ..., 55; partition 'west' covers
    the first three."""
    rng = np.random.default_rng(7)
    processed = tmp_path / "processed"
    for i in range(6):
        batch = create_batch(
            num_channels=2, num_time=6, height=8, width=8, rng=rng
        )
        batch = batch.replace(
            left=np.asarray([i * 10.0], dtype="float32"),
            right=np.asarray([i * 10.0 + 10.0], dtype="float32"),
            bottom=np.asarray([0.0], dtype="float32"),
            top=np.asarray([10.0], dtype="float32"),
        )
        batch.to_file(processed / f"data_{i:03d}.npz")
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"name": "west"},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[0, -5], [0, 15], [30, 15], [30, -5], [0, -5]]
                    ],
                },
            },
            {
                "type": "Feature",
                "properties": {"name": "east"},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[30, -5], [30, 15], [60, 15], [60, -5], [30, -5]]
                    ],
                },
            },
        ],
    }
    part_file = tmp_path / "partitions.geojson"
    part_file.write_text(json.dumps(fc))
    return ChipDataset(tmp_path), part_file


def test_named_spatial_partitions(tmp_path):
    ds, part_file = _partitioned_dataset(tmp_path)
    ds.get_spatial_partitions(part_file)
    west = ds.query_partition_by_name("name", "west")
    assert west == [0, 1, 2]
    train_ds, val_ds = ds.split_by_partition(part_file, "east")
    assert len(val_ds) == 3 and len(train_ds) == 3
    assert val_ds.augment_prob == 0.0
    # kfold over the named partitions: one fold per partition
    folds = list(ds.partition_kfoldcv_iter(part_file))
    assert [name for name, _, _ in folds] == ["west", "east"]
    for _, tr, va in folds:
        assert len(tr) == 3 and len(va) == 3


@pytest.mark.slow
def test_fit_with_partition_split(tmp_path):
    """fit() consumes spatial_partitions as the PATH it is typed as."""
    from cultionet_tpu.config import CultionetParams
    from cultionet_tpu.model import fit

    ds, part_file = _partitioned_dataset(tmp_path)
    params = CultionetParams(
        ckpt_file=tmp_path / "ckpt" / "last.ckpt",
        dataset=ds,
        spatial_partitions=str(part_file),
        partition_name="east",
        batch_size=3,
        hidden_channels=4,
        attention_weights=None,
        dilations=[1],
        epochs=1,
        precision="32",
    )
    result = fit(params)
    assert len(result.history) == 1
    assert np.isfinite(result.history[0]["val_loss"])


def test_preload_dataset_parity(tmp_path):
    rng = np.random.default_rng(11)
    processed = tmp_path / "processed"
    for i in range(3):
        create_batch(
            num_channels=2, num_time=4, height=8, width=8, rng=rng
        ).to_file(processed / f"data_{i:03d}.npz")
    cold = ChipDataset(tmp_path)
    warm = ChipDataset(tmp_path, preload=True)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(cold[i].x), np.asarray(warm[i].x)
        )
    # second pass hits the cache and is still correct
    np.testing.assert_allclose(
        np.asarray(cold[0].x), np.asarray(warm[0].x)
    )


@pytest.mark.slow
def test_predict_profile_from_reference_image(tmp_path):
    """--reference-image stamps the output bounds/CRS from a source tif
    (reference callbacks.py:85-107)."""
    from cultionet_tpu.data.create import create_predict_dataset
    from cultionet_tpu.data.tiny_tiff import read_tiff
    from cultionet_tpu.models import CultioNet
    from cultionet_tpu.predict import ScenePredictor
    from cultionet_tpu.train.optim import build_optimizer
    from cultionet_tpu.train.step import create_train_state

    rng = np.random.default_rng(1)
    scene = rng.random((6, 30, 30, 2)).astype("float32")
    create_predict_dataset(
        image_time_series=scene,
        region="r1",
        process_path=tmp_path / "predict" / "processed",
        window_size=30,
        padding=0,
        num_workers=1,
    )
    ds = ChipDataset(tmp_path / "predict")
    model = CultioNet(
        in_time=6, hidden_channels=4, attention_weights=None, dilations=[1]
    )
    state = create_train_state(
        model, build_optimizer("AdamW", 1e-3), ds[0], seed=0
    )
    ref_bounds = (300000.0, 5000000.0, 300300.0, 5000300.0)
    ref_img = tmp_path / "ref.tif"
    write_tiff(
        ref_img,
        np.zeros((30, 30), dtype="uint16"),
        bounds=ref_bounds,
        crs="EPSG:32611",
    )
    out = ScenePredictor(state, batch_size=2).predict_to_raster(
        ds, tmp_path / "out.tif", reference_image=ref_img
    )
    _, bounds, _, crs = read_tiff(out)
    assert crs == "EPSG:32611"
    np.testing.assert_allclose(bounds, ref_bounds)


def test_skip_index_and_feature_pattern(tmp_path):
    """skip_index thins the series (reference scripts/cultionet.py:342);
    feature_pattern resolves variable dirs per vegetation index
    (reference args.yml feature_pattern)."""
    bounds = (0.0, 0.0, 100.0, 100.0)
    rng = np.random.default_rng(3)
    root = tmp_path / "imagery"
    for vi in ("evi2", "gcvi"):
        d = root / "r7" / "ts" / "ms" / vi
        d.mkdir(parents=True)
        for date in ("2022001", "2022032", "2022060", "2022091"):
            write_tiff(
                d / f"{date}.tif",
                (rng.random((10, 10)) * 10000).astype("uint16"),
                bounds=bounds,
            )
    var_dirs = [
        root / "{region}/ts/ms/{image_vi}".format(region="r7", image_vi=vi)
        for vi in ("evi2", "gcvi")
    ]
    x, *_ = read_time_series(root / "r7", var_dirs=var_dirs)
    assert x.shape == (4, 10, 10, 2)
    x2, *_ = read_time_series(root / "r7", var_dirs=var_dirs, skip_index=2)
    assert x2.shape == (2, 10, 10, 2)
    np.testing.assert_allclose(x2, x[::2])
    with pytest.raises(FileNotFoundError):
        read_time_series(root / "r7", var_dirs=[root / "missing"])


def test_shift_scene_bbox_offsets():
    """_shift_scene crops the offset window, zero-filling beyond the
    scene (reference bbox_offsets, scripts/cultionet.py:233-263)."""
    from cultionet_tpu.scripts.cli import _parse_bbox_offsets, _shift_scene

    assert _parse_bbox_offsets(["0,100", "-50,0"]) == [
        (0.0, 100.0),
        (-50.0, 0.0),
    ]
    x = np.arange(4 * 4, dtype="float32").reshape(1, 4, 4, 1)
    # shift right by 1 map unit (res=1): window sees source cols 1..3
    shifted, b = _shift_scene(x, (0.0, 0.0, 4.0, 4.0), 1.0, (1.0, 0.0))
    np.testing.assert_allclose(
        shifted[0, :, :3, 0], x[0, :, 1:, 0]
    )
    np.testing.assert_allclose(shifted[0, :, 3, 0], 0.0)
    assert b == (1.0, 0.0, 5.0, 4.0)
    # shift up by 2: window top rows leave the scene -> zero fill rows 0-1
    shifted, b = _shift_scene(x, (0.0, 0.0, 4.0, 4.0), 1.0, (0.0, 2.0))
    np.testing.assert_allclose(shifted[0, :2], 0.0)
    np.testing.assert_allclose(shifted[0, 2:], x[0, :2])
    assert b == (0.0, 2.0, 4.0, 6.0)
    with pytest.raises(ValueError):
        _shift_scene(x, (0.0, 0.0, 4.0, 4.0), 1.0, (10.0, 0.0))

"""Data-parallel scene prediction: 8-device blending matches 1-device, and a
single-window scene reproduces the window's own prediction exactly."""

import numpy as np
import pytest

from cultionet_tpu.data.create import create_predict_dataset
from cultionet_tpu.data.datasets import ChipDataset
from cultionet_tpu.models import CultioNet
from cultionet_tpu.predict import ScenePredictor, taper_weights
from cultionet_tpu.train.optim import build_optimizer
from cultionet_tpu.train.step import create_train_state


@pytest.fixture(scope="module")
def scene_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("scene")
    rng = np.random.default_rng(2)
    scene = rng.random((6, 70, 110, 2)).astype("float32")
    create_predict_dataset(
        image_time_series=scene,
        region="r1",
        process_path=tmp / "predict" / "processed",
        window_size=40,
        padding=8,
        num_workers=2,
    )
    ds = ChipDataset(tmp / "predict")
    model = CultioNet(
        in_time=6, hidden_channels=4, attention_weights=None, dilations=[1]
    )
    state = create_train_state(
        model, build_optimizer("AdamW", 1e-3), ds[0], seed=0
    )
    return ds, state


def test_taper_weights_properties():
    w = np.asarray(taper_weights(40, 8))
    assert w.shape == (56, 56)
    assert np.allclose(w[8:48, 8:48], 1.0)  # interior
    assert w[0, 0] < 0.1  # corners near zero
    assert (w > 0).all()


def test_parallel_predict_matches_single(scene_setup):
    ds, state = scene_setup
    single = ScenePredictor(state, batch_size=8, devices=1)
    raster1, dims1 = single.predict_windows(ds)

    parallel = ScenePredictor(state, batch_size=8, devices=8)
    raster8, dims8 = parallel.predict_windows(ds)

    assert dims1 == dims8 == (70, 110)
    np.testing.assert_allclose(raster1, raster8, rtol=1e-4, atol=1e-5)


def test_fused_scene_predict_sharded_matches_single(scene_setup):
    """The fused whole-scene scan under an 8-device mesh (scene replicated,
    each device runs its 1/n slice of every window batch, one psum merges
    the partial blends) reproduces the single-device fused raster."""
    ds, state = scene_setup
    rng = np.random.default_rng(5)
    scene = np.round(rng.random((6, 70, 110, 2)) * 10000.0).astype("int16")

    single = ScenePredictor(state, batch_size=8, devices=1)
    raster1, dims1 = single.predict_scene(scene, window_size=40, padding=8)

    parallel = ScenePredictor(state, batch_size=8, devices=8)
    raster8, dims8 = parallel.predict_scene(scene, window_size=40, padding=8)

    assert dims1 == dims8 == (70, 110)
    np.testing.assert_allclose(raster1, raster8, rtol=1e-4, atol=1e-5)

    # And against the per-batch sharded (non-fused) path — same windows,
    # same taper blend, different program structure.
    raster_nf, _ = parallel.predict_scene(
        scene, window_size=40, padding=8, fused=False
    )
    np.testing.assert_allclose(raster_nf, raster8, rtol=1e-4, atol=1e-4)

    # Indivisible batch_size is rounded up to a device multiple (the extra
    # slots ride as valid=0 windows), not an error.
    odd = ScenePredictor(state, batch_size=6, devices=8)
    raster_odd, _ = odd.predict_scene(scene, window_size=40, padding=8)
    np.testing.assert_allclose(raster_odd, raster8, rtol=1e-4, atol=1e-5)


def test_single_window_scene_blend_is_identity(tmp_path):
    """With exactly one window, blending must reproduce the window interior."""
    rng = np.random.default_rng(3)
    scene = rng.random((6, 40, 40, 2)).astype("float32")
    create_predict_dataset(
        image_time_series=scene,
        region="solo",
        process_path=tmp_path / "predict" / "processed",
        window_size=40,
        padding=8,
        num_workers=1,
    )
    ds = ChipDataset(tmp_path / "predict")
    assert len(ds) == 1

    model = CultioNet(
        in_time=6, hidden_channels=4, attention_weights=None, dilations=[1]
    )
    state = create_train_state(
        model, build_optimizer("AdamW", 1e-3), ds[0], seed=1
    )
    predictor = ScenePredictor(state, batch_size=1)
    raster, _ = predictor.predict_windows(ds)

    outputs = predictor.predict_step(predictor.state, ds[0])
    direct = np.concatenate(
        [np.asarray(outputs[k][0]) for k in ("distance", "edge", "crop")],
        axis=-1,
    )
    # interior of the padded window = scene
    np.testing.assert_allclose(
        raster, direct[8:48, 8:48], rtol=1e-4, atol=1e-5
    )


def test_predict_raster_georeferencing(tmp_path):
    """Output raster carries the scene's geo metadata: bounds, derived
    affine transform, and CRS (reference stamps the reference image's
    profile, callbacks.py:85-107)."""
    rng = np.random.default_rng(9)
    scene = rng.random((6, 40, 60, 2)).astype("float32")
    bounds = (500000.0, 4100000.0, 500600.0, 4100400.0)  # 10 m pixels
    create_predict_dataset(
        image_time_series=scene,
        region="geo",
        process_path=tmp_path / "predict" / "processed",
        window_size=40,
        padding=4,
        bounds=bounds,
        num_workers=1,
    )
    ds = ChipDataset(tmp_path / "predict")
    model = CultioNet(
        in_time=6, hidden_channels=4, attention_weights=None, dilations=[1]
    )
    state = create_train_state(
        model, build_optimizer("AdamW", 1e-3), ds[0], seed=0
    )
    predictor = ScenePredictor(state, batch_size=4)
    out = predictor.predict_to_raster(
        ds, tmp_path / "out.tif", crs="EPSG:32633"
    )

    try:
        import rasterio

        with rasterio.open(out) as src:
            assert src.crs.to_string() == "EPSG:32633"
            assert tuple(src.bounds) == pytest.approx(bounds)
            assert src.transform.a == pytest.approx(10.0)
            assert src.transform.e == pytest.approx(-10.0)
    except ImportError:
        # pure-python fallback: a real 3-band GeoTIFF + npz sidecar
        from cultionet_tpu.data.tiny_tiff import read_tiff

        raster, tif_bounds, cell_res, tif_crs = read_tiff(out)
        assert raster.shape == (3, 40, 60) and raster.dtype == np.uint16
        np.testing.assert_allclose(tif_bounds, bounds)
        assert cell_res == pytest.approx(10.0)
        assert tif_crs == "EPSG:32633"
        data = np.load(out.with_suffix(".npz"))
        assert data["raster"].shape == (3, 40, 60)
        np.testing.assert_allclose(data["bounds"], bounds)
        # transform: (res_x, 0, left, 0, -res_y, top)
        np.testing.assert_allclose(
            data["transform"], [10.0, 0.0, 500000.0, 0.0, -10.0, 4100400.0]
        )
        assert str(data["crs"]) == "EPSG:32633"

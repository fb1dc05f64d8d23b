"""Golden-raster regression gate (reference tests/predict_large_model.py:
33-35): a trained checkpoint's stitched prediction raster must match the
frozen fixture on >= 99.9% of uint16 pixels. Fails if model numerics,
checkpoint restore, window blending, or the predict pipeline drift.

Parametrized over both temporal front ends (VERDICT r4 #6): the conv
encoder fixture lives in tests/data/golden/, the TemporalTransformer
fixture in tests/data/golden_transformer/ (sharing the conv fixture's
scene.npz). Fixtures are produced by experiments/make_golden.py.
"""

from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "data" / "golden"
GOLDEN_T = Path(__file__).parent / "data" / "golden_transformer"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not (GOLDEN / "golden.tif").is_file(),
        reason="golden fixtures not generated",
    ),
]


def encoder_dirs():
    dirs = [pytest.param(GOLDEN, id="conv")]
    dirs.append(
        pytest.param(
            GOLDEN_T,
            id="transformer",
            marks=pytest.mark.skipif(
                not (GOLDEN_T / "golden.tif").is_file(),
                reason="transformer golden fixtures not generated",
            ),
        )
    )
    return dirs


@pytest.mark.parametrize("golden_dir", encoder_dirs())
def test_prediction_matches_golden_raster(golden_dir):
    from cultionet_tpu.data.tiny_tiff import read_tiff

    from golden_utils import predict_scene

    golden, *_ = read_tiff(golden_dir / "golden.tif")
    raster = predict_scene(golden_dir, scene_dir=GOLDEN)
    assert raster.shape == golden.shape
    match = float(np.mean(raster == golden))
    # exact-pixel match fraction, the reference's gate threshold
    assert match >= 0.999, f"pixel match {match:.5f} < 0.999"


@pytest.mark.parametrize("golden_dir", encoder_dirs())
def test_fused_scene_predict_matches_golden_raster(golden_dir):
    """The fused whole-scene program (one lax.scan, scene resident in
    HBM) must reproduce the same golden raster as the chip-file path —
    the trained-model parity gate for ScenePredictor.predict_scene."""
    from cultionet_tpu.data.constant import SCALE_FACTOR
    from cultionet_tpu.data.tiny_tiff import read_tiff
    from cultionet_tpu.model import load_model
    from cultionet_tpu.predict import ScenePredictor

    golden, *_ = read_tiff(golden_dir / "golden.tif")
    with np.load(GOLDEN / "scene.npz", allow_pickle=False) as data:
        x = data["x"].astype(np.float32) / SCALE_FACTOR
    state, _ = load_model(golden_dir / "ckpt" / "last_store", which="last")
    predictor = ScenePredictor(state, batch_size=4)
    raster, _ = predictor.predict_scene(
        x, window_size=50, padding=10, fused=True
    )
    packed = np.moveaxis(
        np.clip(raster * SCALE_FACTOR, 0, 65535).astype("uint16"), -1, 0
    )
    assert packed.shape == golden.shape
    match = float(np.mean(packed == golden))
    assert match >= 0.999, f"pixel match {match:.5f} < 0.999"

"""Golden-raster regression gate (reference tests/predict_large_model.py:
33-35): a trained checkpoint's stitched prediction raster must match the
frozen fixture on >= 99.9% of uint16 pixels. Fails if model numerics,
checkpoint restore, window blending, or the predict pipeline drift.

Fixtures (tests/data/golden/) are produced by experiments/make_golden.py:
a small TowerUNet trained on the real-geometry USA chips, one frozen
scene cube, and the CPU fp32 prediction as the golden target.
"""

from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "data" / "golden"

pytestmark = pytest.mark.skipif(
    not (GOLDEN / "golden.tif").is_file(),
    reason="golden fixtures not generated",
)


def test_prediction_matches_golden_raster():
    from cultionet_tpu.data.tiny_tiff import read_tiff

    from golden_utils import predict_scene

    golden, *_ = read_tiff(GOLDEN / "golden.tif")
    raster = predict_scene(GOLDEN)
    assert raster.shape == golden.shape
    match = float(np.mean(raster == golden))
    # exact-pixel match fraction, the reference's gate threshold
    assert match >= 0.999, f"pixel match {match:.5f} < 0.999"

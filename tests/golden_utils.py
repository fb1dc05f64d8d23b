"""Shared predict path for the golden-raster gate (used by the test AND
experiments/make_golden.py so the fixture and the assertion run identical
code)."""

import tempfile
from pathlib import Path

import numpy as np


def predict_scene(
    golden_dir: Path, batch_size: int = 4, scene_dir: Path = None
) -> np.ndarray:
    """Checkpoint + frozen scene -> stitched 3-band uint16 raster.

    ``scene_dir`` overrides where scene.npz lives (the transformer golden
    shares the conv fixture's scene cube)."""
    from cultionet_tpu.data.create import create_predict_dataset
    from cultionet_tpu.data.datasets import ChipDataset
    from cultionet_tpu.model import load_model
    from cultionet_tpu.predict import ScenePredictor
    from cultionet_tpu.data.constant import SCALE_FACTOR

    golden_dir = Path(golden_dir)
    scene_dir = golden_dir if scene_dir is None else Path(scene_dir)
    with np.load(scene_dir / "scene.npz", allow_pickle=False) as data:
        x = data["x"].astype(np.float32) / SCALE_FACTOR

    state, _ = load_model(golden_dir / "ckpt" / "last_store", which="last")

    with tempfile.TemporaryDirectory() as tmp:
        create_predict_dataset(
            image_time_series=x,
            region="golden",
            process_path=Path(tmp) / "processed",
            window_size=50,
            padding=10,
            num_workers=1,
        )
        ds = ChipDataset(Path(tmp))
        predictor = ScenePredictor(state, batch_size=batch_size)
        raster, _ = predictor.predict_windows(ds)

    packed = np.clip(raster * SCALE_FACTOR, 0, 65535).astype("uint16")
    return np.moveaxis(packed, -1, 0)  # (3, H, W)

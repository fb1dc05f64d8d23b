"""Produce the golden-raster regression fixtures (VERDICT r2 #5, r4 #6).

Pattern: reference tests/predict_large_model.py:33-35 — a trained model's
stitched prediction raster frozen as a fixture, future runs must match
>= 99.9% of uint16 pixels exactly.

Fixtures written to tests/data/golden/ (conv front end) and
tests/data/golden_transformer/ (TemporalTransformer front end, sharing
the conv fixture's scene.npz):
  - scene.npz      int16 x 10000 scene cube for one real-geometry USA grid
  - ckpt/          orbax checkpoint of a small TowerUNet trained on the
                   USA chips (TPU, bf16; params stored fp32)
  - golden.tif     stitched 3-band uint16 raster predicted on CPU (fp32,
                   XLA NA path) — the deterministic CI target

Run from repo root:
  python experiments/make_golden.py [--encoder transformer]
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python experiments/make_golden.py predict [--encoder transformer]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

GOLDEN = Path(__file__).resolve().parents[1] / "tests" / "data" / "golden"
CHIPS = Path(__file__).resolve().parent / "usa_project/data/train/processed"
SCENE_REGION = "000001"


def golden_dir(encoder: str) -> Path:
    return GOLDEN if encoder == "conv" else GOLDEN.parent / (
        f"golden_{encoder}"
    )


def main(encoder: str = "conv"):
    out_dir = golden_dir(encoder)
    out_dir.mkdir(parents=True, exist_ok=True)

    from cultionet_tpu.config import CultionetParams
    from cultionet_tpu.data.datasets import ChipDataset
    from cultionet_tpu.model import fit

    # 1. small model, short training on the USA chips (real labels)
    dataset = ChipDataset(CHIPS.parent)
    assert len(dataset) >= 100, f"expected USA chips in {CHIPS}"
    params = CultionetParams(
        ckpt_file=out_dir / "ckpt" / "last.ckpt",
        dataset=dataset,
        val_frac=0.2,
        batch_size=8,
        edge_class=2,
        in_channels=3,
        in_time=13,
        hidden_channels=8,
        dropout=0.0,
        dilations=[1, 2],
        attention_weights="natten",
        temporal_encoder=encoder,
        epochs=2,
        learning_rate=0.01,
        weight_decay=1e-3,
        precision="16-mixed",
        random_seed=7,
    )
    result = fit(params)
    print("trained: best", result.best_score)

    # 2. freeze the scene cube (int16) for the golden grid — shared by
    # all encoder variants (only written with the conv fixture).
    if encoder == "conv":
        from cultionet_tpu.data.geotiff import read_time_series

        ts_dir = (
            Path(__file__).resolve().parent
            / "usa_project/time_series_vars"
            / SCENE_REGION
        )
        x, bounds, cell_res, crs = read_time_series(ts_dir)
        np.savez_compressed(
            GOLDEN / "scene.npz",
            x=np.round(x).astype(np.int16) if x.max() > 2 else np.round(
                x * 10000
            ).astype(np.int16),
            bounds=np.asarray(bounds, dtype="float64"),
            cell_res=np.asarray(cell_res),
            crs=np.asarray(str(crs)),
        )
        print("scene:", x.shape, x.dtype, bounds, crs)
    print(
        "NOW RUN the CPU golden step:\n"
        "  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu "
        f"python experiments/make_golden.py predict --encoder {encoder}\n"
        "(PALLAS_AXON_POOL_IPS= is required: the axon sitecustomize "
        "re-registers the TPU and overrides JAX_PLATFORMS=cpu)"
    )


def predict_golden(encoder: str = "conv"):
    """CPU fp32 predict -> tests/data/golden*/golden.tif."""
    sys.path.insert(
        0, str(Path(__file__).resolve().parents[1] / "tests")
    )
    from golden_utils import predict_scene  # noqa

    out_dir = golden_dir(encoder)
    raster = predict_scene(out_dir, scene_dir=GOLDEN)
    from cultionet_tpu.data.tiny_tiff import write_tiff

    write_tiff(out_dir / "golden.tif", raster)
    print("golden:", raster.shape, raster.dtype, raster.min(), raster.max())

    # Prune checkpoint legs the gate never reads (load_model which='last',
    # with_opt_state=False): 17 MB -> ~3 MB of fixtures.
    import shutil

    store = out_dir / "ckpt" / "last_store"
    shutil.rmtree(store / "best", ignore_errors=True)
    (store / "best.meta.json").unlink(missing_ok=True)
    shutil.rmtree(store / "last" / "opt", ignore_errors=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", nargs="?", default="train",
                    choices=["train", "predict"])
    ap.add_argument("--encoder", default="conv",
                    choices=["conv", "transformer"])
    args = ap.parse_args()
    if args.stage == "predict":
        predict_golden(args.encoder)
    else:
        main(args.encoder)

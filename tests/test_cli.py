"""CLI end-to-end: create -> train -> create-predict -> predict -> skfoldcv
(reference tests/test_train.py's CLI-subprocess variant, in-process)."""

import json
from pathlib import Path

import numpy as np
import pytest

from cultionet_tpu.scripts.cli import build_parser, main
from cultionet_tpu.scripts import cli


def make_project(tmp_path: Path, num_regions=3) -> Path:
    project = tmp_path / "project"
    rng = np.random.default_rng(0)
    for i in range(num_regions):
        region_dir = project / "time_series_vars" / f"{i:06d}"
        region_dir.mkdir(parents=True)
        x = (rng.random((6, 64, 64, 2)) * 10000).astype("int16")
        offset = 100.0 * i  # distinct geographies per region
        np.savez(
            region_dir / "scene.npz",
            x=x,
            bounds=np.asarray(
                [offset, offset, offset + 64.0, offset + 64.0]
            ),
            cell_res=np.asarray(1.0),
        )
        def ring(coords):
            return [[x + offset, y + offset] for x, y in coords]

        polygons = [
            [ring([[5, 5], [25, 5], [25, 25], [5, 25], [5, 5]]), 1],
            [
                ring([[35, 30], [60, 30], [60, 55], [35, 55], [35, 30]]),
                1,
            ],
        ]
        (region_dir / "polygons.json").write_text(json.dumps(polygons))
    return project


def run_cli(argv):
    import sys
    from unittest import mock

    with mock.patch.object(sys, "argv", ["cultionet-tpu"] + argv):
        main()


def test_parser_builds():
    parser = build_parser()
    args = parser.parse_args(["train", "-p", "/tmp/x", "--epochs", "3"])
    assert args.epochs == 3
    assert args.command == "train"


@pytest.mark.slow
def test_cli_full_pipeline(tmp_path):
    project = make_project(tmp_path)

    run_cli(["create", "-p", str(project)])
    chips = list((project / "data/train/processed").glob("*.npz"))
    assert len(chips) == 3

    # idempotent re-run
    run_cli(["create", "-p", str(project)])
    assert len(list((project / "data/train/processed").glob("*.npz"))) == 3

    run_cli(
        [
            "train",
            "-p",
            str(project),
            "--epochs",
            "1",
            "--hidden-channels",
            "4",
            "--dilations",
            "1",
            "--attention-weights",
            "none",
            "--batch-size",
            "1",
            "--precision",
            "32",
            "--dropout",
            "0.0",
            "--val-frac",
            "0.34",
            "--augment-prob",
            "0.0",
        ]
    )
    assert (project / "ckpt" / "last_store" / "best" / "model").exists()
    assert (project / "ckpt" / "last.norm.npz").exists()

    run_cli(
        [
            "create-predict",
            "-p",
            str(project),
            "--regions",
            "000000",
            "--window-size",
            "32",
            "--padding",
            "8",
        ]
    )
    windows = list((project / "data/predict/processed").glob("*.npz"))
    assert len(windows) == 4

    run_cli(
        [
            "predict",
            "-p",
            str(project),
            "--region",
            "000000",
            "-o",
            str(project / "out.tif"),
        ]
    )
    out = project / "out.npz"  # no rasterio -> npz fallback
    assert out.exists()
    raster = np.load(out)["raster"]
    assert raster.shape == (3, 64, 64)

    # Serving export: artifact loads and runs with nothing but jax
    run_cli(
        [
            "export",
            "-p",
            str(project),
            "--export-batch-size",
            "1",
            "--chip-size",
            "48",
            "--precision",
            "fp32",
            "--platform",
            "cpu",
        ]
    )
    artifact = project / "ckpt" / "serve_best.cnx"
    assert artifact.exists()
    from cultionet_tpu.export import load_predictor

    pred = load_predictor(artifact)
    x_shape = tuple(pred.meta["inputs"]["x"]["shape"])
    rng = np.random.default_rng(3)
    # coords are required by default (GeoEmbeddings: (0,0) is a real
    # location) — synthetic check opts into zero-fill explicitly.
    served = pred(
        rng.integers(0, 10000, size=x_shape, dtype=np.int16),
        fill_coords=True,
    )
    assert served["crop"].shape[1:3] == (48, 48)
    assert np.isfinite(served["crop"]).all()
    assert pred.meta["normalized"] is True  # norm sidecar was baked in

    # Commands archived
    commands = list((project / "commands").glob("*.json"))
    assert len(commands) >= 4
    # classes.info written
    info = json.loads((project / "data" / "classes.info").read_text())
    assert info == {"max_crop_class": 1, "edge_class": 2}


@pytest.mark.slow
def test_cli_profiler_trace(tmp_path):
    """--profiler wraps fit in jax.profiler.trace and writes an xplane
    capture (reference: Lightning profiler pass-through, model.py:97)."""
    project = make_project(tmp_path, num_regions=3)
    run_cli(["create", "-p", str(project)])
    trace_dir = tmp_path / "trace"
    run_cli(
        [
            "train",
            "-p", str(project),
            "--epochs", "1",
            "--hidden-channels", "4",
            "--dilations", "1",
            "--attention-weights", "none",
            "--batch-size", "1",
            "--precision", "32",
            "--dropout", "0.0",
            "--val-frac", "0.34",
            "--augment-prob", "0.0",
            "--profiler", str(trace_dir),
        ]
    )
    captures = list(trace_dir.rglob("*.xplane.pb"))
    assert captures, f"no xplane capture under {trace_dir}"


def test_cli_version(capsys):
    run_cli(["version"])
    captured = capsys.readouterr()
    assert captured.out.strip()


@pytest.mark.slow
def test_cli_transfer_pipeline(tmp_path):
    """train-transfer fine-tunes from the plain train run's last_store and
    writes its own last_transfer_store; predict-transfer loads that store
    (reference scripts/cultionet.py train-transfer/predict-transfer wiring,
    model.py:331-404)."""
    project = make_project(tmp_path)
    run_cli(["create", "-p", str(project)])
    train_args = [
        "-p", str(project),
        "--epochs", "1",
        "--hidden-channels", "4",
        "--dilations", "1",
        "--attention-weights", "none",
        "--batch-size", "1",
        "--precision", "32",
        "--dropout", "0.0",
        "--val-frac", "0.34",
        "--augment-prob", "0.0",
    ]
    run_cli(["train"] + train_args)
    assert (project / "ckpt" / "last_store" / "best" / "model").exists()

    run_cli(["train-transfer"] + train_args)
    assert (
        project / "ckpt" / "last_transfer_store" / "best" / "model"
    ).exists()
    # the pretrained store is untouched by the transfer run
    assert (project / "ckpt" / "last_store" / "best" / "model").exists()

    run_cli(
        [
            "create-predict",
            "-p", str(project),
            "--regions", "000000",
            "--window-size", "32",
            "--padding", "8",
        ]
    )
    run_cli(
        [
            "predict-transfer",
            "-p", str(project),
            "--region", "000000",
            "-o", str(project / "out_transfer.tif"),
        ]
    )
    raster = np.load(project / "out_transfer.npz")["raster"]
    assert raster.shape == (3, 64, 64)


def test_cli_create_knob_tail(tmp_path):
    """bbox-offsets writes extra shifted chips; --append-ts n reads
    imagery from the project root; --data-pattern filters train files."""
    project = make_project(tmp_path, num_regions=1)

    run_cli(
        [
            "create",
            "-p",
            str(project),
            "--bbox-offsets",
            "0,8",
            "--bbox-offsets=-8,0",
        ]
    )
    chips = sorted((project / "data/train/processed").glob("*.npz"))
    names = [c.name for c in chips]
    assert len(chips) == 3
    assert any("-off0x8" in n for n in names)
    assert any("-off-8x0" in n for n in names)

    # --append-ts n: regions directly under the imagery root
    flat = tmp_path / "flat"
    import shutil

    shutil.copytree(project / "time_series_vars" / "000000", flat / "000000")
    run_cli(["create", "-p", str(flat), "--append-ts", "n"])
    assert len(list((flat / "data/train/processed").glob("*.npz"))) == 1


def _chip_content_digest(processed: Path) -> str:
    import hashlib

    h = hashlib.sha256()
    for f in sorted(processed.glob("*.npz")):
        h.update(f.name.encode())
        with np.load(f, allow_pickle=False) as z:
            for k in sorted(z.files):
                h.update(k.encode())
                h.update(np.ascontiguousarray(z[k]).tobytes())
    return h.hexdigest()


def test_create_process_pool_matches_serial(tmp_path):
    """--num-workers N fans per-grid creation over a fork process pool
    (reference joblib loky, scripts/cultionet.py:512-529); chip contents
    must be identical to the serial path."""
    project = make_project(tmp_path, num_regions=4)
    run_cli(["create", "-p", str(project)])
    processed = project / "data/train/processed"
    assert len(list(processed.glob("*.npz"))) == 4
    serial = _chip_content_digest(processed)

    run_cli(["create", "-p", str(project), "--num-workers", "3",
             "--overwrite"])
    assert len(list(processed.glob("*.npz"))) == 4
    assert _chip_content_digest(processed) == serial


def test_create_compression_none(tmp_path):
    """--compression none writes uncompressed npz chips that load
    identically (reference compression knob, args.yml)."""
    project = make_project(tmp_path, num_regions=1)
    run_cli(["create", "-p", str(project)])
    processed = project / "data/train/processed"
    zlib_digest = _chip_content_digest(processed)
    zlib_bytes = sum(f.stat().st_size for f in processed.glob("*.npz"))

    run_cli(["create", "-p", str(project), "--compression", "none",
             "--overwrite"])
    assert _chip_content_digest(processed) == zlib_digest
    none_bytes = sum(f.stat().st_size for f in processed.glob("*.npz"))
    assert none_bytes > zlib_bytes  # actually uncompressed

"""fit() on the virtual 8-device mesh + skfoldcv/transfer CLI paths."""

import json
from pathlib import Path

import numpy as np
import pytest

from cultionet_tpu.config import CultionetParams
from cultionet_tpu.data import ChipDataset, create_batch
from cultionet_tpu.enums import LossTypes
from cultionet_tpu.model import fit

pytestmark = pytest.mark.slow


def write_dataset(tmp_path, num=12, seed=100):
    rng = np.random.default_rng(seed)
    processed = Path(tmp_path) / "processed"
    for _ in range(num):
        batch = create_batch(
            num_channels=2, num_time=6, height=16, width=16, rng=rng
        )
        batch.to_file(processed / batch.batch_id[0])
    return ChipDataset(tmp_path)


def test_fit_on_8_device_mesh(tmp_path):
    dataset = write_dataset(tmp_path / "data", num=12)
    params = CultionetParams(
        ckpt_file=Path(tmp_path) / "ckpt" / "last.ckpt",
        dataset=dataset,
        val_frac=0.25,  # 3 val chips -> partial batch exercises fallback
        batch_size=8,
        edge_class=2,
        hidden_channels=4,
        dilations=[1],
        attention_weights=None,
        epochs=2,
        learning_rate=1e-3,
        loss_name=LossTypes.TANIMOTO_COMBINED,
        precision="32",
        devices=8,
        dropout=0.0,
        load_batch_workers=0,
    )
    result = fit(params)
    assert len(result.history) == 2
    assert np.isfinite(result.history[-1]["loss"])
    assert np.isfinite(result.history[-1]["val_score"])
    assert result.history[-1]["lr_sch"] > 0


def test_cli_skfoldcv_and_transfer(tmp_path):
    import sys
    from unittest import mock

    sys.path.insert(0, str(Path(__file__).parent))
    from test_cli import make_project
    from cultionet_tpu.scripts.cli import main

    def run_cli(argv):
        with mock.patch.object(sys, "argv", ["cultionet-tpu"] + argv):
            main()

    project = make_project(tmp_path, num_regions=4)
    run_cli(["create", "-p", str(project)])

    common = [
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
        "--augment-prob",
        "0.0",
    ]

    run_cli(["skfoldcv", *common, "--k-folds", "2", "--val-frac", "0.5"])
    results = json.loads((project / "ckpt" / "skfoldcv.json").read_text())
    assert len(results) >= 2
    assert all(np.isfinite(v) for v in results.values())

    # Pretrain then transfer
    run_cli(["train", *common, "--val-frac", "0.25"])
    run_cli(
        [
            "train-transfer",
            *common,
            "--val-frac",
            "0.25",
            "--finetune",
            "fc",
        ]
    )
    assert (
        project / "ckpt" / "last_transfer_store" / "best" / "model"
    ).exists()

    # predict-transfer path
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
    run_cli(
        [
            "predict-transfer",
            "-p",
            str(project),
            "--region",
            "000000",
            "-o",
            str(project / "transfer_out.tif"),
        ]
    )
    assert (project / "transfer_out.npz").exists()

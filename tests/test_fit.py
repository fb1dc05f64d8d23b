"""End-to-end fit()/resume/transfer/predict tests (modeled on reference
tests/test_train.py:53-94)."""

import json
from pathlib import Path

import numpy as np
import pytest

import cultionet_tpu
from cultionet_tpu.config import CultionetParams
from cultionet_tpu.data import ChipDataset, create_batch
from cultionet_tpu.enums import LossTypes
from cultionet_tpu.model import fit, fit_transfer, load_model, predict

pytestmark = pytest.mark.slow


def write_dataset(tmp_path, num=10, seed=100):
    rng = np.random.default_rng(seed)
    processed = Path(tmp_path) / "processed"
    for _ in range(num):
        batch = create_batch(
            num_channels=2, num_time=6, height=16, width=16, rng=rng
        )
        batch.to_file(processed / batch.batch_id[0])
    return ChipDataset(tmp_path)


def small_params(tmp_path, dataset, **kwargs):
    defaults = dict(
        ckpt_file=Path(tmp_path) / "ckpt" / "last.ckpt",
        dataset=dataset,
        val_frac=0.2,
        batch_size=2,
        load_batch_workers=0,
        edge_class=2,
        hidden_channels=4,
        dilations=[1],
        attention_weights=None,
        epochs=2,
        learning_rate=1e-3,
        loss_name=LossTypes.TANIMOTO_COMBINED,
        precision="32",
        devices=1,
        dropout=0.0,
    )
    defaults.update(kwargs)
    return CultionetParams(**defaults)


def test_fit_end_to_end(tmp_path):
    dataset = write_dataset(tmp_path / "data")
    params = small_params(tmp_path, dataset)
    result = fit(params)

    assert len(result.history) == 2
    assert np.isfinite(result.history[-1]["loss"])
    ckpt_dir = Path(tmp_path) / "ckpt" / "last_store"
    assert (ckpt_dir / "last").exists()
    assert (ckpt_dir / "best").exists()
    assert result.best_score < float("inf")

    # Resume: epochs=3 continues from epoch 2.
    params2 = small_params(tmp_path, dataset, epochs=3)
    result2 = fit(params2)
    assert len(result2.history) == 1
    assert result2.history[0]["epoch"] == 2

    # load_model reconstructs from embedded hyperparams.
    state, model = load_model(ckpt_dir)
    assert state is not None

    preds = predict(state, dataset, batch_size=2, precision="fp32")
    assert len(preds) == 5
    assert preds[0]["distance"].shape == (2, 16, 16, 1)
    values = preds[0]["crop"]
    assert np.isfinite(values).all()
    assert values.min() >= 0 and values.max() <= 1


def test_fit_transfer_freezes_backbone(tmp_path):
    dataset = write_dataset(tmp_path / "data", num=6)
    params = small_params(tmp_path, dataset, epochs=1)
    result = fit(params)
    backbone_before = np.asarray(
        jax_leaf(result.state.params, "mask_model", "pre_unet")
    )

    params_t = small_params(
        tmp_path,
        dataset,
        epochs=1,
        finetune="fc",
        reset_model=False,
        ckpt_file=Path(tmp_path) / "ckpt" / "last_transfer.ckpt",
    )
    # pretrained weights come from the ckpt written by fit above
    result_t = fit_transfer(params_t)

    backbone_after = np.asarray(
        jax_leaf(result_t.state.params, "mask_model", "pre_unet")
    )
    np.testing.assert_allclose(backbone_before, backbone_after)


def jax_leaf(params, *path):
    node = params
    for key in path:
        node = node[key]
    # descend to first array leaf
    import jax

    return jax.tree_util.tree_leaves(node)[0]


def test_auto_lr_find(tmp_path):
    """auto_lr_find runs an LR sweep instead of training and returns a
    suggestion (reference model.py:301-305)."""
    import numpy as np

    from cultionet_tpu.data.datasets import ChipDataset
    from cultionet_tpu.data.synthetic import create_batch

    rng = np.random.default_rng(0)
    for i in range(6):
        create_batch(
            num_channels=2, num_time=6, height=16, width=16, rng=rng
        ).to_file(tmp_path / "processed" / f"data_{i:03d}.npz")

    params = CultionetParams(
        dataset=ChipDataset(tmp_path),
        batch_size=2,
        hidden_channels=4,
        attention_weights=None,
        dilations=[1],
        epochs=3,
        precision="32",
        auto_lr_find=True,
    )
    result = fit(params)
    assert result.state is None  # no training happened
    assert len(result.history) >= 10
    lrs = [row["lr"] for row in result.history]
    assert all(b >= a for a, b in zip(lrs, lrs[1:]))  # exponential sweep
    assert result.best_score > 0  # the suggested LR


def test_save_batch_val_metrics(tmp_path):
    """Per-VAL-BATCH metric rows land in batch_metrics.parquet (reference
    lightning.py:512-534) — one row per val batch per epoch."""
    rng = np.random.default_rng(1)
    for i in range(8):
        create_batch(
            num_channels=2, num_time=6, height=16, width=16, rng=rng
        ).to_file(tmp_path / "processed" / f"data_{i:03d}.npz")

    params = CultionetParams(
        ckpt_file=tmp_path / "ckpt" / "last.ckpt",
        dataset=ChipDataset(tmp_path),
        batch_size=2,
        val_frac=0.5,
        hidden_channels=4,
        attention_weights=None,
        dilations=[1],
        epochs=2,
        precision="32",
        save_batch_val_metrics=True,
    )
    fit(params)

    import pandas as pd

    frame = pd.read_parquet(tmp_path / "ckpt" / "batch_metrics.parquet")
    # 4 val chips / batch 2 = 2 val batches x 2 epochs
    assert len(frame) == 4
    assert set(frame["epoch"]) == {0, 1}
    assert {"batch", "loss", "score", "edge_f1"} <= set(frame.columns)
    # epoch-curve event stream exists too
    assert (tmp_path / "ckpt" / "history.csv").exists()


def test_fit_with_chipstore_fast_path(tmp_path):
    """use_chipstore: raw int16 batches stream from the native store and
    the compiled step dequantizes + augments + z-scores on device; history
    and checkpoints behave as on the per-file path."""
    from cultionet_tpu.utils.normalize import NormValues

    rng = np.random.default_rng(2)
    for i in range(8):
        create_batch(
            num_channels=2, num_time=6, height=16, width=16, rng=rng
        ).to_file(tmp_path / "processed" / f"data_{i:03d}.npz")
    ds = ChipDataset(tmp_path)
    ds.norm_values = NormValues(
        dataset_mean=np.asarray([0.4, 0.6], dtype=np.float32),
        dataset_std=np.asarray([0.2, 0.3], dtype=np.float32),
        dataset_crop_counts=np.asarray([100, 50]),
        dataset_edge_counts=np.asarray([140, 10]),
        num_channels=2,
    )

    params = CultionetParams(
        ckpt_file=tmp_path / "ckpt" / "last.ckpt",
        dataset=ds,
        batch_size=2,
        val_frac=0.25,
        hidden_channels=4,
        attention_weights=None,
        dilations=[1],
        epochs=2,
        precision="32",
        use_chipstore=True,
        device_augment=True,
    )
    result = fit(params)
    assert len(result.history) == 2
    assert all(np.isfinite(row["loss"]) for row in result.history)
    # the packed store was cached next to the checkpoints (name carries
    # the membership hash + process index) and is reused
    stores = list((tmp_path / "ckpt").glob("train-*.cts"))
    assert len(stores) == 1
    mtime = stores[0].stat().st_mtime
    fit(params)  # resume/second run must not rebuild the store
    assert stores[0].stat().st_mtime == mtime

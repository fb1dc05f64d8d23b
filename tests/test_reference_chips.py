"""Real reference-data tests: the chips bundled with the reference repo
(tests/data/train/processed/*.pt — real 100x100 USA chips) load through the
torch_geometric shim and run end-to-end through this framework."""

from pathlib import Path

import numpy as np
import pytest

from cultionet_tpu.data.batch import Batch
from cultionet_tpu.data.datasets import ChipDataset

REFERENCE_CHIPS = Path("/root/reference/tests/data/train")


@pytest.mark.skipif(
    not REFERENCE_CHIPS.exists(), reason="reference fixtures not mounted"
)
def test_load_real_reference_chip():
    files = sorted((REFERENCE_CHIPS / "processed").glob("*.pt"))
    assert files, "no reference chips found"
    batch = Batch.from_reference_file(files[0])

    assert batch.x.shape == (1, 13, 100, 100, 3)  # T=13, C=3 VIs
    x = np.asarray(batch.x)
    assert np.isfinite(x).all()
    assert 0.0 <= x.min() and x.max() <= 1.0
    assert set(np.unique(np.asarray(batch.y))) <= {-1, 0, 1, 2}
    bd = np.asarray(batch.bdist)
    assert 0.0 <= bd.min() and bd.max() <= 1.0
    # Real geographic bounds (USA chip)
    assert -91.0 < float(batch.left[0]) < -90.9
    assert 35.4 < float(batch.bottom[0]) < 35.5


@pytest.mark.skipif(
    not REFERENCE_CHIPS.exists(), reason="reference fixtures not mounted"
)
def test_real_chips_through_dataset_and_model():
    dataset = ChipDataset(REFERENCE_CHIPS)
    assert len(dataset) == 2
    batch = dataset[0]
    assert batch.x.shape == (1, 13, 100, 100, 3)
    assert batch.lat is not None

    from cultionet_tpu.models import CultioNet
    from cultionet_tpu.train.optim import build_optimizer
    from cultionet_tpu.train.step import (
        create_train_state,
        make_eval_step,
    )

    model = CultioNet(
        in_time=13, hidden_channels=4, attention_weights=None, dilations=[1]
    )
    state = create_train_state(
        model, build_optimizer("AdamW", 1e-3), batch, seed=0
    )
    metrics = make_eval_step()(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["score"]))

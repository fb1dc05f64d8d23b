"""On-device batched augmentation + chipstore-driven training."""

import jax
import jax.numpy as jnp
import numpy as np

from cultionet_tpu.augment.device import augment_batch_on_device
from cultionet_tpu.data.synthetic import create_batch
import pytest

pytestmark = pytest.mark.slow


def test_dihedral_preserves_pixel_sets():
    rng = np.random.default_rng(0)
    batch = create_batch(
        num_channels=2, num_time=4, height=12, width=12, batch_size=8, rng=rng
    )
    out = augment_batch_on_device(batch, jax.random.PRNGKey(0))
    # Geometric transforms permute pixels: per-sample sums are invariant.
    np.testing.assert_allclose(
        np.asarray(out.x.sum(axis=(1, 2, 3, 4))),
        np.asarray(batch.x.sum(axis=(1, 2, 3, 4))),
        rtol=1e-5,
    )
    np.testing.assert_array_equal(
        np.sort(np.asarray(out.y).reshape(8, -1), axis=1),
        np.sort(np.asarray(batch.y).reshape(8, -1), axis=1),
    )
    # x and y co-transform: crop-pixel means of x must follow the labels.
    for i in range(8):
        mask_in = np.asarray(batch.y[i]) == 1
        mask_out = np.asarray(out.y[i]) == 1
        if mask_in.sum() == 0:
            continue
        mean_in = np.asarray(batch.x[i, 0])[mask_in].mean()
        mean_out = np.asarray(out.x[i, 0])[mask_out].mean()
        assert abs(mean_in - mean_out) < 1e-5


def test_device_augment_in_train_step():
    from cultionet_tpu.models import CultioNet
    from cultionet_tpu.train.optim import build_optimizer
    from cultionet_tpu.train.step import create_train_state, make_train_step

    rng = np.random.default_rng(1)
    batch = create_batch(
        num_channels=2, num_time=6, height=16, width=16, batch_size=2, rng=rng
    )
    model = CultioNet(
        in_time=6, hidden_channels=4, attention_weights=None, dilations=[1]
    )
    state = create_train_state(
        model, build_optimizer("AdamW", 1e-3), batch, seed=0
    )
    step = make_train_step(
        precision="fp32",
        donate=False,
        device_augment=True,
        device_augment_noise=0.01,
    )
    losses = []
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, sk = jax.random.split(key)
        state, logs = step(state, batch, sk)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    # different augmentation draws -> different losses
    assert len(set(losses)) > 1


def test_train_from_chipstore(tmp_path):
    """End-to-end: pack chips into the native store, train from its
    prefetched batches."""
    from cultionet_tpu.data.chipstore import ChipStore, write_chipstore
    from cultionet_tpu.models import CultioNet
    from cultionet_tpu.train.optim import build_optimizer
    from cultionet_tpu.train.step import create_train_state, make_train_step

    rng = np.random.default_rng(2)
    chips = [
        create_batch(
            num_channels=2, num_time=6, height=16, width=16, rng=rng
        )
        for _ in range(8)
    ]
    store = ChipStore(write_chipstore(tmp_path / "train.cts", chips))

    model = CultioNet(
        in_time=6, hidden_channels=4, attention_weights=None, dilations=[1]
    )
    init = store.read_batch([0, 1])
    state = create_train_state(
        model, build_optimizer("AdamW", 1e-3), init, seed=0
    )
    step = make_train_step(precision="fp32", donate=False)
    key = jax.random.PRNGKey(0)
    count = 0
    for batch in store.iter_prefetched(batch_size=2, num_batches=4):
        key, sk = jax.random.split(key)
        state, logs = step(state, batch, sk)
        count += 1
    assert count == 4
    assert np.isfinite(float(logs["loss"]))
    store.close()

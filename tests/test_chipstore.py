"""Native chipstore: round-trip, random-access reads, prefetch pipeline."""

import numpy as np
import pytest

from cultionet_tpu.data.chipstore import ChipStore, write_chipstore
from cultionet_tpu.data.synthetic import create_batch


@pytest.fixture(scope="module")
def store_path(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chipstore")
    rng = np.random.default_rng(0)
    chips = [
        create_batch(
            num_channels=2, num_time=4, height=12, width=12, rng=rng
        )
        for _ in range(10)
    ]
    path = write_chipstore(tmp / "train.cts", chips)
    return path, chips


def test_roundtrip_read(store_path):
    path, chips = store_path
    store = ChipStore(path)
    assert len(store) == 10
    assert (store.t, store.h, store.w, store.c) == (4, 12, 12, 2)

    batch = store.read_batch([0, 3, 7])
    assert batch.x.shape == (3, 4, 12, 12, 2)
    np.testing.assert_allclose(
        np.asarray(batch.x[0]), np.asarray(chips[0].x[0]), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(batch.y[1]), np.asarray(chips[3].y[0])
    )
    np.testing.assert_allclose(
        np.asarray(batch.bdist[2]), np.asarray(chips[7].bdist[0]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(batch.left[0]), float(chips[0].left[0]), rtol=1e-5
    )
    store.close()


def test_out_of_range(store_path):
    path, _ = store_path
    store = ChipStore(path)
    with pytest.raises(IndexError):
        store.read_batch([99])
    store.close()


def test_prefetch_pipeline(store_path):
    path, chips = store_path
    store = ChipStore(path)
    seen = 0
    all_x = np.stack([np.asarray(c.x[0]) for c in chips])
    for batch in store.iter_prefetched(
        batch_size=4, seed=7, num_threads=2, num_batches=5
    ):
        assert batch.x.shape == (4, 4, 12, 12, 2)
        # every prefetched chip must be bit-identical to one source chip
        for i in range(4):
            diffs = np.abs(
                all_x - np.asarray(batch.x[i])[None]
            ).reshape(len(chips), -1).max(axis=1)
            assert diffs.min() < 1e-6
        seen += batch.x.shape[0]
    assert seen == 20
    store.close()


def test_packed_v2_roundtrip(tmp_path):
    """int16-packed (version 2) store: half the bytes, exact for x10000
    grids, dequantized on device inside the train step."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    chips = [
        create_batch(
            num_channels=2, num_time=4, height=12, width=12, rng=rng
        )
        for _ in range(6)
    ]
    path_v1 = write_chipstore(tmp_path / "v1.cts", chips)
    path_v2 = write_chipstore(tmp_path / "v2.cts", chips, packed=True)
    # v2 records are about half the size of v1
    assert path_v2.stat().st_size < 0.6 * path_v1.stat().st_size

    store = ChipStore(path_v2)
    assert store.packed and store.version == 2
    batch = store.read_batch([0, 2])
    assert batch.x.dtype == np.int16
    assert batch.is_packed

    deq = batch.dequantize()
    assert deq.x.dtype == jnp.float32
    assert deq.y.dtype == jnp.int32
    # quantization error bounded by half a grid step (1/10000)
    np.testing.assert_allclose(
        np.asarray(deq.x[0]), np.asarray(chips[0].x[0]), atol=0.5e-4
    )
    np.testing.assert_array_equal(
        np.asarray(deq.y[1]), np.asarray(chips[2].y[0])
    )
    np.testing.assert_allclose(
        np.asarray(deq.bdist[0]), np.asarray(chips[0].bdist[0]), atol=0.5e-4
    )
    store.close()


@pytest.mark.slow
def test_packed_prefetch_and_train_step(tmp_path):
    """Prefetched packed batches feed the jitted train step directly
    (dequantization happens inside the compiled step)."""
    import jax

    from cultionet_tpu.enums import AttentionTypes
    from cultionet_tpu.models import CultioNet
    from cultionet_tpu.train.optim import build_optimizer
    from cultionet_tpu.train.step import create_train_state, make_train_step

    rng = np.random.default_rng(5)
    chips = [
        create_batch(
            num_channels=2, num_time=6, height=16, width=16, rng=rng
        )
        for _ in range(8)
    ]
    path = write_chipstore(tmp_path / "train.cts", chips, packed=True)
    store = ChipStore(path)

    model = CultioNet(
        in_time=6,
        hidden_channels=4,
        attention_weights=AttentionTypes.NATTEN,
        dilations=[1],
    )
    tx = build_optimizer(optimizer="AdamW", learning_rate=1e-3)

    it = store.iter_prefetched(batch_size=4, seed=1, num_batches=3)
    first = next(it)
    assert first.is_packed
    state = create_train_state(model, tx, first.dequantize(), seed=0)
    step = make_train_step(precision="fp32")
    key = jax.random.PRNGKey(0)
    losses = []
    for batch in [first, *it]:
        key, sub = jax.random.split(key)
        state, logs = step(state, batch, sub)
        losses.append(float(logs["loss"]))
    assert len(losses) == 3 and all(np.isfinite(losses))
    store.close()

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

"""Augmentation suite tests, modeled on the reference's
tests/test_augmentation.py:21-211: every augmenter changes x; spatial
transforms co-transform y/bdist with exact pixel correspondence; temporal
transforms leave y/bdist untouched and only modify parcel pixels."""

import jax.numpy as jnp
import numpy as np
import pytest

from cultionet_tpu.augment import AUGMENTATION_NAMES, Augmenters
from cultionet_tpu.data.synthetic import create_batch


def make_batch(seed=0, height=20, width=20):
    rng = np.random.default_rng(seed)
    return rng, create_batch(
        num_channels=3, num_time=12, height=height, width=width, rng=rng
    )


@pytest.mark.parametrize(
    "name", [n for n in AUGMENTATION_NAMES if n != "none"]
)
def test_augmenter_changes_x(name):
    rng, batch = make_batch()
    aug = Augmenters([name], rng=rng)
    out = aug(batch)
    assert out.x.shape == batch.x.shape
    assert not np.allclose(np.asarray(out.x), np.asarray(batch.x)), name
    assert np.isfinite(np.asarray(out.x)).all()
    assert float(out.x.min()) >= float(np.float32(1e-9))
    assert float(out.x.max()) <= 1.0


@pytest.mark.parametrize(
    "name", ["tswarp", "tsnoise", "tsdrift", "tspeaks", "roll"]
)
def test_temporal_preserves_labels_and_background(name):
    rng, batch = make_batch(seed=1)
    aug = Augmenters([name], rng=rng)
    out = aug(batch)

    np.testing.assert_array_equal(np.asarray(out.y), np.asarray(batch.y))
    np.testing.assert_allclose(
        np.asarray(out.bdist), np.asarray(batch.bdist)
    )

    # Non-parcel pixels (y != 1) must be unchanged (up to the clip).
    non_parcel = np.asarray(batch.y)[0] != 1
    expected = np.clip(np.asarray(batch.x)[0], 1e-9, 1.0)
    got = np.asarray(out.x)[0]
    np.testing.assert_allclose(
        got[:, non_parcel, :], expected[:, non_parcel, :], atol=1e-6
    )


def test_fliplr_pixel_correspondence():
    rng, batch = make_batch(seed=2)
    out = Augmenters(["fliplr"], rng=rng)(batch)
    np.testing.assert_allclose(
        np.asarray(out.x)[0, :, :, 0, :],
        np.clip(np.asarray(batch.x)[0, :, :, -1, :], 1e-9, 1.0),
        atol=1e-7,
    )
    np.testing.assert_array_equal(
        np.asarray(out.y)[0, :, 0], np.asarray(batch.y)[0, :, -1]
    )


def test_rot90_pixel_correspondence():
    rng, batch = make_batch(seed=3)
    out = Augmenters(["rot90"], rng=rng)(batch)
    # rot90 CCW: out[h, w] = in[w, W-1-h]
    x_in = np.clip(np.asarray(batch.x)[0], 1e-9, 1.0)
    x_out = np.asarray(out.x)[0]
    np.testing.assert_allclose(
        x_out[:, 0, 0, :], x_in[:, 0, -1, :], atol=1e-7
    )
    y_in = np.asarray(batch.y)[0]
    y_out = np.asarray(out.y)[0]
    np.testing.assert_array_equal(np.rot90(y_in, k=1), y_out)


def test_cropresize_changes_scale_keeps_shape():
    rng, batch = make_batch(seed=4)
    out = Augmenters(["cropresize"], rng=rng)(batch)
    assert out.x.shape == batch.x.shape
    assert out.y.shape == batch.y.shape
    assert set(np.unique(np.asarray(out.y))) <= {-1, 0, 1, 2}


def test_roll_is_circular_shift_inside_parcel():
    rng = np.random.default_rng(10)
    batch = create_batch(
        num_channels=1, num_time=8, height=10, width=10, rng=rng
    )
    # Single rectangular parcel
    y = np.zeros((1, 10, 10), dtype=np.int64)
    y[0, 2:6, 3:8] = 1
    batch = batch.replace(y=jnp.asarray(y))

    aug_rng = np.random.default_rng(5)
    out = Augmenters(["roll"], rng=aug_rng)(batch)

    x_in = np.clip(np.asarray(batch.x)[0, :, 3, 4, 0], 1e-9, 1.0)
    x_out = np.asarray(out.x)[0, :, 3, 4, 0]
    # Must be a circular shift of the original series.
    candidates = [
        np.roll(x_in, s) for s in range(-len(x_in), len(x_in) + 1)
    ]
    assert any(np.allclose(x_out, c, atol=1e-6) for c in candidates)


def test_chained_augmenters():
    rng, batch = make_batch(seed=6)
    out = Augmenters(["fliplr", "saltpepper"], rng=rng)(batch)
    assert out.x.shape == batch.x.shape

"""Metric unit tests against hand-computed values."""

import jax.numpy as jnp
import numpy as np

from cultionet_tpu.train.metrics import (
    confusion_counts,
    dice_score,
    fbeta_score,
    jaccard_score,
    mae,
    matthews_corrcoef,
    mse,
)


def test_confusion_counts():
    preds = jnp.asarray([0, 1, 1, 0, 1])
    targets = jnp.asarray([0, 1, 0, 1, 1])
    cm = np.asarray(confusion_counts(preds, targets))
    # rows = true, cols = pred
    np.testing.assert_array_equal(cm, [[1, 1], [1, 2]])


def test_fbeta_macro():
    preds = jnp.asarray([0, 1, 1, 0, 1])
    targets = jnp.asarray([0, 1, 0, 1, 1])
    # class0: tp=1, fn=1, fp=1 -> f2 = 5*1/(5*1+4*1+1) = 0.5
    # class1: tp=2, fn=1, fp=1 -> f2 = 10/(10+4+1) = 2/3
    expected = (0.5 + 2 / 3) / 2
    got = float(fbeta_score(preds, targets, beta=2.0))
    assert abs(got - expected) < 1e-6


def test_mcc_binary():
    preds = jnp.asarray([1, 1, 1, 0])
    targets = jnp.asarray([1, 1, 0, 0])
    # tp=2, tn=1, fp=1, fn=0 -> mcc = (2*1-1*0)/sqrt(3*2*1*2) = 2/sqrt(12)
    expected = 2 / np.sqrt(12)
    got = float(matthews_corrcoef(preds, targets))
    assert abs(got - expected) < 1e-6


def test_mcc_masked_equals_subset():
    rng = np.random.default_rng(0)
    preds = jnp.asarray(rng.integers(0, 2, size=100))
    targets = jnp.asarray(rng.integers(0, 2, size=100))
    mask = jnp.asarray(rng.integers(0, 2, size=100))
    masked = float(matthews_corrcoef(preds, targets, mask=mask))
    keep = np.asarray(mask) == 1
    subset = float(
        matthews_corrcoef(
            jnp.asarray(np.asarray(preds)[keep]),
            jnp.asarray(np.asarray(targets)[keep]),
        )
    )
    assert abs(masked - subset) < 1e-6


def test_mae_mse():
    preds = jnp.asarray([0.0, 1.0, 2.0])
    targets = jnp.asarray([1.0, 1.0, 0.0])
    assert abs(float(mae(preds, targets)) - 1.0) < 1e-6
    assert abs(float(mse(preds, targets)) - 5 / 3) < 1e-6
    mask = jnp.asarray([1, 0, 1])
    assert abs(float(mae(preds, targets, mask=mask)) - 1.5) < 1e-6


def test_dice_jaccard():
    preds = jnp.asarray([1, 1, 0, 0])
    targets = jnp.asarray([1, 0, 1, 0])
    assert abs(float(dice_score(preds, targets)) - 0.5) < 1e-6
    assert abs(float(jaccard_score(preds, targets)) - 1 / 3) < 1e-6

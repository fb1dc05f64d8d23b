"""Unit tests for the remaining loss zoo (hand-computed / closed-form
anchors): LogCosh, ClassBalancedMSE, Boundary, Tversky, FocalTversky,
clDice + soft skeleton."""

import jax.numpy as jnp
import numpy as np

from cultionet_tpu.losses import (
    BoundaryLoss,
    CLDiceLoss,
    ClassBalancedMSELoss,
    FocalTverskyLoss,
    LogCoshLoss,
    TverskyLoss,
    soft_skeleton,
)


def test_log_cosh_closed_form():
    inputs = jnp.asarray([[[0.0, 1.0], [2.0, 3.0]]])
    targets = jnp.asarray([[[0.0, 0.0], [0.0, 0.0]]])
    expected = np.mean(np.log(np.cosh([0.0, 1.0, 2.0, 3.0])))
    got = float(LogCoshLoss()(inputs, targets))
    assert abs(got - expected) < 1e-5

    # masked: only first two entries
    mask = jnp.asarray([[[1, 1], [0, 0]]])
    expected_masked = np.mean(np.log(np.cosh([0.0, 1.0])))
    got_masked = float(LogCoshLoss()(inputs, targets, mask=mask))
    assert abs(got_masked - expected_masked) < 1e-5


def test_class_balanced_mse():
    # targets: 3 negatives, 1 positive -> beta = 1/4
    targets = jnp.asarray([[[0.0, 0.0], [0.0, 1.0]]])
    inputs = jnp.asarray([[[0.1, 0.2], [0.0, 0.6]]])
    neg = np.log(np.cosh(np.asarray([0.1, 0.2, 0.0]) ** 2)).mean()
    pos = np.log(np.cosh(np.asarray([0.4]) ** 2)).mean()
    expected = 0.25 * neg + 0.75 * pos
    got = float(ClassBalancedMSELoss()(inputs, targets))
    assert abs(got - expected) < 1e-5


def test_class_balanced_mse_empty_class_is_zero():
    targets = jnp.zeros((1, 2, 2))
    inputs = jnp.full((1, 2, 2), 0.3)
    # beta = 0 -> loss = 0*neg + 1*pos, pos empty -> 0
    got = float(ClassBalancedMSELoss()(inputs, targets))
    assert got == 0.0


def test_boundary_loss():
    inputs = jnp.asarray([[[0.5, 1.0], [0.0, 1.0]]])
    targets = jnp.asarray([[[1.0, 0.5], [0.0, 1.0]]])
    expected = 1.0 - np.mean([0.5, 0.5, 0.0, 1.0])
    got = float(BoundaryLoss()(inputs, targets))
    assert abs(got - expected) < 1e-6


def test_tversky_perfect_prediction():
    targets = jnp.asarray(
        np.random.default_rng(0).integers(0, 2, size=(2, 8, 8))
    )
    one_hot = jnp.stack(
        [1 - targets, targets], axis=-1
    ).astype(jnp.float32)
    loss = float(TverskyLoss()(one_hot, targets))
    assert loss < 0.01

    focal = float(FocalTverskyLoss()(one_hot, targets))
    assert focal < 0.001  # squared of a small number


def test_soft_skeleton_thin_line():
    # A 1-pixel-wide line is its own skeleton; a blob erodes away.
    img = np.zeros((1, 9, 9, 1), dtype="float32")
    img[0, 4, 1:8, 0] = 1.0
    skel = np.asarray(soft_skeleton(jnp.asarray(img), num_iter=5))
    assert skel.max() > 0.9
    assert skel[0, 4, 4, 0] > 0.9


def test_cl_dice_runs():
    rng = np.random.default_rng(1)
    targets = jnp.asarray(rng.integers(0, 2, size=(1, 16, 16)))
    probs = jnp.asarray(
        rng.random((1, 16, 16, 1)).astype("float32")
    )
    loss = float(
        CLDiceLoss()(probs, targets, transform_logits=False)
    )
    assert 0.0 <= loss <= 1.0

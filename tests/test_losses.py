"""Golden-value loss parity tests.

The fixtures reproduce, draw-for-draw, the RNG sequence of the reference's
tests/test_loss.py:14-50 (numpy default_rng(100)); the asserted 3-decimal
values are the reference's published golden values (tests/test_loss.py:109-145
in /root/reference). Inputs are transposed to this framework's channel-last
layout.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cultionet_tpu.losses import (
    CombinedLoss,
    TanimotoComplementLoss,
    TanimotoDistLoss,
    preprocess,
)

BATCH_SIZE = 2
HEIGHT = 20
WIDTH = 20


@pytest.fixture(scope="module")
def golden_inputs():
    rng = np.random.default_rng(100)

    inputs_crop_logit = rng.uniform(
        low=-3, high=3, size=(BATCH_SIZE, 2, HEIGHT, WIDTH)
    ).astype("float32")
    inputs_crop_prob = (
        rng.dirichlet((0.5, 0.5), size=(BATCH_SIZE * HEIGHT * WIDTH))
        .astype("float32")
        .reshape(BATCH_SIZE, HEIGHT, WIDTH, 2)
    )
    inputs_edge_prob = rng.random((BATCH_SIZE, 1, HEIGHT, WIDTH)).astype(
        "float32"
    )
    inputs_dist = rng.random((BATCH_SIZE, 1, HEIGHT, WIDTH)).astype("float32")
    discrete_targets = rng.integers(
        low=0, high=2, size=(BATCH_SIZE, HEIGHT, WIDTH)
    )
    discrete_edge_targets = rng.integers(
        low=0, high=1, size=(BATCH_SIZE, HEIGHT, WIDTH)
    )
    dist_targets = rng.random((BATCH_SIZE, HEIGHT, WIDTH)).astype("float32")
    mask = rng.integers(low=0, high=2, size=(BATCH_SIZE, 1, HEIGHT, WIDTH))

    # to channel-last
    return {
        "crop_logit": jnp.asarray(inputs_crop_logit.transpose(0, 2, 3, 1)),
        "crop_prob": jnp.asarray(inputs_crop_prob),
        "edge_prob": jnp.asarray(inputs_edge_prob.transpose(0, 2, 3, 1)),
        "dist": jnp.asarray(inputs_dist.transpose(0, 2, 3, 1)),
        "targets": jnp.asarray(discrete_targets),
        "edge_targets": jnp.asarray(discrete_edge_targets),
        "dist_targets": jnp.asarray(dist_targets),
        "mask": jnp.asarray(mask.transpose(0, 2, 3, 1)[..., 0]),
    }


def test_loss_preprocessing(golden_inputs):
    g = golden_inputs

    inputs, targets = preprocess(
        g["crop_logit"], g["targets"], transform_logits=True
    )
    assert inputs.shape == (BATCH_SIZE, HEIGHT, WIDTH, 2)
    assert targets.shape == (BATCH_SIZE, HEIGHT, WIDTH, 2)
    np.testing.assert_allclose(
        np.asarray(inputs.sum(axis=-1)), 1.0, rtol=0.1
    )

    inputs, targets = preprocess(
        g["crop_prob"], g["targets"], transform_logits=False
    )
    np.testing.assert_allclose(np.asarray(inputs), np.asarray(g["crop_prob"]))
    assert targets.shape == (BATCH_SIZE, HEIGHT, WIDTH, 2)

    inputs, targets = preprocess(
        g["edge_prob"], g["edge_targets"], transform_logits=False
    )
    assert inputs.shape == (BATCH_SIZE, HEIGHT, WIDTH, 1)
    assert targets.shape == (BATCH_SIZE, HEIGHT, WIDTH, 1)

    inputs, targets = preprocess(
        g["dist"],
        g["dist_targets"],
        transform_logits=False,
        one_hot_targets=False,
    )
    np.testing.assert_allclose(np.asarray(inputs), np.asarray(g["dist"]))
    np.testing.assert_allclose(
        np.asarray(targets[..., 0]), np.asarray(g["dist_targets"])
    )


def test_tanimoto_classification_golden(golden_inputs):
    g = golden_inputs

    loss_func = TanimotoDistLoss()
    assert round(float(loss_func(g["crop_prob"], g["targets"])), 3) == 0.611
    assert (
        round(float(loss_func(g["crop_prob"], g["targets"], mask=g["mask"])), 3)
        == 0.431
    )

    loss_func = TanimotoComplementLoss()
    assert round(float(loss_func(g["crop_prob"], g["targets"])), 3) == 0.824
    assert (
        round(float(loss_func(g["crop_prob"], g["targets"], mask=g["mask"])), 3)
        == 0.692
    )

    loss_func = CombinedLoss(
        losses=[TanimotoDistLoss(), TanimotoComplementLoss()]
    )
    assert round(float(loss_func(g["crop_prob"], g["targets"])), 3) == 0.717
    assert (
        round(float(loss_func(g["crop_prob"], g["targets"], mask=g["mask"])), 3)
        == 0.561
    )


def test_tanimoto_regression_golden(golden_inputs):
    g = golden_inputs

    loss_func = TanimotoDistLoss(one_hot_targets=False)
    assert round(float(loss_func(g["dist"], g["dist_targets"])), 3) == 0.417

    loss_func = TanimotoComplementLoss(one_hot_targets=False)
    assert round(float(loss_func(g["dist"], g["dist_targets"])), 3) == 0.704

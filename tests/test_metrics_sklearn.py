"""Metric parity against scikit-learn's canonical implementations
(the reference used torchmetrics; sklearn anchors the same definitions)."""

import numpy as np
import pytest

sklearn_metrics = pytest.importorskip("sklearn.metrics")

import jax.numpy as jnp

from cultionet_tpu.train.metrics import fbeta_score, matthews_corrcoef


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fbeta_macro_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    preds = rng.integers(0, 2, size=500)
    targets = rng.integers(0, 2, size=500)

    expected = sklearn_metrics.fbeta_score(
        targets, preds, beta=2.0, average="macro"
    )
    got = float(fbeta_score(jnp.asarray(preds), jnp.asarray(targets), beta=2.0))
    assert abs(got - expected) < 1e-6


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mcc_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    preds = rng.integers(0, 2, size=500)
    targets = rng.integers(0, 2, size=500)

    expected = sklearn_metrics.matthews_corrcoef(targets, preds)
    got = float(matthews_corrcoef(jnp.asarray(preds), jnp.asarray(targets)))
    assert abs(got - expected) < 1e-6


def test_fbeta_skewed_classes():
    rng = np.random.default_rng(3)
    targets = (rng.random(1000) < 0.05).astype(int)  # rare positives
    preds = (rng.random(1000) < 0.07).astype(int)
    expected = sklearn_metrics.fbeta_score(
        targets, preds, beta=2.0, average="macro"
    )
    got = float(fbeta_score(jnp.asarray(preds), jnp.asarray(targets), beta=2.0))
    assert abs(got - expected) < 1e-6

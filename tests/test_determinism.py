"""Numerical-drift regression: fixed seeds -> fixed forward statistics.

If a refactor changes model math, these break loudly (the pattern behind the
reference's golden-raster parity gate, tests/predict_large_model.py)."""

import jax
import numpy as np

from cultionet_tpu.data.synthetic import create_batch
from cultionet_tpu.enums import AttentionTypes, InferenceNames
from cultionet_tpu.models import CultioNet
import pytest

pytestmark = pytest.mark.slow


def test_forward_is_deterministic():
    rng = np.random.default_rng(1234)
    batch = create_batch(
        num_channels=2, num_time=6, height=20, width=20, rng=rng
    )
    model = CultioNet(
        in_time=6,
        hidden_channels=4,
        dropout=0.0,
        attention_weights=AttentionTypes.NATTEN,
        dilations=[1, 2],
    )
    variables = model.init(jax.random.PRNGKey(7), batch, training=False)

    out1 = model.apply(variables, batch, training=False)
    out2 = model.apply(variables, batch, training=False)
    for name in (
        InferenceNames.DISTANCE,
        InferenceNames.EDGE,
        InferenceNames.CROP,
    ):
        np.testing.assert_array_equal(
            np.asarray(out1[name]), np.asarray(out2[name])
        )

    # Params are a pure function of the seed.
    variables_again = model.init(jax.random.PRNGKey(7), batch, training=False)
    leaves1 = jax.tree_util.tree_leaves(variables["params"])
    leaves2 = jax.tree_util.tree_leaves(variables_again["params"])
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_reproducible():
    from cultionet_tpu.train.optim import build_optimizer
    from cultionet_tpu.train.step import create_train_state, make_train_step

    rng = np.random.default_rng(5)
    batch = create_batch(
        num_channels=2, num_time=6, height=16, width=16, rng=rng
    )
    model = CultioNet(
        in_time=6, hidden_channels=4, attention_weights=None, dilations=[1]
    )
    tx = build_optimizer("AdamW", 1e-3)

    losses = []
    for _ in range(2):
        state = create_train_state(model, tx, batch, seed=11)
        step = make_train_step(precision="fp32", donate=False)
        _, logs = step(state, batch, jax.random.PRNGKey(3))
        losses.append(float(logs["loss"]))
    assert losses[0] == losses[1]

"""TowerUNet forward: output shapes and finiteness at 100x100 (the reference's
canonical chip size; mirrors reference tests/test_tower_unet.py:7-38)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cultionet_tpu.enums import AttentionTypes, InferenceNames, ResBlockTypes
from cultionet_tpu.models import TowerUNet


@pytest.mark.parametrize(
    "attention,res_type,temporal",
    [
        (AttentionTypes.NATTEN, ResBlockTypes.RESA, "conv"),
        (AttentionTypes.SPATIAL_CHANNEL, ResBlockTypes.RESA, "conv"),
        (None, ResBlockTypes.RES, "conv"),
        (AttentionTypes.NATTEN, ResBlockTypes.RESA, "transformer"),
    ],
)
def test_tower_unet_forward(attention, res_type, temporal):
    batch_size, num_channels, in_time, height, width = 2, 3, 12, 100, 100
    hidden_channels = 16

    model = TowerUNet(
        in_time=in_time,
        hidden_channels=hidden_channels,
        attention_weights=attention,
        res_block_type=res_type,
        temporal_encoder=temporal,
        dilations=[1, 2],
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.random((batch_size, in_time, height, width, num_channels)),
        dtype=jnp.float32,
    )
    latlon = jnp.asarray(rng.uniform(-90, 90, size=(batch_size, 2)))

    variables = model.init(
        jax.random.PRNGKey(0), x, latlon_coords=latlon, training=False
    )
    out = model.apply(variables, x, latlon_coords=latlon, training=False)

    for name in (
        InferenceNames.DISTANCE,
        InferenceNames.EDGE,
        InferenceNames.CROP,
    ):
        assert out[name].shape == (batch_size, height, width, 1)
        values = np.asarray(out[name])
        assert np.isfinite(values).all()
        assert (values >= 0).all() and (values <= 1).all()


def test_tower_unet_use_latlon():
    model = TowerUNet(
        in_time=6,
        hidden_channels=8,
        attention_weights=None,
        use_latlon=True,
        dilations=[1, 2],
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 6, 40, 40, 3)), dtype=jnp.float32)
    latlon = jnp.asarray([[10.0, -45.0]])
    variables = model.init(
        jax.random.PRNGKey(0), x, latlon_coords=latlon, training=False
    )
    out = model.apply(variables, x, latlon_coords=latlon, training=False)
    assert out[InferenceNames.DISTANCE].shape == (1, 40, 40, 1)

"""CultioNet: the top-level model wrapper (reference models/cultionet.py:12-110).

Builds lat/lon coordinates from the batch and runs the mask model; pads the
output dict with the vestigial ``crop_type``/``classes_l2``/``classes_l3``
keys for API parity with the reference.
"""

import typing as T

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.batch import Batch
from ..enums import AttentionTypes, InferenceNames, ModelTypes, ResBlockTypes
from .tower_unet import TowerUNet

Array = jax.Array


class CultioNet(nn.Module):
    in_time: int
    hidden_channels: int = 32
    model_type: str = ModelTypes.TOWERUNET
    activation_type: str = "SiLU"
    dropout: float = 0.1
    dilations: T.Optional[T.Sequence[int]] = None
    res_block_type: str = ResBlockTypes.RESA
    attention_weights: T.Optional[str] = AttentionTypes.NATTEN
    pool_by_max: bool = False
    batchnorm_first: bool = False
    use_latlon: bool = False
    temporal_encoder: str = "conv"
    remat: bool = False

    @nn.compact
    def __call__(
        self, batch: Batch, training: bool = False
    ) -> T.Dict[str, T.Optional[Array]]:
        assert self.model_type == ModelTypes.TOWERUNET, (
            "The model type is not supported."
        )

        latlon_coords = None
        if batch.lon is not None and batch.lat is not None:
            latlon_coords = jnp.stack([batch.lon, batch.lat], axis=-1)

        out = TowerUNet(
            in_time=self.in_time,
            hidden_channels=self.hidden_channels,
            num_classes=1,
            dilations=self.dilations,
            activation_type=self.activation_type,
            dropout=self.dropout,
            res_block_type=self.res_block_type,
            attention_weights=self.attention_weights,
            pool_by_max=self.pool_by_max,
            batchnorm_first=self.batchnorm_first,
            edge_activation=True,
            mask_activation=True,
            use_latlon=self.use_latlon,
            temporal_encoder=self.temporal_encoder,
            remat=self.remat,
            name="mask_model",
        )(batch.x, latlon_coords=latlon_coords, training=training)

        out.update(
            {
                InferenceNames.CROP_TYPE: None,
                InferenceNames.CLASSES_L2: None,
                InferenceNames.CLASSES_L3: None,
            }
        )
        return out

"""TowerUNet: the flagship model (reference models/nunet.py:108-265).

A UNet3+/Psi-Net-inspired encoder-decoder with ResUNet-a dilated residual
blocks and dilated neighborhood attention, fed by a temporal-reduction front
end, producing three output streams per pixel: distance transform, edge
probability, and crop mask.
"""

import typing as T

import jax
from flax import linen as nn

from ..enums import AttentionTypes, ResBlockTypes
from .temporal import PreTimeReduction, TemporalTransformer
from .unet_parts import (
    TowerUNetDecoder,
    TowerUNetEncoder,
    TowerUNetFinal,
    TowerUNetFinalCombine,
    TowerUNetFusion,
)

Array = jax.Array


class TowerUNet(nn.Module):
    in_time: int
    hidden_channels: int = 64
    num_classes: int = 1
    dilations: T.Optional[T.Sequence[int]] = None
    activation_type: str = "SiLU"
    dropout: float = 0.0
    res_block_type: str = ResBlockTypes.RESA
    attention_weights: T.Optional[str] = AttentionTypes.NATTEN
    pool_by_max: bool = False
    batchnorm_first: bool = False
    edge_activation: bool = True
    mask_activation: bool = True
    use_latlon: bool = False
    # 'conv' = PreTimeReduction 3-D conv pyramid (reference behavior);
    # 'transformer' = restored TemporalTransformer option.
    temporal_encoder: str = "conv"
    # Rematerialize encoder/decoder/fusion activations in the backward pass
    # (jax.checkpoint): ~2x activation-memory reduction for larger batches /
    # hidden widths at the cost of recompute.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        latlon_coords: T.Optional[Array] = None,
        training: bool = False,
    ) -> T.Dict[str, Array]:
        """x: (B, T, H, W, C) image time series, channel-last."""
        channels = [
            self.hidden_channels,
            self.hidden_channels * 2,
            self.hidden_channels * 4,
            self.hidden_channels * 8,
        ]
        up_channels = self.hidden_channels * 4

        if self.temporal_encoder == "transformer":
            embeddings = TemporalTransformer(
                out_channels=channels[0],
                d_model=channels[0],
                activation_type=self.activation_type,
                dropout=self.dropout,
                name="pre_unet",
            )(x, training)
        else:
            embeddings = PreTimeReduction(
                out_channels=channels[0],
                in_time=self.in_time,
                activation_type=self.activation_type,
                name="pre_unet",
            )(x, training)

        encoder_cls = TowerUNetEncoder
        decoder_cls = TowerUNetDecoder
        fusion_cls = TowerUNetFusion
        if self.remat:
            encoder_cls = nn.remat(TowerUNetEncoder, static_argnums=(2,))
            decoder_cls = nn.remat(TowerUNetDecoder, static_argnums=(2,))
            fusion_cls = nn.remat(TowerUNetFusion, static_argnums=(4,))

        encoded = encoder_cls(
            channels=channels,
            dilations=self.dilations,
            activation_type=self.activation_type,
            dropout=self.dropout,
            res_block_type=self.res_block_type,
            attention_weights=None,
            pool_by_max=self.pool_by_max,
            batchnorm_first=self.batchnorm_first,
            name="encoder",
        )(embeddings, training)

        decoded = decoder_cls(
            up_channels=up_channels,
            dilations=self.dilations,
            activation_type=self.activation_type,
            dropout=self.dropout,
            res_block_type=self.res_block_type,
            attention_weights=self.attention_weights,
            batchnorm_first=self.batchnorm_first,
            name="decoder",
        )(encoded, training)

        towers_fused = fusion_cls(
            channels=channels,
            up_channels=up_channels,
            dilations=self.dilations,
            activation_type=self.activation_type,
            dropout=self.dropout,
            res_block_type=self.res_block_type,
            attention_weights=None,
            batchnorm_first=self.batchnorm_first,
            use_latlon=self.use_latlon,
            name="tower_fusion",
        )(encoded, decoded, latlon_coords, training)

        size_a = towers_fused["x_tower_a"].shape[1:3]
        out_a = TowerUNetFinal(
            num_classes=self.num_classes,
            activation_type=self.activation_type,
            name="final_a",
        )(towers_fused["x_tower_a"], suffix="_a", training=training)
        out_b = TowerUNetFinal(
            num_classes=self.num_classes,
            activation_type=self.activation_type,
            resample_factor=2,
            name="final_b",
        )(towers_fused["x_tower_b"], size=size_a, suffix="_b", training=training)
        out_c = TowerUNetFinal(
            num_classes=self.num_classes,
            activation_type=self.activation_type,
            resample_factor=4,
            name="final_c",
        )(towers_fused["x_tower_c"], size=size_a, suffix="_c", training=training)

        return TowerUNetFinalCombine(
            num_classes=self.num_classes,
            edge_activation=self.edge_activation,
            mask_activation=self.mask_activation,
            name="final_combine",
        )(out_a, out_b, out_c, suffixes=("_a", "_b", "_c"))

"""TowerUNet structural parts (NHWC, flax.linen).

Reference: nn/modules/unet_parts.py. Per-resolution neighborhood-attention
parameters (NATTEN_PARAMS) match unet_parts.py:19-40. All spatial sizes are
static at trace time, so the reference's runtime ``check_upsample`` fixups
become compile-time resize decisions.
"""

import typing as T

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..enums import AttentionTypes, InferenceNames, ResBlockTypes
from ..nn.activations import get_activation
from ..nn.blocks import (
    ConvBlock2d,
    ConvTranspose2d,
    PoolResidualConv,
    ResidualAConv,
    ResidualConv,
)
from ..nn.init import kaiming_normal, normal_bias
from ..nn.packed import (
    ConvBlockParams,
    ConvKernel,
    conv2d_same,
    packed_batch_norm,
)

Array = jax.Array

NATTEN_PARAMS = {
    "a": dict(natten_num_heads=4, natten_kernel_size=3, natten_dilation=2),
    "b": dict(natten_num_heads=4, natten_kernel_size=3, natten_dilation=1),
    "c": dict(natten_num_heads=8, natten_kernel_size=3, natten_dilation=1),
    "d": dict(natten_num_heads=8, natten_kernel_size=1, natten_dilation=1),
}


class SigmoidCrisp(nn.Module):
    """Learnable-temperature sigmoid (reference unet_parts.py:43-98)."""

    smooth: float = 1e-2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gamma = self.param("gamma", nn.initializers.ones, (1,))
        scale = 1.0 / (self.smooth + jax.nn.sigmoid(gamma))
        return jax.nn.sigmoid(x * scale)


class GeoEmbeddings(nn.Module):
    """(lon, lat) degrees -> unit-sphere Cartesian -> linear embedding
    (reference nn/modules/geo_encoding.py:5-26)."""

    channels: int

    @nn.compact
    def __call__(self, latlon_coords: Array) -> Array:
        radians = jnp.deg2rad(latlon_coords)
        lon, lat = radians[:, 0], radians[:, 1]
        cartesian = jnp.stack(
            [
                jnp.cos(lat) * jnp.cos(lon),
                jnp.cos(lat) * jnp.sin(lon),
                jnp.sin(lat),
            ],
            axis=-1,
        )
        cartesian = jax.lax.stop_gradient(cartesian)
        return nn.Dense(
            self.channels,
            kernel_init=kaiming_normal,
            bias_init=normal_bias,
        )(cartesian)


class StreamConv2d(nn.Module):
    """H -> hidden -> out task-stream conv (reference unet_parts.py:196-224)."""

    hidden_channels: int
    out_channels: int
    activation_type: str = "SiLU"

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        x = ConvBlock2d(
            out_channels=self.hidden_channels,
            kernel_size=3,
            padding=1,
            add_activation=True,
            activation_type=self.activation_type,
        )(x, training)
        return nn.Conv(
            self.out_channels,
            (3, 3),
            padding=1,
            kernel_init=kaiming_normal,
            bias_init=normal_bias,
        )(x)


class _StreamHolder(nn.Module):
    """Parameter tree of one ``StreamConv2d`` (ConvBlock2d_0 + Conv_0) —
    identical names, shapes, and init draws, consumed by the packed head."""

    in_channels: int
    hidden_channels: int = 3
    out_channels: int = 1

    @nn.compact
    def __call__(self, new_stats=None):
        k1, bn = ConvBlockParams(
            (3, 3, self.in_channels, self.hidden_channels),
            name="ConvBlock2d_0",
        )(new_stats)
        k2, b2 = ConvKernel(
            (3, 3, self.hidden_channels, self.out_channels),
            with_bias=True,
            name="Conv_0",
        )()
        return k1, bn, k2, b2


class TowerUNetFinal(nn.Module):
    """Psi-Net style multi-stream head for one tower
    (reference unet_parts.py:227-309)."""

    num_classes: int
    activation_type: str = "SiLU"
    resample_factor: int = 0

    @nn.compact
    def __call__(
        self,
        x: Array,
        size: T.Optional[T.Tuple[int, int]] = None,
        suffix: str = "",
        training: bool = False,
    ) -> T.Dict[str, Array]:
        if size is not None:
            x = ConvTranspose2d(
                out_channels=x.shape[-1],
                kernel_size=3,
                stride=self.resample_factor,
                padding=1,
                name="up_conv",
            )(x, size)

        from ..ops.flags import packed_head_enabled

        if packed_head_enabled():
            h = self._packed_streams(x, training)
        else:
            dist_h = StreamConv2d(
                3, 1, self.activation_type, name="dist_conv"
            )(x, training)
            edge_h = StreamConv2d(
                3, 1, self.activation_type, name="edge_conv"
            )(x, training)
            crop_h = StreamConv2d(
                3, 1, self.activation_type, name="crop_conv"
            )(x, training)
            h = jnp.concatenate([dist_h, edge_h, crop_h], axis=-1)
        h = ConvBlock2d(
            out_channels=3,
            kernel_size=3,
            padding=1,
            add_activation=True,
            activation_type=self.activation_type,
            name="fuse_conv",
        )(h, training)
        dist_out, edge_out, mask_out = jnp.split(h, 3, axis=-1)

        return {
            f"{InferenceNames.DISTANCE}{suffix}": dist_out,
            f"{InferenceNames.EDGE}{suffix}": edge_out,
            f"{InferenceNames.CROP}{suffix}": mask_out,
        }

    def _packed_streams(self, x: Array, training: bool) -> Array:
        """All three task streams in one MXU pass each.

        The unpacked path runs six 1-3-output-channel convs + three
        BatchNorms per tower; with 1-3 channels on the lane minor every one
        of them pads to 128 lanes (BASELINE.md MFU ablation: 2-3% MFU,
        ~3-5 ms/tower). Packing the streams widens the lane fill 3x and
        cuts the op count to two convs + one (grouped) BatchNorm:

        - conv1: the three H->3 kernels concatenated -> one H->9 conv;
          each output channel's contraction is unchanged, so values match
          the unpacked path.
        - BatchNorm over the 9 packed channels with per-stream params
          (flax semantics replicated: fp32 fast-variance stats, momentum
          0.9 running averages written back per stream).
        - conv2: the three 3->1 kernels as one block-diagonal 9->3 conv
          (off-block zeros, so each output is the exact per-stream sum).

        Parameter names, shapes, and init draws are identical to the
        unpacked path (holder modules above), so checkpoints and the
        torch importer are unaffected.
        """
        act = get_activation(self.activation_type)
        c = x.shape[-1]
        names = ("dist_conv", "edge_conv", "crop_conv")
        holders = {n: _StreamHolder(in_channels=c, name=n) for n in names}
        parts = {n: holders[n]() for n in names}

        k1 = jnp.concatenate(
            [parts[n][0] for n in names], axis=-1
        )  # (3, 3, C, 9)
        x9 = conv2d_same(x, k1)

        y, (mean, var) = packed_batch_norm(
            x9, [parts[n][1] for n in names], training
        )
        if training:
            for i, n in enumerate(names):
                holders[n]((mean[3 * i : 3 * i + 3], var[3 * i : 3 * i + 3]))
        y = act(y)

        k2 = jnp.zeros((3, 3, 9, 3), y.dtype)
        for i, n in enumerate(names):
            k2 = k2.at[:, :, 3 * i : 3 * i + 3, i].set(
                parts[n][2][..., 0].astype(y.dtype)
            )
        b2 = jnp.concatenate([parts[n][3] for n in names]).astype(y.dtype)
        h = (
            jax.lax.conv_general_dilated(
                y,
                k2,
                window_strides=(1, 1),
                padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + b2
        )
        return h


class TowerUNetFinalCombine(nn.Module):
    """Learnable reciprocal-gamma weighted fusion of the three towers
    (reference unet_parts.py:101-193)."""

    num_classes: int
    edge_activation: bool = True
    mask_activation: bool = True

    @nn.compact
    def __call__(
        self,
        out_a: T.Dict[str, Array],
        out_b: T.Dict[str, Array],
        out_c: T.Dict[str, Array],
        suffixes: T.Sequence[str] = ("_a", "_b", "_c"),
    ) -> T.Dict[str, Array]:
        def combine(task: str, out_channels: int, name: str) -> Array:
            gammas = [
                self.param(f"{name}_gamma{i}", nn.initializers.ones, (1,))
                for i in (1, 2, 3)
            ]
            parts = [out_a, out_b, out_c]
            total = 0.0
            for gamma, part, suffix in zip(gammas, parts, suffixes):
                total = total + part[f"{task}{suffix}"] / gamma
            return nn.Conv(
                out_channels,
                (1, 1),
                kernel_init=kaiming_normal,
                bias_init=normal_bias,
                name=f"final_{name}",
            )(total)

        distance = jax.nn.sigmoid(
            combine(InferenceNames.DISTANCE, 1, "dist")
        )

        edge = combine(InferenceNames.EDGE, 1, "edge")
        if self.edge_activation:
            edge = SigmoidCrisp(name="edge_crisp")(edge)

        crop = combine(InferenceNames.CROP, self.num_classes, "crop")
        if self.mask_activation:
            crop = jax.nn.sigmoid(crop)

        return {
            InferenceNames.DISTANCE: distance,
            InferenceNames.EDGE: edge,
            InferenceNames.CROP: crop,
        }


class UNetUpBlock(nn.Module):
    """Transposed-conv upsample + residual block
    (reference unet_parts.py:312-374)."""

    out_channels: int
    kernel_size: int = 3
    num_blocks: int = 2
    attention_weights: T.Optional[str] = None
    activation_type: str = "SiLU"
    res_block_type: str = ResBlockTypes.RESA
    dilations: T.Optional[T.Sequence[int]] = None
    batchnorm_first: bool = False
    resample_up: bool = True
    natten_num_heads: int = 8
    natten_kernel_size: int = 3
    natten_dilation: int = 1
    natten_attn_drop: float = 0.0
    natten_proj_drop: float = 0.0

    @nn.compact
    def __call__(
        self, x: Array, size: T.Tuple[int, int], training: bool = False
    ) -> Array:
        if tuple(x.shape[1:3]) != tuple(size):
            x = ConvTranspose2d(
                out_channels=x.shape[-1], name="up_conv"
            )(x, size)

        if self.res_block_type == ResBlockTypes.RES:
            return ResidualConv(
                out_channels=self.out_channels,
                kernel_size=self.kernel_size,
                num_blocks=self.num_blocks,
                attention_weights=self.attention_weights,
                activation_type=self.activation_type,
                batchnorm_first=self.batchnorm_first,
                name="res_conv",
            )(x, training)
        return ResidualAConv(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            dilations=self.dilations,
            attention_weights=self.attention_weights,
            activation_type=self.activation_type,
            batchnorm_first=self.batchnorm_first,
            natten_num_heads=self.natten_num_heads,
            natten_kernel_size=self.natten_kernel_size,
            natten_dilation=self.natten_dilation,
            natten_attn_drop=self.natten_attn_drop,
            natten_proj_drop=self.natten_proj_drop,
            name="res_conv",
        )(x, training)


class TowerUNetEncoder(nn.Module):
    """4-stage backbone at 1/1, 1/2, 1/4, 1/8 resolution
    (reference unet_parts.py:377-449)."""

    channels: T.Sequence[int]
    dilations: T.Optional[T.Sequence[int]] = None
    activation_type: str = "SiLU"
    dropout: float = 0.0
    res_block_type: str = ResBlockTypes.RESA
    attention_weights: T.Optional[str] = AttentionTypes.NATTEN
    pool_by_max: bool = False
    batchnorm_first: bool = False

    @nn.compact
    def __call__(
        self, x: Array, training: bool = False
    ) -> T.Dict[str, Array]:
        dilations = (
            list(self.dilations) if self.dilations is not None else [1, 2]
        )
        common = dict(
            dropout=self.dropout,
            activation_type=self.activation_type,
            res_block_type=self.res_block_type,
            batchnorm_first=self.batchnorm_first,
            pool_by_max=self.pool_by_max,
            natten_attn_drop=self.dropout,
            natten_proj_drop=self.dropout,
        )
        x_a = PoolResidualConv(
            out_channels=self.channels[0],
            dilations=dilations,
            pool_first=False,
            attention_weights=self.attention_weights,
            name="down_a",
            **{**common, **NATTEN_PARAMS["a"]},
        )(x, training)
        x_b = PoolResidualConv(
            out_channels=self.channels[1],
            dilations=dilations[:3],
            attention_weights=self.attention_weights,
            name="down_b",
            **{**common, **NATTEN_PARAMS["b"]},
        )(x_a, training)
        x_c = PoolResidualConv(
            out_channels=self.channels[2],
            dilations=dilations[:2],
            attention_weights=self.attention_weights,
            name="down_c",
            **{**common, **NATTEN_PARAMS["c"]},
        )(x_b, training)
        x_d = PoolResidualConv(
            out_channels=self.channels[3],
            kernel_size=1,
            num_blocks=1,
            dilations=[1],
            attention_weights=None,
            name="down_d",
            **common,
        )(x_c, training)
        return {"x_a": x_a, "x_b": x_b, "x_c": x_c, "x_d": x_d}


class TowerUNetDecoder(nn.Module):
    """1/8 bottleneck + 3 up blocks all at ``up_channels``
    (reference unet_parts.py:452-525)."""

    up_channels: int
    dilations: T.Optional[T.Sequence[int]] = None
    activation_type: str = "SiLU"
    dropout: float = 0.0
    res_block_type: str = ResBlockTypes.RESA
    attention_weights: T.Optional[str] = AttentionTypes.NATTEN
    batchnorm_first: bool = False

    @nn.compact
    def __call__(
        self, x: T.Dict[str, Array], training: bool = False
    ) -> T.Dict[str, Array]:
        dilations = (
            list(self.dilations) if self.dilations is not None else [1, 2]
        )
        common = dict(
            activation_type=self.activation_type,
            res_block_type=self.res_block_type,
            batchnorm_first=self.batchnorm_first,
            natten_attn_drop=self.dropout,
            natten_proj_drop=self.dropout,
        )
        x_du = UNetUpBlock(
            out_channels=self.up_channels,
            kernel_size=1,
            num_blocks=1,
            dilations=[1],
            resample_up=False,
            attention_weights=None,
            name="over_d",
            **common,
        )(x["x_d"], size=x["x_d"].shape[1:3], training=training)

        x_cu = UNetUpBlock(
            out_channels=self.up_channels,
            dilations=dilations[:2],
            attention_weights=self.attention_weights,
            name="up_cu",
            **{**common, **NATTEN_PARAMS["c"]},
        )(x_du, size=x["x_c"].shape[1:3], training=training)
        x_bu = UNetUpBlock(
            out_channels=self.up_channels,
            dilations=dilations[:3],
            attention_weights=self.attention_weights,
            name="up_bu",
            **{**common, **NATTEN_PARAMS["b"]},
        )(x_cu, size=x["x_b"].shape[1:3], training=training)
        x_au = UNetUpBlock(
            out_channels=self.up_channels,
            dilations=dilations,
            attention_weights=self.attention_weights,
            name="up_au",
            **{**common, **NATTEN_PARAMS["a"]},
        )(x_bu, size=x["x_a"].shape[1:3], training=training)

        return {"x_au": x_au, "x_bu": x_bu, "x_cu": x_cu, "x_du": x_du}


class TowerUNetBlock(nn.Module):
    """One UNet3+-style full-scale fusion tower
    (reference unet_parts.py:615-760)."""

    up_channels: int
    out_channels: int
    tower: bool = False
    kernel_size: int = 3
    num_blocks: int = 2
    attention_weights: T.Optional[str] = None
    res_block_type: str = ResBlockTypes.RESA
    dilations: T.Optional[T.Sequence[int]] = None
    activation_type: str = "SiLU"
    batchnorm_first: bool = False
    natten_num_heads: int = 8
    natten_kernel_size: int = 3
    natten_dilation: int = 1
    natten_attn_drop: float = 0.0
    natten_proj_drop: float = 0.0
    use_latlon: bool = False

    @nn.compact
    def __call__(
        self,
        backbone_side: Array,
        backbone_down: Array,
        decode_side: Array,
        decode_down: Array,
        tower_down: T.Optional[Array] = None,
        latlon_coords: T.Optional[Array] = None,
        training: bool = False,
    ) -> Array:
        size = decode_side.shape[1:3]

        backbone_down = ConvTranspose2d(
            out_channels=backbone_down.shape[-1], name="backbone_down_conv"
        )(backbone_down, size)
        decode_down = ConvTranspose2d(
            out_channels=self.up_channels, name="decode_down_conv"
        )(decode_down, size)

        parts = [backbone_side, backbone_down, decode_side, decode_down]

        if self.use_latlon:
            assert latlon_coords is not None, "No lat/lon coordinates given."
            embeddings = GeoEmbeddings(
                channels=self.up_channels, name="geo_embeddings"
            )(latlon_coords)
            embeddings = jnp.broadcast_to(
                embeddings[:, None, None, :],
                (embeddings.shape[0], size[0], size[1], embeddings.shape[-1]),
            )
            parts.append(embeddings)

        if tower_down is not None:
            parts.append(
                ConvTranspose2d(
                    out_channels=self.up_channels, name="tower_conv"
                )(tower_down, size)
            )

        x = jnp.concatenate(parts, axis=-1)

        if self.res_block_type == ResBlockTypes.RES:
            return ResidualConv(
                out_channels=self.out_channels,
                kernel_size=self.kernel_size,
                num_blocks=self.num_blocks,
                attention_weights=self.attention_weights,
                activation_type=self.activation_type,
                batchnorm_first=self.batchnorm_first,
                name="res_conv",
            )(x, training)
        return ResidualAConv(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            num_blocks=self.num_blocks,
            dilations=self.dilations,
            attention_weights=self.attention_weights,
            activation_type=self.activation_type,
            batchnorm_first=self.batchnorm_first,
            natten_num_heads=self.natten_num_heads,
            natten_kernel_size=self.natten_kernel_size,
            natten_dilation=self.natten_dilation,
            natten_attn_drop=self.natten_attn_drop,
            natten_proj_drop=self.natten_proj_drop,
            name="res_conv",
        )(x, training)


class TowerUNetFusion(nn.Module):
    """Three cascaded fusion towers c -> b -> a
    (reference unet_parts.py:528-612)."""

    channels: T.Sequence[int]
    up_channels: int
    dilations: T.Optional[T.Sequence[int]] = None
    activation_type: str = "SiLU"
    dropout: float = 0.0
    res_block_type: str = ResBlockTypes.RESA
    attention_weights: T.Optional[str] = None
    batchnorm_first: bool = False
    use_latlon: bool = False

    @nn.compact
    def __call__(
        self,
        encoded: T.Dict[str, Array],
        decoded: T.Dict[str, Array],
        latlon_coords: T.Optional[Array] = None,
        training: bool = False,
    ) -> T.Dict[str, Array]:
        dilations = (
            list(self.dilations) if self.dilations is not None else [1, 2]
        )
        common = dict(
            up_channels=self.up_channels,
            out_channels=self.up_channels,
            activation_type=self.activation_type,
            res_block_type=self.res_block_type,
            batchnorm_first=self.batchnorm_first,
            attention_weights=self.attention_weights,
            natten_attn_drop=self.dropout,
            natten_proj_drop=self.dropout,
            use_latlon=self.use_latlon,
        )
        x_tower_c = TowerUNetBlock(
            dilations=dilations[:2],
            name="tower_c",
            **{**common, **NATTEN_PARAMS["c"]},
        )(
            backbone_side=encoded["x_c"],
            backbone_down=encoded["x_d"],
            decode_side=decoded["x_cu"],
            decode_down=decoded["x_du"],
            latlon_coords=latlon_coords,
            training=training,
        )
        x_tower_b = TowerUNetBlock(
            tower=True,
            dilations=dilations,
            name="tower_b",
            **{**common, **NATTEN_PARAMS["b"]},
        )(
            backbone_side=encoded["x_b"],
            backbone_down=encoded["x_c"],
            decode_side=decoded["x_bu"],
            decode_down=decoded["x_cu"],
            tower_down=x_tower_c,
            latlon_coords=latlon_coords,
            training=training,
        )
        x_tower_a = TowerUNetBlock(
            tower=True,
            dilations=dilations,
            name="tower_a",
            **{**common, **NATTEN_PARAMS["a"]},
        )(
            backbone_side=encoded["x_a"],
            backbone_down=encoded["x_b"],
            decode_side=decoded["x_au"],
            decode_down=decoded["x_bu"],
            tower_down=x_tower_b,
            latlon_coords=latlon_coords,
            training=training,
        )
        return {
            "x_tower_a": x_tower_a,
            "x_tower_b": x_tower_b,
            "x_tower_c": x_tower_c,
        }

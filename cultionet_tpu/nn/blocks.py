"""Convolutional building blocks (NHWC, flax.linen).

TPU-native re-design of the reference's conv zoo
(nn/modules/convolution.py:21-513): same block topology (ResUNet-a residual
dilated branches, CBAM / neighborhood attention, strided-conv or max-pool
downsampling, transposed-conv upsampling with bilinear size fixups), expressed
with static shapes and channel-last layout so XLA tiles convs onto the MXU.
"""

import typing as T

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..enums import AttentionTypes, ResBlockTypes
from .activations import get_activation
from .attention import NeighborhoodAttention2D, SpatialChannelAttention
from .init import batchnorm_scale, kaiming_normal, normal_bias
from .resize import resize_bilinear_align_corners

Array = jax.Array


class BatchNorm(nn.Module):
    """BatchNorm2d equivalent (torch defaults: momentum 0.1, eps 1e-5),
    with the reference's N(1, 0.02) scale init (layers/weights.py:37-39)."""

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        from ..ops.flags import identity_bn_enabled

        if identity_bn_enabled():
            # Measurement-only: bounds the BN-fold gain on the inference
            # path (experiments/bn_fold_bench.py). No params created.
            return x
        return nn.BatchNorm(
            use_running_average=not training,
            momentum=0.9,
            epsilon=1e-5,
            scale_init=batchnorm_scale,
        )(x)


class DepthwiseSeparableConv(nn.Module):
    """Reference convolution.py:21-42."""

    out_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_channels = x.shape[-1]
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            padding=self.kernel_size // 2,
            feature_group_count=in_channels,
            kernel_init=kaiming_normal,
            bias_init=normal_bias,
        )(x)
        x = nn.Conv(
            self.out_channels,
            (1, 1),
            kernel_init=kaiming_normal,
            bias_init=normal_bias,
        )(x)
        return x


class ConvTranspose2d(nn.Module):
    """Transposed conv (k=3, s=2, p=1 torch-geometry) + bilinear size fixup.

    Output length is ``(in-1)*stride + kernel - 2*padding`` (torch semantics,
    reference convolution.py:45-68); any residual mismatch with the requested
    ``size`` is fixed with align-corners bilinear resize (functional.py:72-81).
    """

    out_channels: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1

    @nn.compact
    def __call__(self, x: Array, size: T.Tuple[int, int]) -> Array:
        in_h, in_w = x.shape[1], x.shape[2]
        x = nn.ConvTranspose(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="VALID",
            kernel_init=kaiming_normal,
            bias_init=normal_bias,
        )(x)
        # flax VALID length is in*s + max(k - s, 0); torch semantics are
        # (in-1)*s + k - 2p — crop p from the start and p (+ the s-k grid
        # surplus when stride exceeds the kernel) from the end.
        p = self.padding
        target_h = (in_h - 1) * self.stride + self.kernel_size - 2 * p
        target_w = (in_w - 1) * self.stride + self.kernel_size - 2 * p
        x = x[:, p : p + target_h, p : p + target_w, :]
        return resize_bilinear_align_corners(x, size)


class ConvBlock2d(nn.Module):
    """Conv + BN + activation, order switchable (reference convolution.py:71-120)."""

    out_channels: int
    kernel_size: int
    padding: int = 0
    dilation: int = 1
    stride: int = 1
    add_activation: bool = True
    activation_type: str = "SiLU"
    batchnorm_first: bool = False

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        act = get_activation(self.activation_type)
        conv_kwargs = dict(
            features=self.out_channels,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            kernel_init=kaiming_normal,
        )
        if self.batchnorm_first:
            x = BatchNorm()(x, training)
            x = act(x)
            x = nn.Conv(use_bias=True, bias_init=normal_bias, **conv_kwargs)(x)
        else:
            x = nn.Conv(use_bias=False, **conv_kwargs)(x)
            x = BatchNorm()(x, training)
            if self.add_activation:
                x = act(x)
        return x


class ResConvBlock2d(nn.Module):
    """Stacked conv blocks for a residual branch (reference convolution.py:123-176).

    The first block uses dilation 1 / same padding; subsequent blocks use
    dilation ``max(1, dilation - 1)`` — the reference's exact rule.
    """

    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    activation_type: str = "SiLU"
    num_blocks: int = 2
    batchnorm_first: bool = False

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        assert self.num_blocks > 0

        x = ConvBlock2d(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            padding=0 if self.kernel_size == 1 else self.kernel_size // 2,
            dilation=1,
            activation_type=self.activation_type,
            add_activation=True,
            batchnorm_first=self.batchnorm_first,
        )(x, training)

        for _ in range(self.num_blocks - 1):
            x = ConvBlock2d(
                out_channels=self.out_channels,
                kernel_size=self.kernel_size,
                padding=0
                if self.kernel_size == 1
                else max(1, self.dilation - 1),
                dilation=1 if self.kernel_size == 1 else max(1, self.dilation - 1),
                activation_type=self.activation_type,
                add_activation=True,
                batchnorm_first=self.batchnorm_first,
            )(x, training)
        return x


class ResidualConv(nn.Module):
    """Residual conv with optional CBAM gate (reference convolution.py:179-247)."""

    out_channels: int
    kernel_size: int = 3
    num_blocks: int = 2
    attention_weights: T.Optional[str] = None
    activation_type: str = "SiLU"
    batchnorm_first: bool = False

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        if self.attention_weights is not None:
            assert self.attention_weights == AttentionTypes.SPATIAL_CHANNEL

        if x.shape[-1] != self.out_channels:
            out = nn.Conv(
                self.out_channels,
                (1, 1),
                kernel_init=kaiming_normal,
                bias_init=normal_bias,
                name="skip",
            )(x)
        else:
            out = x

        out = out + ResConvBlock2d(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            num_blocks=self.num_blocks,
            activation_type=self.activation_type,
            batchnorm_first=self.batchnorm_first,
        )(x, training)

        if self.attention_weights is not None:
            attention = SpatialChannelAttention(
                activation_type=self.activation_type
            )(out)
            gamma = self.param("gamma", nn.initializers.ones, (1,))
            out = out * (1.0 + gamma * attention)
            out = get_activation(self.activation_type)(out)

        return out


class ResidualAConv(nn.Module):
    """ResUNet-a block: parallel dilated branches summed onto a 1x1 skip,
    with optional neighborhood / CBAM attention (reference convolution.py:250-395)."""

    out_channels: int
    kernel_size: int = 3
    num_blocks: int = 2
    dilations: T.Optional[T.Sequence[int]] = None
    attention_weights: T.Optional[str] = None
    activation_type: str = "SiLU"
    batchnorm_first: bool = False
    natten_num_heads: int = 8
    natten_kernel_size: int = 3
    natten_dilation: int = 1
    natten_attn_drop: float = 0.0
    natten_proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        from ..ops.flags import packed_resa_enabled

        dilations = (
            list(self.dilations) if self.dilations is not None else [1, 2]
        )

        if x.shape[-1] != self.out_channels:
            out = nn.Conv(
                self.out_channels,
                (1, 1),
                kernel_init=kaiming_normal,
                bias_init=normal_bias,
                name="skip",
            )(x)
        else:
            out = x

        skip = out

        # Under the reference's dilation rule (first conv always dilation 1,
        # later convs max(1, d-1) — ResConvBlock2d above) every branch with
        # d <= 2 has IDENTICAL conv geometry, so the parallel branches can
        # run as one wide conv + one grouped conv (see _packed_branches).
        # Width policy (BASELINE.md probe + fragment ablation): packing
        # wins only while the branch convs underfill the 128-lane tile;
        # at out_channels >= 128 the packed variants lose to XLA's own
        # scheduling (decoder 13.4 -> 19.7 ms), so wide blocks stay
        # unpacked.
        packable = (
            packed_resa_enabled()
            and not self.batchnorm_first
            and self.kernel_size == 3
            and self.num_blocks == 2
            and self.out_channels <= 64
            and len(dilations) > 1
            and all(d <= 2 for d in dilations)
        )
        if packable:
            out = out + self._packed_branches(x, len(dilations), training)
        else:
            for i, dilation in enumerate(dilations):
                out = out + ResConvBlock2d(
                    out_channels=self.out_channels,
                    kernel_size=self.kernel_size,
                    dilation=dilation,
                    activation_type=self.activation_type,
                    num_blocks=self.num_blocks,
                    batchnorm_first=self.batchnorm_first,
                    name=f"res_branch_{i}",
                )(x, training)

        if self.attention_weights == AttentionTypes.NATTEN:
            # LayerNorm sandwich around neighborhood attention, added to the
            # residual sum (reference convolution.py:336-353, 388-391).
            attention = nn.LayerNorm(epsilon=1e-5)(skip)
            attention = NeighborhoodAttention2D(
                num_heads=self.natten_num_heads,
                kernel_size=self.natten_kernel_size,
                dilation=self.natten_dilation,
                attn_drop=self.natten_attn_drop,
                proj_drop=self.natten_proj_drop,
            )(attention, training)
            attention = nn.LayerNorm(epsilon=1e-5)(attention)
            out = out + attention
        elif self.attention_weights == AttentionTypes.SPATIAL_CHANNEL:
            out = out * SpatialChannelAttention(
                activation_type=self.activation_type
            )(skip)
        elif self.attention_weights is not None:
            raise ValueError(
                f"Unsupported attention type: {self.attention_weights}"
            )

        return out

    def _packed_branches(self, x: Array, n: int, training: bool) -> Array:
        """Sum of the n parallel dilated branches, computed packed.

        XLA executes the branches sequentially: at hidden=32 each branch
        conv keeps only 32-128 of the MXU's 128 output lanes busy
        (BASELINE.md MFU ablation: encoder 8%). Packing runs all branches
        at once:

        - conv1: the n C->O kernels concatenated -> one C->n*O conv (each
          output channel's contraction is unchanged, so values match).
        - one grouped BatchNorm + activation over the packed channels
          (BN is per-channel, so statistics are identical to per-branch).
        - conv2 (branch-local O->O) by measured width policy: a dense
          block-diagonal n*O->n*O conv when O <= 32 (2x FLOPs, but
          zero-block contributions are exact zeros and the 4x lane fill
          wins: 2.79 vs 3.53 ms at O=32; `feature_group_count` lowers
          ~1.5x SLOWER on TPU and is not used), else per-branch convs on
          the packed halves (never worse than unpacked, BASELINE.md).

        Parameter names, shapes, and init draws are identical to the
        unpacked path (nn/packed.py holders), so checkpoints and the
        torch importer are unaffected.
        """
        from .packed import (
            ResBranchParams,
            conv2d_same,
            packed_batch_norm,
        )

        act = get_activation(self.activation_type)
        o = self.out_channels
        holders = [
            ResBranchParams(x.shape[-1], o, name=f"res_branch_{i}")
            for i in range(n)
        ]
        parts = [h() for h in holders]

        k1 = jnp.concatenate([p[0] for p in parts], axis=-1)  # (3,3,C,n*O)
        z = conv2d_same(x, k1)
        z, (mean1, var1) = packed_batch_norm(
            z, [p[1] for p in parts], training
        )
        z = act(z)

        if o <= 32:
            k2 = jnp.zeros((3, 3, n * o, n * o), parts[0][2].dtype)
            for i, p in enumerate(parts):
                sl = slice(i * o, (i + 1) * o)
                k2 = k2.at[:, :, sl, sl].set(p[2])
            z = conv2d_same(z, k2)
        else:
            z = jnp.concatenate(
                [
                    conv2d_same(z[..., i * o : (i + 1) * o], p[2])
                    for i, p in enumerate(parts)
                ],
                axis=-1,
            )
        z, (mean2, var2) = packed_batch_norm(
            z, [p[3] for p in parts], training
        )
        z = act(z)

        if training:
            for i, h in enumerate(holders):
                sl = slice(i * o, (i + 1) * o)
                h(((mean1[sl], var1[sl]), (mean2[sl], var2[sl])))

        total = z[..., :o]
        for i in range(1, n):
            total = total + z[..., i * o : (i + 1) * o]
        return total


def adaptive_max_pool_half(x: Array) -> Array:
    """torch ``adaptive_max_pool2d(x, (H//2, W//2))`` for NHWC.

    For output o = n//2 torch's adaptive windows are exactly a kernel-2
    stride-2 pool for even n and a kernel-3 stride-2 pool for odd n.
    """

    def pool(z: Array, axis_len_h: int, axis_len_w: int) -> Array:
        kh = 2 if axis_len_h % 2 == 0 else 3
        kw = 2 if axis_len_w % 2 == 0 else 3
        return jax.lax.reduce_window(
            z,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, 2, 2, 1),
            padding="VALID",
        )

    return pool(x, x.shape[1], x.shape[2])


class PoolResidualConv(nn.Module):
    """Downsample (strided conv or adaptive max pool) + residual block +
    spatial dropout (reference convolution.py:398-513)."""

    out_channels: int
    dropout: float = 0.0
    kernel_size: int = 3
    num_blocks: int = 2
    attention_weights: T.Optional[str] = None
    activation_type: str = "SiLU"
    res_block_type: str = ResBlockTypes.RESA
    dilations: T.Optional[T.Sequence[int]] = None
    pool_first: bool = True
    pool_by_max: bool = False
    batchnorm_first: bool = False
    natten_num_heads: int = 8
    natten_kernel_size: int = 3
    natten_dilation: int = 1
    natten_attn_drop: float = 0.0
    natten_proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        assert self.res_block_type in (ResBlockTypes.RES, ResBlockTypes.RESA)

        if self.pool_first:
            if self.pool_by_max:
                x = adaptive_max_pool_half(x)
            elif self.batchnorm_first:
                x = nn.Conv(
                    self.out_channels,
                    (3, 3),
                    strides=(2, 2),
                    padding=1,
                    kernel_init=kaiming_normal,
                    bias_init=normal_bias,
                    name="pool_conv",
                )(x)
            else:
                x = ConvBlock2d(
                    out_channels=self.out_channels,
                    kernel_size=3,
                    padding=1,
                    stride=2,
                    add_activation=False,
                    batchnorm_first=False,
                    name="pool_conv",
                )(x, training)

        if self.res_block_type == ResBlockTypes.RES:
            x = ResidualConv(
                out_channels=self.out_channels,
                kernel_size=self.kernel_size,
                attention_weights=self.attention_weights,
                num_blocks=self.num_blocks,
                activation_type=self.activation_type,
                batchnorm_first=self.batchnorm_first,
            )(x, training)
        else:
            x = ResidualAConv(
                out_channels=self.out_channels,
                kernel_size=self.kernel_size,
                dilations=self.dilations,
                num_blocks=self.num_blocks,
                attention_weights=self.attention_weights,
                activation_type=self.activation_type,
                batchnorm_first=self.batchnorm_first,
                natten_num_heads=self.natten_num_heads,
                natten_kernel_size=self.natten_kernel_size,
                natten_dilation=self.natten_dilation,
                natten_attn_drop=self.natten_attn_drop,
                natten_proj_drop=self.natten_proj_drop,
            )(x, training)

        # Dropout2d: drop whole channels (broadcast over H, W).
        x = nn.Dropout(
            rate=self.dropout,
            broadcast_dims=(1, 2),
            deterministic=not training,
        )(x)
        return x

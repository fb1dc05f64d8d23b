"""Parameter holders + helpers for lane-packed execution paths.

Several model fragments run far below the 128-lane TPU tile because their
channel counts are small (1-3-channel Psi-Net head streams) or because
XLA executes architecturally-parallel branches sequentially (the ResUNet-a
dilated branches, reference convolution.py:250-395). The packed paths in
``models/unet_parts.py`` and ``nn/blocks.py`` re-lay-out those fragments
into single wide convolutions WITHOUT touching the parameter tree: the
holder modules here re-create the exact flax scopes (names, shapes, init
draws) of the unpacked modules (``ConvBlock2d``/``StreamConv2d``), so the
packed and unpacked paths share checkpoints and the torch importer
bit-for-bit.

The BatchNorm math replicates flax ``nn.BatchNorm`` semantics (fp32
fast-variance batch stats, momentum 0.9 running averages, eps 1e-5,
output dtype promoted from input x scale x bias) — per-channel statistics
are unchanged by packing because BN is independent per channel.
"""

import typing as T

import jax
import jax.numpy as jnp
from flax import linen as nn

from .init import batchnorm_scale, kaiming_normal, normal_bias

Array = jax.Array
BNParts = T.Tuple[Array, Array, Array, Array]  # scale, bias, ra_mean, ra_var


class ConvKernel(nn.Module):
    """Bare conv-kernel holder: same name/shape/init as an ``nn.Conv``'s
    kernel (+ optional bias)."""

    shape: T.Tuple[int, ...]
    with_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", kaiming_normal, self.shape)
        if not self.with_bias:
            return kernel, None
        return kernel, self.param("bias", normal_bias, (self.shape[-1],))


class BNCore(nn.Module):
    """Param/stat holder matching ``nn.BatchNorm``'s tree (scale, bias,
    batch_stats mean/var). A second call with ``new_stats`` applies the
    running-average update (momentum 0.9 — the repo BatchNorm's setting)."""

    features: int

    @nn.compact
    def __call__(self, new_stats=None) -> BNParts:
        scale = self.param("scale", batchnorm_scale, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats",
            "mean",
            lambda s: jnp.zeros(s, jnp.float32),
            (self.features,),
        )
        ra_var = self.variable(
            "batch_stats",
            "var",
            lambda s: jnp.ones(s, jnp.float32),
            (self.features,),
        )
        if new_stats is not None and not self.is_initializing():
            mean, var = new_stats
            ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
            ra_var.value = 0.9 * ra_var.value + 0.1 * var
        return scale, bias, ra_mean.value, ra_var.value


class BNWrapper(nn.Module):
    """Plays the repo ``BatchNorm`` wrapper scope (one extra name level)."""

    features: int

    @nn.compact
    def __call__(self, new_stats=None) -> BNParts:
        return BNCore(self.features, name="BatchNorm_0")(new_stats)


class ConvBlockParams(nn.Module):
    """Plays a ``ConvBlock2d`` scope: Conv_0 kernel + BatchNorm_0 tree."""

    kernel_shape: T.Tuple[int, ...]

    @nn.compact
    def __call__(self, new_stats=None):
        kernel, _ = ConvKernel(self.kernel_shape, name="Conv_0")()
        bn = BNWrapper(self.kernel_shape[-1], name="BatchNorm_0")(new_stats)
        return kernel, bn


class ResBranchParams(nn.Module):
    """Parameter tree of one ``ResConvBlock2d`` branch with two 3x3 blocks
    (the default ``num_blocks=2``) — identical names, shapes, init draws."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, new_stats=(None, None)):
        k1, bn1 = ConvBlockParams(
            (3, 3, self.in_channels, self.out_channels),
            name="ConvBlock2d_0",
        )(new_stats[0])
        k2, bn2 = ConvBlockParams(
            (3, 3, self.out_channels, self.out_channels),
            name="ConvBlock2d_1",
        )(new_stats[1])
        return k1, bn1, k2, bn2


def packed_batch_norm(
    z: Array,
    bns: T.Sequence[BNParts],
    training: bool,
) -> T.Tuple[Array, T.Tuple[Array, Array]]:
    """Apply BatchNorm over channel-concatenated groups.

    ``bns`` are the per-group (scale, bias, ra_mean, ra_var) tuples whose
    concatenation covers ``z``'s channel axis. Returns the normalized
    array (flax dtype-promotion semantics) and the fp32 batch (mean, var)
    for the caller to write back per group when ``training``.
    """
    from ..ops.flags import identity_bn_enabled

    if identity_bn_enabled():
        # Measurement-only knob (see ops/flags.set_identity_bn).
        return z, (
            jnp.zeros((z.shape[-1],), jnp.float32),
            jnp.ones((z.shape[-1],), jnp.float32),
        )
    scale = jnp.concatenate([b[0] for b in bns])
    bias = jnp.concatenate([b[1] for b in bns])
    if training:
        zf = z.astype(jnp.float32)
        mean = zf.mean(axis=(0, 1, 2))
        var = jnp.maximum((zf * zf).mean(axis=(0, 1, 2)) - mean * mean, 0.0)
    else:
        mean = jnp.concatenate([b[2] for b in bns])
        var = jnp.concatenate([b[3] for b in bns])
    y = (z.astype(jnp.float32) - mean) * (
        jax.lax.rsqrt(var + 1e-5) * scale.astype(jnp.float32)
    ) + bias.astype(jnp.float32)
    out_dtype = jnp.result_type(z.dtype, scale.dtype, bias.dtype)
    return y.astype(out_dtype), (mean, var)


def conv2d_same(
    x: Array,
    kernel: Array,
    feature_group_count: int = 1,
) -> Array:
    """3x3 (or 1x1) stride-1 same-padding NHWC conv on a raw kernel."""
    k = kernel.shape[0]
    pad = k // 2
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
    )

"""Attention modules (NHWC, flax.linen).

Reference semantics: nn/modules/attention.py (CBAM-style spatial+channel
attention) and natten.NeighborhoodAttention2D as embedded at
nn/modules/convolution.py:336-353.
"""


import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from ..ops.natten import neighborhood_attention_2d
from .activations import get_activation
from .init import kaiming_normal, normal_bias

Array = jax.Array


class ChannelAttention(nn.Module):
    """Global avg+max pooled channel gates (reference attention.py:12-62)."""

    activation_type: str = "SiLU"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        channels = x.shape[-1]
        act = get_activation(self.activation_type)

        avg_pool = jnp.mean(x, axis=(1, 2), keepdims=True)
        max_pool = jnp.max(x, axis=(1, 2), keepdims=True)

        def mlp(z: Array, name: str) -> Array:
            z = nn.Conv(
                channels // 2,
                (1, 1),
                use_bias=False,
                kernel_init=kaiming_normal,
                name=f"{name}_fc1",
            )(z)
            z = act(z)
            return nn.Conv(
                channels,
                (1, 1),
                use_bias=False,
                kernel_init=kaiming_normal,
                name=f"{name}_fc2",
            )(z)

        attention = jax.nn.sigmoid(mlp(avg_pool, "avg") + mlp(max_pool, "max"))
        return jnp.broadcast_to(attention, x.shape)


class SpatialAttention(nn.Module):
    """Channel-pooled 3x3 spatial gate (reference attention.py:65-86)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        avg_attention = jnp.mean(x, axis=-1, keepdims=True)
        max_attention = jnp.max(x, axis=-1, keepdims=True)
        attention = jnp.concatenate([avg_attention, max_attention], axis=-1)
        attention = nn.Conv(
            1,
            (3, 3),
            padding=1,
            use_bias=False,
            kernel_init=kaiming_normal,
        )(attention)
        attention = jax.nn.sigmoid(attention)
        return jnp.broadcast_to(attention, x.shape)


class SpatialChannelAttention(nn.Module):
    """CBAM-style gate returning ``1 + gamma * (channel+spatial)/2``
    (reference attention.py:89-125)."""

    activation_type: str = "SiLU"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        channel_attention = ChannelAttention(
            activation_type=self.activation_type
        )(x)
        spatial_attention = SpatialAttention()(x)
        attention = (channel_attention + spatial_attention) * 0.5
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return 1.0 + gamma * attention


class NeighborhoodAttention2D(nn.Module):
    """Multi-head dilated neighborhood attention with fused QKV projection.

    Mirrors natten.NeighborhoodAttention2D(dim, num_heads, kernel_size,
    dilation, rel_pos_bias=False, qkv_bias=True) as configured at reference
    nn/modules/convolution.py:341-350, built on this framework's TPU-native
    neighborhood-attention op.
    """

    num_heads: int
    kernel_size: int
    dilation: int = 1
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        channels = x.shape[-1]
        assert channels % self.num_heads == 0, (
            f"dim {channels} not divisible by heads {self.num_heads}"
        )

        qkv = nn.Dense(
            channels * 3,
            use_bias=True,
            kernel_init=kaiming_normal,
            bias_init=normal_bias,
            name="qkv",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda z: rearrange(
            z, "b h w (n d) -> b h w n d", n=self.num_heads
        )

        from ..ops.flags import pallas_natten_enabled

        dropping = training and self.attn_drop > 0
        if pallas_natten_enabled():
            if dropping:
                # Fused Mosaic kernel with IN-KERNEL attention dropout:
                # the mask stream is seeded from the flax dropout rng and
                # redrawn identically in the backward kernel.
                from ..ops.natten_pallas import na2d_fused_dropout

                seed = jax.random.randint(
                    self.make_rng("dropout"),
                    (),
                    0,
                    jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32,
                )
                out = na2d_fused_dropout(
                    split(q),
                    split(k),
                    split(v),
                    seed,
                    self.kernel_size,
                    self.dilation,
                    float(self.attn_drop),
                )
            else:
                from ..ops.natten_pallas import na2d_fused

                out = na2d_fused(
                    split(q),
                    split(k),
                    split(v),
                    self.kernel_size,
                    self.dilation,
                )
        else:
            weights_fn = None
            if dropping:
                weights_fn = nn.Dropout(
                    rate=self.attn_drop, deterministic=False
                )
            out = neighborhood_attention_2d(
                split(q),
                split(k),
                split(v),
                kernel_size=self.kernel_size,
                dilation=self.dilation,
                weights_fn=weights_fn,
            )
        out = rearrange(out, "b h w n d -> b h w (n d)")
        out = nn.Dense(
            channels,
            use_bias=True,
            kernel_init=kaiming_normal,
            bias_init=normal_bias,
            name="proj",
        )(out)
        out = nn.Dropout(rate=self.proj_drop, deterministic=not training)(out)
        return out

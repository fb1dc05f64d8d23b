"""Temporal embedding front ends.

``PreTimeReduction`` reproduces the reference's 3-D-conv temporal reduction
(models/nunet.py:18-105): two parallel stacks (time kernels 3 and 5), each
collapsing T -> 1 in two convs, summed and LayerNorm'd.

``TemporalTransformer`` is the restored temporal-attention option the
reference removed (SURVEY.md §5 "long-context" — vestiges at
layers/encodings.py:25, lightning.py:260-312): per-pixel self-attention over
the T axis with sinusoidal time encodings, reduced by a learned query. T is
small (~12) so this is pure batched MXU work — no sequence parallelism
needed, just batch/spatial sharding.
"""


import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange
from flax import linen as nn

from ..nn.activations import get_activation
from ..nn.blocks import BatchNorm
from ..nn.init import kaiming_normal, normal_bias

Array = jax.Array


class Conv3d(nn.Module):
    """Two stacked time-axis convolutions collapsing T -> 1.

    Input (B, T, H, W, C); output (B, H, W, out_channels).
    """

    out_channels: int
    in_time: int
    kernel_size: int
    activation_type: str = "SiLU"

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        act = get_activation(self.activation_type)
        in_channels = x.shape[-1]
        remaining_time = self.in_time - self.kernel_size + 1
        assert remaining_time >= 1, (
            f"in_time={self.in_time} too short for temporal kernel "
            f"{self.kernel_size}; need in_time >= {self.kernel_size}"
        )

        x = nn.Conv(
            in_channels,
            (self.kernel_size, 1, 1),
            padding="VALID",
            use_bias=False,
            kernel_init=kaiming_normal,
        )(x)
        x = BatchNorm()(x, training)
        x = act(x)
        x = nn.Conv(
            self.out_channels,
            (remaining_time, 1, 1),
            padding="VALID",
            use_bias=False,
            kernel_init=kaiming_normal,
        )(x)
        x = jnp.squeeze(x, axis=1)  # T collapsed to 1
        x = BatchNorm()(x, training)
        x = act(x)
        return x


class PreTimeReduction(nn.Module):
    """Sum of kT=3 and kT=5 temporal pyramids + LayerNorm
    (reference models/nunet.py:60-105)."""

    out_channels: int
    in_time: int
    activation_type: str = "SiLU"

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        x3 = Conv3d(
            out_channels=self.out_channels,
            in_time=self.in_time,
            kernel_size=3,
            activation_type=self.activation_type,
            name="conv3",
        )(x, training)
        x5 = Conv3d(
            out_channels=self.out_channels,
            in_time=self.in_time,
            kernel_size=5,
            activation_type=self.activation_type,
            name="conv5",
        )(x, training)
        return nn.LayerNorm(epsilon=1e-5)(x3 + x5)


def sinusoid_encoding_table(positions: int, dim: int) -> np.ndarray:
    """UTAE-style sinusoid table (reference layers/encodings.py:25-35)."""
    table = np.array(
        [
            [p / np.power(10000, 2 * (i // 2) / dim) for i in range(dim)]
            for p in range(positions)
        ],
        dtype=np.float32,
    )
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return table


class TemporalTransformer(nn.Module):
    """Per-pixel temporal self-attention embedding, (B,T,H,W,C) -> (B,H,W,out).

    Tokens are per-(pixel, time) channel vectors projected to ``d_model``,
    plus sinusoidal time encodings; ``num_layers`` pre-LN transformer blocks
    run over the T axis; a learned query pools T -> 1.
    """

    out_channels: int
    d_model: int = 64
    num_heads: int = 4
    num_layers: int = 2
    dropout: float = 0.0
    activation_type: str = "SiLU"

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        batch, time, height, width, _ = x.shape

        tokens = rearrange(x, "b t h w c -> (b h w) t c")
        tokens = nn.Dense(
            self.d_model, kernel_init=kaiming_normal, bias_init=normal_bias
        )(tokens)
        pos = jnp.asarray(sinusoid_encoding_table(time, self.d_model))
        tokens = tokens + pos[None]

        for _ in range(self.num_layers):
            attn_in = nn.LayerNorm(epsilon=1e-5)(tokens)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                dropout_rate=self.dropout,
                deterministic=not training,
            )(attn_in, attn_in)
            tokens = tokens + attn
            mlp_in = nn.LayerNorm(epsilon=1e-5)(tokens)
            mlp = nn.Dense(self.d_model * 2)(mlp_in)
            mlp = get_activation(self.activation_type)(mlp)
            mlp = nn.Dense(self.d_model)(mlp)
            tokens = tokens + mlp

        # Learned-query pooling over time.
        query = self.param(
            "pool_query",
            nn.initializers.normal(stddev=0.02),
            (1, 1, self.d_model),
        )
        query = jnp.broadcast_to(query, (tokens.shape[0], 1, self.d_model))
        pooled = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=not training,
        )(nn.LayerNorm(epsilon=1e-5)(query), nn.LayerNorm(epsilon=1e-5)(tokens))
        pooled = jnp.squeeze(pooled, axis=1)

        out = nn.Dense(
            self.out_channels,
            kernel_init=kaiming_normal,
            bias_init=normal_bias,
        )(pooled)
        out = rearrange(
            out, "(b h w) c -> b h w c", b=batch, h=height, w=width
        )
        return nn.LayerNorm(epsilon=1e-5)(out)

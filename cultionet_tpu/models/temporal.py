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


import typing as T

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.activations import get_activation
from ..nn.blocks import BatchNorm
from ..nn.init import kaiming_normal, normal_bias

Array = jax.Array


class _ConvKernel(nn.Module):
    """Bare conv-kernel parameter holder.

    Registers a ``kernel`` param with the same name, shape, and init as an
    unbiased ``nn.Conv`` would, so checkpoints and the torch importer see an
    identical tree, while ``Conv3d`` below consumes the weights through a
    lane-packed matmul instead of a 3-D convolution.
    """

    shape: T.Tuple[int, ...]

    @nn.compact
    def __call__(self) -> Array:
        return self.param("kernel", kaiming_normal, self.shape)


class Conv3d(nn.Module):
    """Two stacked time-axis convolutions collapsing T -> 1.

    Input (B, T, H, W, C); output (B, H, W, out_channels).

    TPU formulation: the naive 3-D conv keeps C (=3 image channels) on the
    lane minor, which Mosaic pads 3 -> 128 — a ~42x HBM-traffic blowup that
    made this 4-GFLOP fragment cost ~9 ms/step (BASELINE.md MFU ablation).
    Instead the (T, C) axes are packed onto the lanes once and both convs
    become matmuls: conv1 (kernel (kT,1,1) over T, C -> C) is a banded
    (T*C, T1*C) matrix built from the conv kernel; conv2 (collapsing the
    remaining T1 steps, C -> out) is its kernel reshaped to (T1*C, out).
    Same parameters, same math (modulo fp reassociation), ~3x faster.
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

        k1 = _ConvKernel(
            (self.kernel_size, 1, 1, in_channels, in_channels),
            name="Conv_0",
        )()
        k2 = _ConvKernel(
            (remaining_time, 1, 1, in_channels, self.out_channels),
            name="Conv_1",
        )()
        k1 = k1.astype(x.dtype)
        k2 = k2.astype(x.dtype)

        b, t, h, w, c = x.shape
        t1 = remaining_time
        # (B, T, H, W, C) -> (B, H, W, T*C): T*C on the lanes.
        xp = jnp.moveaxis(x, 1, 3).reshape(b, h, w, t * c)

        # conv1 as a banded matmul: M1[(t1+d)*C+ci, t1*C+co] = k1[d, ci, co]
        w1 = jnp.squeeze(k1, (1, 2))  # (kT, C, C)
        m1 = jnp.zeros((t, c, t1, c), k1.dtype)
        steps = jnp.arange(t1)
        for d in range(self.kernel_size):
            m1 = m1.at[steps + d, :, steps, :].set(w1[d])
        xp = xp @ m1.reshape(t * c, t1 * c)  # (B, H, W, T1*C)

        # BatchNorm over per-C stats (identical reduction set to the 5-D
        # layout the conv version normalized).
        xr = xp.reshape(b, h, w, t1, c)
        xr = BatchNorm(name="BatchNorm_0")(xr, training)
        xp = act(xr).reshape(b, h, w, t1 * c)

        # conv2 collapses T1 entirely: full contraction over (T1, C).
        m2 = jnp.squeeze(k2, (1, 2)).reshape(t1 * c, self.out_channels)
        xp = xp @ m2  # (B, H, W, out)
        xp = BatchNorm(name="BatchNorm_1")(xp, training)
        return act(xp)


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


def _temporal_axis_attention(
    q: Array, k: Array, v: Array, num_heads: int, batch_chunk: int = 4
) -> Array:
    """Multi-head attention over the T axis of (B, T, H, W, C) tensors.

    On TPU this dispatches to the lane-packed Pallas kernel
    (ops/temporal_pallas.py): zero tile padding, flash-style backward —
    the fix for the XLA layout hazard below.

    XLA-fallback layout hazard: any materialized attention-weights tensor
    here has tiny T/S (~12) dims, and XLA's layout assignment insists on
    placing them on the (8, 128) tile minors — a ~14x padding blowup
    (~10 GB at B=32, 100x100) regardless of einsum orientation. The
    transient is bounded by scanning BATCH CHUNKS with rematerialization:
    ~1.2 GB live per 4-sample chunk, recomputed in the backward.
    """
    from ..ops.flags import pallas_temporal_enabled
    from ..ops.temporal_pallas import supported, temporal_attention_pallas

    if pallas_temporal_enabled() and supported(q.shape[-1]):
        return temporal_attention_pallas(q, k, v, num_heads)

    b = q.shape[0]
    if b > batch_chunk:
        chunk = next(
            (c_ for c_ in range(batch_chunk, 0, -1) if b % c_ == 0), 1
        )
        blocks = b // chunk
        qr = q.reshape(blocks, chunk, *q.shape[1:])
        kr = k.reshape(blocks, chunk, *k.shape[1:])
        vr = v.reshape(blocks, chunk, *v.shape[1:])
        out = jax.lax.map(
            jax.checkpoint(
                lambda args: _attend_t_axis(*args, num_heads=num_heads)
            ),
            (qr, kr, vr),
        )
        return out.reshape(b, *out.shape[2:])
    return _attend_t_axis(q, k, v, num_heads=num_heads)


def _attend_t_axis(
    q: Array, k: Array, v: Array, num_heads: int
) -> Array:
    b, t, h, w, c = q.shape
    s_len = k.shape[1]
    d = c // num_heads
    scale = d ** -0.5
    qh = q.reshape(b, t, h, w, num_heads, d)
    kh = k.reshape(b, s_len, h, w, num_heads, d)
    vh = v.reshape(b, s_len, h, w, num_heads, d)
    logits = jnp.einsum(
        "bthwnd,bshwnd->bntshw", qh * scale, kh,
        preferred_element_type=jnp.float32,
    )
    weights = jax.nn.softmax(logits, axis=3).astype(q.dtype)
    # Weighted sum over S as UNROLLED broadcast multiplies (S ~ 12): a
    # dot_general here makes XLA materialize a transposed copy of the
    # weights with the tiny (T, S) dims on the (8, 128) tile minors —
    # a 14x padding blowup (~10 GB at production scale). Elementwise
    # accumulation fuses instead.
    out = jnp.zeros((b, t, h, w, num_heads, d), dtype=q.dtype)
    for si in range(s_len):
        w_s = jnp.transpose(weights[:, :, :, si], (0, 2, 3, 4, 1))
        out = out + w_s[..., None] * vh[:, si][:, None]
    return out.reshape(b, t, h, w, c)


class _DenseParams(nn.Module):
    """Kernel+bias holder matching an ``nn.Dense`` param tree exactly
    (same names, shapes, and init draws) so the packed-layout pipeline
    below can consume the weights as block-diagonal matmuls while staying
    checkpoint-compatible with the unpacked path."""

    shape: T.Tuple[int, int]
    kernel_init: T.Callable = kaiming_normal
    bias_init: T.Callable = normal_bias

    @nn.compact
    def __call__(self) -> T.Tuple[Array, Array]:
        kernel = self.param("kernel", self.kernel_init, self.shape)
        bias = self.param("bias", self.bias_init, (self.shape[1],))
        return kernel, bias


class _LNParams(nn.Module):
    """Scale+bias holder matching ``nn.LayerNorm``'s param tree."""

    features: int

    @nn.compact
    def __call__(self) -> T.Tuple[Array, Array]:
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,)
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        return scale, bias


class TemporalTransformer(nn.Module):
    """Per-pixel temporal self-attention embedding, (B,T,H,W,C) -> (B,H,W,out).

    Tokens are per-(pixel, time) channel vectors projected to ``d_model``,
    plus sinusoidal time encodings; ``num_layers`` pre-LN transformer blocks
    run over the T axis (Pallas lane-packed kernel on TPU, batch-chunked
    XLA fallback elsewhere); a learned query pools T -> 1.

    Dropout semantics (intentional deviation from the pre-r2 flax
    MultiHeadDotProductAttention variant): ``dropout`` applies to the
    post-projection attention output, NOT to the softmax weights, and the
    pooling attention carries no dropout — this keeps the attention core a
    single fused kernel. Checkpoints from before this rewrite use a
    different parameter tree and do not restore.
    """

    out_channels: int
    d_model: int = 64
    num_heads: int = 4
    num_layers: int = 2
    dropout: float = 0.0
    activation_type: str = "SiLU"

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        from ..ops.flags import pallas_temporal_enabled
        from ..ops.temporal_pallas import supported

        if pallas_temporal_enabled() and supported(self.d_model):
            return self._packed(x, training)
        return self._unpacked(x, training)

    def _packed(self, x: Array, training: bool) -> Array:
        """Whole pipeline in the kernel's lane-packed (T, rows, 128) layout.

        The unpacked path below keeps tokens (B, T, H, W, D): every XLA op
        then pays a D(=32)->128 lane-padding tax (4x HBM traffic) and every
        attention call repacks q/k/v (and gradients) — 11 full-tensor lane
        shuffles per fwd+bwd. Packing ONCE at entry and expressing Dense as
        block-diagonal matmuls / LayerNorm as masked lane-group reductions
        removes both: 336 -> ~80 ms/step at production scale (BASELINE.md).
        Parameter names, shapes, and init draws match the unpacked path
        exactly (holder modules), so checkpoints are interchangeable.
        """
        import numpy as _np

        from ..ops.temporal_pallas import (
            packed_row_block,
            temporal_attention_packed,
        )

        b, t, h, w, cin = x.shape
        d = self.d_model
        fold = 128 // d
        act = get_activation(self.activation_type)
        interpret = jax.devices()[0].platform != "tpu"
        row_block = packed_row_block(t, t)
        n_px = b * h * w
        rows = -(-n_px // fold)  # ceil: pixels per lane-row
        rows = -(-rows // row_block) * row_block  # pad to the banding

        def tile_lanes(vec: Array) -> Array:
            return jnp.tile(vec, fold)

        def dense(name, xp, shape, kernel_init=kaiming_normal,
                  bias_init=normal_bias):
            kernel, bias = _DenseParams(
                shape, kernel_init, bias_init, name=name
            )()
            wb = jax.scipy.linalg.block_diag(
                *([kernel.astype(xp.dtype)] * fold)
            )
            return xp @ wb + tile_lanes(bias.astype(xp.dtype))

        # (lanes, fold) group-membership mask for per-pixel LayerNorm.
        ln_mask = jnp.asarray(
            _np.kron(_np.eye(fold), _np.ones((d, 1))), dtype=jnp.float32
        )

        def ln(name, xp):
            scale, bias = _LNParams(d, name=name)()
            xf = xp.astype(jnp.float32)
            mean = (xf @ ln_mask) / d  # (T, rows, fold)
            mean_full = mean @ ln_mask.T
            var = ((xf - mean_full) ** 2 @ ln_mask) / d
            inv_full = jax.lax.rsqrt(var + 1e-5) @ ln_mask.T
            y = (xf - mean_full) * inv_full
            y = y * tile_lanes(scale) + tile_lanes(bias)
            return y.astype(xp.dtype)

        # Pack once: (B, T, H, W, Cin) -> (T, rows, fold*Cin).
        xp = jnp.moveaxis(x, 1, 0).reshape(t, n_px, cin)
        pad = rows * fold - n_px
        if pad:
            xp = jnp.pad(xp, ((0, 0), (0, pad), (0, 0)))
        xp = xp.reshape(t, rows, fold * cin)

        tokens = dense("Dense_0", xp, (cin, d))
        pos = jnp.asarray(
            sinusoid_encoding_table(t, d), dtype=tokens.dtype
        )
        tokens = tokens + tile_lanes(pos)[:, None, :]

        for layer in range(self.num_layers):
            i = 4 * layer
            attn_in = ln(f"LayerNorm_{2 * layer}", tokens)
            kqkv, bqkv = _DenseParams((d, 3 * d), name=f"Dense_{i + 1}")()
            kqkv = kqkv.astype(tokens.dtype)
            bqkv = bqkv.astype(tokens.dtype)
            qkv = []
            for s in range(3):
                wb = jax.scipy.linalg.block_diag(
                    *([kqkv[:, s * d:(s + 1) * d]] * fold)
                )
                qkv.append(
                    attn_in @ wb + tile_lanes(bqkv[s * d:(s + 1) * d])
                )
            attn = temporal_attention_packed(
                qkv[0], qkv[1], qkv[2],
                self.num_heads, d, row_block, interpret,
            )
            attn = dense(f"Dense_{i + 2}", attn, (d, d))
            if self.dropout > 0:
                attn = nn.Dropout(
                    rate=self.dropout, deterministic=not training
                )(attn)
            tokens = tokens + attn
            mlp_in = ln(f"LayerNorm_{2 * layer + 1}", tokens)
            mlp = dense(
                f"Dense_{i + 3}", mlp_in, (d, 2 * d),
                kernel_init=nn.linear.default_kernel_init,
                bias_init=nn.initializers.zeros_init(),
            )
            mlp = act(mlp)
            mlp = dense(
                f"Dense_{i + 4}", mlp, (2 * d, d),
                kernel_init=nn.linear.default_kernel_init,
                bias_init=nn.initializers.zeros_init(),
            )
            tokens = tokens + mlp

        # Learned-query pooling: the query is one shared vector, so its
        # LayerNorm + Dense run on a (1, d) tensor and tile onto lanes.
        nl = self.num_layers
        query = self.param(
            "pool_query",
            nn.initializers.normal(stddev=0.02),
            (1, 1, 1, 1, d),
        )
        qscale, qbias = _LNParams(d, name=f"LayerNorm_{2 * nl + 1}")()
        qf = query.reshape(1, d).astype(jnp.float32)
        qmean = qf.mean(-1, keepdims=True)
        qvar = ((qf - qmean) ** 2).mean(-1, keepdims=True)
        qn = (qf - qmean) * jax.lax.rsqrt(qvar + 1e-5) * qscale + qbias
        kq, bq = _DenseParams((d, d), name=f"Dense_{4 * nl + 1}")()
        pool_q_vec = (qn @ kq + bq).astype(tokens.dtype)  # (1, d)
        pool_qp = jnp.broadcast_to(
            tile_lanes(pool_q_vec[0])[None, None, :], (1, rows, 128)
        )
        keys = ln(f"LayerNorm_{2 * nl}", tokens)
        pool_k = dense(f"Dense_{4 * nl + 2}", keys, (d, d))
        pool_v = dense(f"Dense_{4 * nl + 3}", keys, (d, d))
        pooled = temporal_attention_packed(
            pool_qp, pool_k, pool_v, self.num_heads, d, row_block, interpret
        )
        pooled = pooled.reshape(rows * fold, d)[:n_px].reshape(b, h, w, d)

        out = nn.Dense(
            self.out_channels,
            kernel_init=kaiming_normal,
            bias_init=normal_bias,
            name=f"Dense_{4 * nl + 4}",
        )(pooled)
        return nn.LayerNorm(epsilon=1e-5, name=f"LayerNorm_{2 * nl + 2}")(out)

    def _unpacked(self, x: Array, training: bool) -> Array:
        batch, time, height, width, _ = x.shape

        # Stay (B, T, H, W, D) throughout — see _temporal_axis_attention.
        tokens = nn.Dense(
            self.d_model, kernel_init=kaiming_normal, bias_init=normal_bias
        )(x)
        # Cast the table to the compute dtype: adding an fp32 table would
        # silently promote tokens (and the whole transformer) to fp32.
        pos = jnp.asarray(
            sinusoid_encoding_table(time, self.d_model), dtype=tokens.dtype
        )
        tokens = tokens + pos[:, None, None, :][None]

        # No outer remat: the Pallas kernel recomputes weights flash-style
        # in its own backward (nothing T*S-sized is stored), and the XLA
        # fallback already checkpoints per batch chunk — an outer
        # jax.checkpoint would re-run a full forward kernel per layer in
        # the backward for no memory win.
        def attention(q, k, v):
            return _temporal_axis_attention(q, k, v, self.num_heads)
        for _ in range(self.num_layers):
            attn_in = nn.LayerNorm(epsilon=1e-5)(tokens)
            qkv = nn.Dense(
                self.d_model * 3,
                kernel_init=kaiming_normal,
                bias_init=normal_bias,
            )(attn_in)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            attn = attention(q, k, v)
            attn = nn.Dense(
                self.d_model,
                kernel_init=kaiming_normal,
                bias_init=normal_bias,
            )(attn)
            if self.dropout > 0:
                attn = nn.Dropout(
                    rate=self.dropout, deterministic=not training
                )(attn)
            tokens = tokens + attn
            mlp_in = nn.LayerNorm(epsilon=1e-5)(tokens)
            mlp = nn.Dense(self.d_model * 2)(mlp_in)
            mlp = get_activation(self.activation_type)(mlp)
            mlp = nn.Dense(self.d_model)(mlp)
            tokens = tokens + mlp

        # Learned-query pooling over time (query length 1 on the T axis).
        query = self.param(
            "pool_query",
            nn.initializers.normal(stddev=0.02),
            (1, 1, 1, 1, self.d_model),
        )
        query = jnp.broadcast_to(
            query, (batch, 1, height, width, self.d_model)
        )
        keys = nn.LayerNorm(epsilon=1e-5)(tokens)
        pool_q = nn.Dense(
            self.d_model, kernel_init=kaiming_normal, bias_init=normal_bias
        )(nn.LayerNorm(epsilon=1e-5)(query))
        pool_k = nn.Dense(
            self.d_model, kernel_init=kaiming_normal, bias_init=normal_bias
        )(keys)
        pool_v = nn.Dense(
            self.d_model, kernel_init=kaiming_normal, bias_init=normal_bias
        )(keys)
        pooled = attention(pool_q, pool_k, pool_v)
        pooled = jnp.squeeze(pooled, axis=1)  # (B, H, W, D)

        out = nn.Dense(
            self.out_channels,
            kernel_init=kaiming_normal,
            bias_init=normal_bias,
        )(pooled)
        return nn.LayerNorm(epsilon=1e-5)(out)

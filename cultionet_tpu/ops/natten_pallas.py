"""Fused neighborhood-attention block as a Pallas TPU kernel.

The flagship kernel of the build (SURVEY.md §2.2): the reference outsources
dilated neighborhood attention to the NATTEN CUDA library wrapped in a
LayerNorm sandwich (nn/modules/convolution.py:336-353); here the ENTIRE block

    LayerNorm -> QKV projection -> k x k neighborhood attention
              -> output projection -> LayerNorm

runs as one Pallas program per (batch x dilation-coset) slice: x is read from
HBM once, weights stream in, and the output is written once — no HBM round
trips for q/k/v, attention weights, or intermediate activations. Matmuls hit
the MXU in bf16 with fp32 accumulation; softmax statistics are fp32.

Clamped-window (NATTEN) semantics are preserved exactly with the same
slice+concat construction as the XLA path (ops/natten.py): border windows
slide inward, every query attends to exactly k*k keys. Dilation is a coset
reshape outside the kernel.

Gradients: ``fused_na_block`` carries a custom VJP whose backward pass is the
XLA autodiff of the numerically identical reference composition — the
forward fusion never changes training semantics.
"""

import functools
import typing as T

import jax
import jax.numpy as jnp
from einops import rearrange

from .natten import neighborhood_attention_2d

Array = jax.Array

LN_EPS = 1e-6


# ---------------------------------------------------------------------------
# Reference (XLA) composition — also the backward path.
# ---------------------------------------------------------------------------


def _layer_norm(x: Array, scale: Array, bias: Array) -> Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + LN_EPS)
    return y * scale + bias


def na_block_reference(
    x: Array,
    params: T.Dict[str, Array],
    num_heads: int,
    kernel_size: int,
    dilation: int = 1,
) -> Array:
    """Pure-XLA LN -> QKV -> NA -> proj -> LN (oracle + backward path)."""
    h = _layer_norm(x, params["ln1_scale"], params["ln1_bias"])
    qkv = h @ params["w_qkv"] + params["b_qkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda z: rearrange(z, "b h w (n d) -> b h w n d", n=num_heads)
    out = neighborhood_attention_2d(
        split(q), split(k), split(v), kernel_size=kernel_size,
        dilation=dilation,
    )
    out = rearrange(out, "b h w n d -> b h w (n d)")
    out = out @ params["w_proj"] + params["b_proj"]
    return _layer_norm(out, params["ln2_scale"], params["ln2_bias"])


# ---------------------------------------------------------------------------
# Pallas kernel (dilation-1 core; cosets handled by the caller).
# ---------------------------------------------------------------------------


def _na_block_kernel(
    x_ref,
    ln1_scale_ref,
    ln1_bias_ref,
    w_qkv_ref,
    b_qkv_ref,
    w_proj_ref,
    b_proj_ref,
    ln2_scale_ref,
    ln2_bias_ref,
    head_mask_ref,
    out_ref,
    *,
    num_heads: int,
    kernel_size: int,
    height: int,
    width: int,
):
    """Flat-(H*W, C) formulation built on pltpu.roll.

    Clamped NATTEN windows are expressed as circular rolls of the flattened
    key/value matrices plus border-row/-column selects: interior pixels use
    the centered shift, first/last image rows and columns select the inward-
    clamped shift. All tensors stay 2-D (sublanes = pixels, lanes = channels),
    per-head logit reductions are (HW, C) @ (C, N) block-mask matmuls on the
    MXU, and per-head weight broadcast back to channels is a lane repeat —
    no gathers, no concats, no tiny-tile reshapes.
    """
    channels = x_ref.shape[-1]
    head_dim = channels // num_heads
    scale = head_dim**-0.5
    num_px = x_ref.shape[1]  # H*W padded to a sublane multiple by caller
    half = kernel_size // 2

    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[0].astype(jnp.float32)  # (HWp, C)

    # LayerNorm 1 (fp32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    ln_x = (x - mean) * jax.lax.rsqrt(var + LN_EPS)
    ln_x = ln_x * ln1_scale_ref[:] + ln1_bias_ref[:]
    ln_x = ln_x.astype(jnp.bfloat16)

    qkv = (
        jnp.dot(ln_x, w_qkv_ref[:], preferred_element_type=jnp.float32)
        + b_qkv_ref[:]
    )
    # k/v stay fp32: Mosaic's sublane roll only supports 32-bit lanes
    # (bf16 rolls crash the compiler); casts happen at matmul boundaries.
    q = qkv[:, :channels] * scale
    k = qkv[:, channels : 2 * channels]
    v = qkv[:, 2 * channels : 3 * channels]

    pixel = jax.lax.broadcasted_iota(jnp.int32, (num_px, channels), 0)
    row = pixel // width
    col = pixel - row * width

    def shifted(a, s, stride):
        """S[p] = a[(p + s*stride) mod HWp]."""
        if s == 0:
            return a
        return pltpu.roll(a, (-s * stride) % num_px, 0)

    def clamped(a, j, stride, pos, last):
        """Clamped-window shift along one image axis in flat space:
        interior: +(j - half); first row/col: +j; last row/col:
        +(j - 2*half) — in units of ``stride``. Shifts are recomputed at
        every use so Mosaic's stack allocator keeps few buffers live."""
        base = shifted(a, j - half, stride)
        if half == 0:
            return base
        out = jnp.where(pos < half, shifted(a, j, stride), base)
        return jnp.where(
            pos > last - 1 - half, shifted(a, j - 2 * half, stride), out
        )

    head_mask = head_mask_ref[:]  # (C, N) 0/1 block mask, bf16

    # Pass 1: the k*k logits (each only (HWp, N) — keep all nine live;
    # the big shifted K buffers die at the end of each iteration).
    logits = []
    for jh in range(kernel_size):
        k_h = clamped(k, jh, width, row, height)
        for jw in range(kernel_size):
            k_hw = clamped(k_h, jw, 1, col, width)
            logits.append(
                jnp.dot(
                    (q * k_hw).astype(jnp.bfloat16),
                    head_mask,
                    preferred_element_type=jnp.float32,
                )
            )  # (HWp, N)

    max_logit = logits[0]
    for l in logits[1:]:
        max_logit = jnp.maximum(max_logit, l)
    exps = [jnp.exp(l - max_logit) for l in logits]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    inv_denom = 1.0 / denom

    # Pass 2: recompute the V shifts one at a time and accumulate.
    # Head channels are INTERLEAVED by the caller (channel c -> head c % N),
    # so pltpu.repeat's tile-repeat [w_0..w_N, w_0..w_N, ...] is exactly the
    # per-head broadcast.
    attn = jnp.zeros((num_px, channels), dtype=jnp.float32)
    idx = 0
    for jh in range(kernel_size):
        v_h = clamped(v, jh, width, row, height)
        for jw in range(kernel_size):
            v_hw = clamped(v_h, jw, 1, col, width)
            w = exps[idx] * inv_denom
            w_full = pltpu.repeat(w, head_dim, 1)  # (HWp, C)
            attn = attn + w_full * v_hw
            idx += 1

    proj = (
        jnp.dot(
            attn.astype(jnp.bfloat16),
            w_proj_ref[:],
            preferred_element_type=jnp.float32,
        )
        + b_proj_ref[:]
    )

    # LayerNorm 2 (fp32)
    mean2 = jnp.mean(proj, axis=-1, keepdims=True)
    var2 = jnp.mean((proj - mean2) ** 2, axis=-1, keepdims=True)
    ln_out = (proj - mean2) * jax.lax.rsqrt(var2 + LN_EPS)
    ln_out = ln_out * ln2_scale_ref[:] + ln2_bias_ref[:]

    out_ref[0] = ln_out.astype(out_ref.dtype)


def _na_block_pallas_d1(
    x: Array,
    params: T.Dict[str, Array],
    num_heads: int,
    kernel_size: int,
    interpret: bool = False,
) -> Array:
    """Dilation-1 fused block: grid over batch, flat (H*W, C) per program."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, height, width, channels = x.shape
    f32 = lambda a: a.astype(jnp.float32)

    # Flatten pixels; pad to a sublane-tile multiple (32 covers all dtypes).
    num_px = height * width
    num_px_pad = -(-num_px // 32) * 32
    x_flat = x.reshape(batch, num_px, channels)
    if num_px_pad != num_px:
        x_flat = jnp.pad(x_flat, ((0, 0), (0, num_px_pad - num_px), (0, 0)))

    head_dim = channels // num_heads
    # Interleave head channels: new channel d*N + n <- old channel n*D + d.
    # With this layout the kernel's logit mask is a tiled identity and the
    # per-head weight broadcast is a lane tile-repeat (pltpu.repeat).
    import numpy as _np

    old_of_new = _np.arange(channels).reshape(num_heads, head_dim).T.reshape(-1)
    w_qkv = params["w_qkv"]
    b_qkv = params["b_qkv"]
    qkv_cols = _np.concatenate(
        [old_of_new, channels + old_of_new, 2 * channels + old_of_new]
    )
    w_qkv = w_qkv[:, qkv_cols]
    b_qkv = b_qkv[qkv_cols]
    w_proj = params["w_proj"][old_of_new, :]

    head_mask = jnp.asarray(
        _np.tile(_np.eye(num_heads), (head_dim, 1)), dtype=jnp.bfloat16
    )  # (C, N): channel c belongs to head c % N

    kernel = functools.partial(
        _na_block_kernel,
        num_heads=num_heads,
        kernel_size=kernel_size,
        height=height,
        width=width,
    )

    grid = (batch,)
    x_spec = pl.BlockSpec(
        (1, num_px_pad, channels),
        lambda b: (b, 0, 0),
        memory_space=pltpu.VMEM,
    )
    full = lambda a: pl.BlockSpec(
        a.shape, lambda b: (0,) * a.ndim, memory_space=pltpu.VMEM
    )

    args = (
        x_flat,
        f32(params["ln1_scale"]),
        f32(params["ln1_bias"]),
        w_qkv.astype(jnp.bfloat16),
        f32(b_qkv),
        w_proj.astype(jnp.bfloat16),
        f32(params["b_proj"]),
        f32(params["ln2_scale"]),
        f32(params["ln2_bias"]),
        head_mask,
    )
    in_specs = [x_spec] + [full(a) for a in args[1:]]

    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct(x_flat.shape, x.dtype),
        in_specs=in_specs,
        out_specs=x_spec,
        compiler_params=compiler_params,
        interpret=interpret,
    )(*args)
    return out[:, :num_px].reshape(batch, height, width, channels)


def na_block_pallas(
    x: Array,
    params: T.Dict[str, Array],
    num_heads: int,
    kernel_size: int,
    dilation: int = 1,
    interpret: bool = False,
) -> Array:
    """Fused forward; dilation via coset reshape (exact when H, W % d == 0)."""
    _, height, width, _ = x.shape
    if kernel_size > 3:
        # The flat roll+select border construction covers half <= 1
        # (k in {1, 3}) — everything this model family uses. Larger windows
        # take the XLA path.
        return na_block_reference(x, params, num_heads, kernel_size, dilation)
    if dilation > 1:
        if height % dilation or width % dilation:
            # Ragged cosets: exact XLA fallback.
            return na_block_reference(
                x, params, num_heads, kernel_size, dilation
            )
        pattern = "b (hc dh) (wc dw) c -> (b dh dw) hc wc c"
        inverse = "(b dh dw) hc wc c -> b (hc dh) (wc dw) c"
        sizes = dict(dh=dilation, dw=dilation)
        out = _na_block_pallas_d1(
            rearrange(x, pattern, **sizes),
            params,
            num_heads,
            kernel_size,
            interpret=interpret,
        )
        return rearrange(out, inverse, **sizes)
    return _na_block_pallas_d1(
        x, params, num_heads, kernel_size, interpret=interpret
    )


# ---------------------------------------------------------------------------
# Attention-core kernel: q, k, v -> out, grid over (batch, head).
#
# Per-program working set is O(HWp x head_dim) regardless of total channel
# width, so this compiles and fits VMEM at every resolution/width the model
# uses (the fully fused block above is the aggressive variant for small C).
# ---------------------------------------------------------------------------


def _na2d_core_kernel(
    q_ref, k_ref, v_ref, o_ref, *, kernel_size, height, width
):
    from jax.experimental.pallas import tpu as pltpu

    num_px = q_ref.shape[-2]
    head_dim = q_ref.shape[-1]
    half = kernel_size // 2
    scale = head_dim**-0.5

    q = q_ref[0, 0] * scale  # (HWp, D)
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    pixel = jax.lax.broadcasted_iota(jnp.int32, (num_px, head_dim), 0)
    row = pixel // width
    col = pixel - row * width

    def shifted(a, s, stride):
        if s == 0:
            return a
        return pltpu.roll(a, (-s * stride) % num_px, 0)

    def clamped(a, j, stride, pos, last):
        base = shifted(a, j - half, stride)
        if half == 0:
            return base
        out = jnp.where(pos < half, shifted(a, j, stride), base)
        return jnp.where(
            pos > last - 1 - half, shifted(a, j - 2 * half, stride), out
        )

    logits = []
    for jh in range(kernel_size):
        k_h = clamped(k, jh, width, row, height)
        for jw in range(kernel_size):
            k_hw = clamped(k_h, jw, 1, col, width)
            logits.append(jnp.sum(q * k_hw, axis=1, keepdims=True))

    max_logit = logits[0]
    for l in logits[1:]:
        max_logit = jnp.maximum(max_logit, l)
    exps = [jnp.exp(l - max_logit) for l in logits]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    inv_denom = 1.0 / denom

    out = jnp.zeros((num_px, head_dim), dtype=jnp.float32)
    idx = 0
    for jh in range(kernel_size):
        v_h = clamped(v, jh, width, row, height)
        for jw in range(kernel_size):
            v_hw = clamped(v_h, jw, 1, col, width)
            out = out + (exps[idx] * inv_denom) * v_hw
            idx += 1

    o_ref[0, 0] = out.astype(o_ref.dtype)


def _na2d_pallas_d1(
    q: Array, k: Array, v: Array, kernel_size: int, interpret: bool = False
) -> Array:
    """(B, H, W, N, D) neighborhood attention, dilation 1, grid (B, N)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, height, width, num_heads, head_dim = q.shape
    num_px = height * width
    num_px_pad = -(-num_px // 32) * 32

    def to_flat(a):
        a = jnp.moveaxis(a.reshape(batch, num_px, num_heads, head_dim), 1, 2)
        if num_px_pad != num_px:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, num_px_pad - num_px), (0, 0)))
        return a.astype(jnp.float32)  # Mosaic rolls need 32-bit lanes

    qf, kf, vf = to_flat(q), to_flat(k), to_flat(v)

    spec = pl.BlockSpec(
        (1, 1, num_px_pad, head_dim),
        lambda b, n: (b, n, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _na2d_core_kernel,
        kernel_size=kernel_size,
        height=height,
        width=width,
    )
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    out = pl.pallas_call(
        kernel,
        grid=(batch, num_heads),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        in_specs=[spec] * 3,
        out_specs=spec,
        compiler_params=compiler_params,
        interpret=interpret,
    )(qf, kf, vf)
    out = jnp.moveaxis(out, 2, 1)[:, :num_px]
    return out.reshape(batch, height, width, num_heads, head_dim)


def na2d_pallas(
    q: Array,
    k: Array,
    v: Array,
    kernel_size: int,
    dilation: int = 1,
    interpret: bool = False,
) -> Array:
    """Pallas neighborhood attention, drop-in for
    ops.natten.neighborhood_attention_2d (NATTEN clamped-window semantics;
    dilation via coset reshape; XLA fallback for k > 3 or ragged cosets)."""
    _, height, width, _, _ = q.shape
    # VMEM bound: per-program buffers are (H*W/dilation^2, 128-lane-padded)
    # fp32; beyond ~8k flat pixels the Mosaic stack overflows 100MB.
    flat_pixels = (height // max(dilation, 1)) * (width // max(dilation, 1))
    if (
        kernel_size > 3
        or flat_pixels > 8192
        or (dilation > 1 and (height % dilation or width % dilation))
    ):
        return neighborhood_attention_2d(q, k, v, kernel_size, dilation)
    if dilation > 1:
        pattern = "b (hc dh) (wc dw) n d -> (b dh dw) hc wc n d"
        inverse = "(b dh dw) hc wc n d -> b (hc dh) (wc dw) n d"
        sizes = dict(dh=dilation, dw=dilation)
        out = _na2d_pallas_d1(
            rearrange(q, pattern, **sizes),
            rearrange(k, pattern, **sizes),
            rearrange(v, pattern, **sizes),
            kernel_size,
            interpret=interpret,
        )
        return rearrange(out, inverse, **sizes)
    return _na2d_pallas_d1(q, k, v, kernel_size, interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def na2d_fused(
    q: Array,
    k: Array,
    v: Array,
    kernel_size: int,
    dilation: int = 1,
    interpret: bool = False,
) -> Array:
    """na2d with Pallas forward and XLA backward (exact same math)."""
    return na2d_pallas(q, k, v, kernel_size, dilation, interpret=interpret)


def _na2d_fused_fwd(q, k, v, kernel_size, dilation, interpret):
    out = na2d_pallas(q, k, v, kernel_size, dilation, interpret=interpret)
    return out, (q, k, v)


def _na2d_fused_bwd(kernel_size, dilation, interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_: neighborhood_attention_2d(
            q_, k_, v_, kernel_size, dilation
        ),
        q,
        k,
        v,
    )
    return vjp(g)


na2d_fused.defvjp(_na2d_fused_fwd, _na2d_fused_bwd)


# ---------------------------------------------------------------------------
# custom_vjp wrapper: Pallas forward, XLA backward.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5)
)
def fused_na_block(
    x: Array,
    params: T.Dict[str, Array],
    num_heads: int,
    kernel_size: int,
    dilation: int = 1,
    interpret: bool = False,
) -> Array:
    return na_block_pallas(
        x, params, num_heads, kernel_size, dilation, interpret=interpret
    )


def _fused_fwd(x, params, num_heads, kernel_size, dilation, interpret):
    out = na_block_pallas(
        x, params, num_heads, kernel_size, dilation, interpret=interpret
    )
    return out, (x, params)


def _fused_bwd(num_heads, kernel_size, dilation, interpret, residuals, g):
    x, params = residuals
    _, vjp = jax.vjp(
        lambda x_, p_: na_block_reference(
            x_, p_, num_heads, kernel_size, dilation
        ),
        x,
        params,
    )
    return vjp(g)


fused_na_block.defvjp(_fused_fwd, _fused_bwd)

"""Lane-packed Pallas temporal attention: per-pixel T-axis multi-head
attention for the TemporalTransformer (models/temporal.py).

Why a kernel at all: the attention tensors here have TINY time dims
(T ~ 13) and a huge pixel batch (B*H*W ~ 320k at production scale). Any
XLA formulation materializes weights with (T, S) on the (8, 128) tile
minors — a ~14x padding blowup that forced the previous implementation
into a sequential batch-chunked remat scan (1.57 s/step at bs=32,
STATUS r2). The TPU-native layout is the same one the in-repo NA kernels
use (ops/natten_pallas.py): channels*folded-pixels on the 128 lanes,
pixels on sublanes, time unrolled in the kernel — zero tile padding, all
reductions ride the MXU via lane-group matmuls.

Layout. Tokens (B, T, H, W, C), C = heads * head_dim, are flattened to
N = B*H*W pixels; ``fold = 128 // C`` pixels pack one 128-lane row
(lane = f*C + h*head_dim + d). Arrays become (T, N/fold, 128); the grid
tiles the pixel rows. Per program, for each query step t the S logits
are masked lane-group reductions (MXU), the softmax runs across the
unrolled S list, and AV re-expands weights through the same group mask.
The backward kernel recomputes the weights flash-style (nothing
T*S-sized is ever stored) and emits dq/dk/dv in one pass.

No reference counterpart: the reference removed its temporal transformer
(SURVEY.md §5); this kernel is what makes the restored option fast.
"""

import functools
import typing as T

import jax
import jax.numpy as jnp
import numpy as np

from .natten_pallas import _broadcast_groups, _reduce_groups

Array = jax.Array


class _TPlan(T.NamedTuple):
    fold: int  # pixels per lane row
    lanes: int  # always 128
    rows: int  # padded pixel rows (N / fold, padded to row_block)
    row_block: int  # sublane rows per program
    groups: int  # fold * heads
    head_dim: int
    num_heads: int
    n_pixels: int  # true N


def _plan(
    n_pixels: int,
    channels: int,
    num_heads: int,
    tq: int = 1,
    s_len: int = 1,
    row_block: T.Optional[int] = None,
) -> _TPlan:
    assert channels <= 128 and 128 % channels == 0, (
        f"temporal pallas needs C dividing 128, got {channels}"
    )
    if row_block is None:
        # VMEM-aware banding: the backward kernel keeps ~2*(tq+S) block
        # refs plus ~6*S fp32 temporaries live per program (all
        # row_block x 128). Size row_block so the scoped-VMEM estimate
        # stays well under the 16 MB Mosaic stack limit (at T=S=12 a
        # fixed 256 rows overflowed to 21 MB at production scale).
        units = 2 * (tq + s_len) + 6 * s_len + 8
        budget = 8 * 1024 * 1024
        row_block = max(8, min(256, budget // (512 * units) // 8 * 8))
    head_dim = channels // num_heads
    fold = 128 // channels
    rows = -(-n_pixels // fold)
    rows_pad = -(-rows // row_block) * row_block
    return _TPlan(
        fold=fold,
        lanes=128,
        rows=rows_pad,
        row_block=row_block,
        groups=fold * num_heads,
        head_dim=head_dim,
        num_heads=num_heads,
        n_pixels=n_pixels,
    )


def _pack(x: Array, plan: _TPlan) -> Array:
    """(B, T, H, W, C) -> (T, rows, 128) lane-packed."""
    b, t, h, w, c = x.shape
    x = jnp.moveaxis(x, 1, 0).reshape(t, b * h * w, c)
    pad_px = plan.rows * plan.fold - x.shape[1]
    if pad_px:
        x = jnp.pad(x, ((0, 0), (0, pad_px), (0, 0)))
    return x.reshape(t, plan.rows, plan.fold * c)


def _unpack(
    x: Array, plan: _TPlan, batch: int, height: int, width: int, channels: int
) -> Array:
    """(T, rows, 128) -> (B, T, H, W, C)."""
    t = x.shape[0]
    x = x.reshape(t, plan.rows * plan.fold, channels)[:, : plan.n_pixels]
    return jnp.moveaxis(
        x.reshape(t, batch, height, width, channels), 0, 1
    )


def _mask(plan: _TPlan) -> Array:
    """(lanes, groups) lane-group membership (head_dim lanes per group)."""
    lane_group = np.arange(plan.lanes) // plan.head_dim
    return jnp.asarray(
        np.equal.outer(lane_group, np.arange(plan.groups)),
        dtype=jnp.float32,
    )


def _softmax_unrolled(logits):
    """Numerically stable softmax across an unrolled list of (P, G)."""
    max_logit = logits[0]
    for logit in logits[1:]:
        max_logit = jnp.maximum(max_logit, logit)
    exps = [jnp.exp(logit - max_logit) for logit in logits]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    inv = 1.0 / denom
    # fast-reciprocal cleanup (one Newton step, same as the NA kernels)
    inv = inv * (2.0 - denom * inv)
    return [e * inv for e in exps]


def _fwd_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, plan: _TPlan):
    tq = q_ref.shape[0]
    s_len = k_ref.shape[0]
    scale = plan.head_dim**-0.5
    mask = m_ref[:]
    mm = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    ks = [k_ref[s].astype(jnp.float32) for s in range(s_len)]
    vs = [v_ref[s].astype(jnp.float32) for s in range(s_len)]
    for t in range(tq):
        q_t = q_ref[t].astype(jnp.float32) * scale
        logits = [_reduce_groups(q_t * ks[s], mask, mm) for s in range(s_len)]
        weights = _softmax_unrolled(logits)
        acc = jnp.zeros((plan.row_block, plan.lanes), dtype=jnp.float32)
        for s in range(s_len):
            acc = acc + _broadcast_groups(weights[s], mask, mm) * vs[s]
        o_ref[t] = acc.astype(o_ref.dtype)


def _bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, m_ref, dq_ref, dk_ref, dv_ref,
    *, plan: _TPlan,
):
    tq = q_ref.shape[0]
    s_len = k_ref.shape[0]
    scale = plan.head_dim**-0.5
    mask = m_ref[:]
    mm = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    ks = [k_ref[s].astype(jnp.float32) for s in range(s_len)]
    vs = [v_ref[s].astype(jnp.float32) for s in range(s_len)]
    dks = [
        jnp.zeros((plan.row_block, plan.lanes), jnp.float32)
        for _ in range(s_len)
    ]
    dvs = [
        jnp.zeros((plan.row_block, plan.lanes), jnp.float32)
        for _ in range(s_len)
    ]
    for t in range(tq):
        q_t = q_ref[t].astype(jnp.float32) * scale
        do_t = do_ref[t].astype(jnp.float32)
        logits = [_reduce_groups(q_t * ks[s], mask, mm) for s in range(s_len)]
        weights = _softmax_unrolled(logits)
        # dw_s = <do_t, v_s> per group; dlogit_s = w_s * (dw_s - sum w dw)
        dws = [_reduce_groups(do_t * vs[s], mask, mm) for s in range(s_len)]
        wdw = weights[0] * dws[0]
        for s in range(1, s_len):
            wdw = wdw + weights[s] * dws[s]
        dq_acc = jnp.zeros((plan.row_block, plan.lanes), jnp.float32)
        for s in range(s_len):
            w_full = _broadcast_groups(weights[s], mask, mm)
            dvs[s] = dvs[s] + w_full * do_t
            dlogit = weights[s] * (dws[s] - wdw)
            dl_full = _broadcast_groups(dlogit, mask, mm)
            dq_acc = dq_acc + dl_full * ks[s]
            dks[s] = dks[s] + dl_full * q_t
        dq_ref[t] = (dq_acc * scale).astype(dq_ref.dtype)
    for s in range(s_len):
        # q_t was pre-scaled, so dks already carries the 1/sqrt(d) factor
        dk_ref[s] = dks[s].astype(dk_ref.dtype)
        dv_ref[s] = dvs[s].astype(dv_ref.dtype)


def _call_kernel(kernel, plan, out_shapes, arrays, interpret):
    from jax.experimental import pallas as pl

    compiler_params = None
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        # Default scoped-VMEM limit is 16 MB; the T-unrolled backward's
        # live set (blocks are double-buffered) brushes ~21 MB at
        # T=S=12 even with banded rows. Same raise as the NA kernels.
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        )

    grid = (plan.rows // plan.row_block,)

    def tspec(t_dim):
        return pl.BlockSpec(
            (t_dim, plan.row_block, plan.lanes), lambda i: (0, i, 0)
        )

    in_specs = [tspec(a.shape[0]) for a in arrays[:-1]]
    in_specs.append(
        pl.BlockSpec((plan.lanes, plan.groups), lambda i: (0, 0))
    )
    out_specs = (
        [tspec(s.shape[0]) for s in out_shapes]
        if isinstance(out_shapes, (list, tuple))
        else tspec(out_shapes.shape[0])
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=compiler_params,
    )(*arrays)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def temporal_attention_pallas(
    q: Array, k: Array, v: Array, num_heads: int, interpret: bool = False
) -> Array:
    """Multi-head attention over the T axis of (B, T, H, W, C) tensors.

    Drop-in for models/temporal.py::_temporal_axis_attention (same math,
    fp32 softmax), supporting Tq != S (the learned-query pooling uses
    Tq=1). C must divide 128.
    """
    out, _ = _temporal_fwd(q, k, v, num_heads, interpret)
    return out


def _temporal_fwd(q, k, v, num_heads, interpret):
    b, tq, h, w, c = q.shape
    plan = _plan(b * h * w, c, num_heads, tq=tq, s_len=k.shape[1])
    qp = _pack(q, plan)
    kp = _pack(k, plan)
    vp = _pack(v, plan)
    mask = _mask(plan)
    out_shape = jax.ShapeDtypeStruct(qp.shape, q.dtype)
    out = _call_kernel(
        functools.partial(_fwd_kernel, plan=plan),
        plan,
        out_shape,
        [qp, kp, vp, mask],
        interpret,
    )
    return _unpack(out, plan, b, h, w, c), (q, k, v)


def _temporal_bwd(num_heads, interpret, residuals, dout):
    q, k, v = residuals
    b, tq, h, w, c = q.shape
    plan = _plan(b * h * w, c, num_heads, tq=tq, s_len=k.shape[1])
    qp = _pack(q, plan)
    kp = _pack(k, plan)
    vp = _pack(v, plan)
    dop = _pack(dout, plan)
    mask = _mask(plan)
    out_shapes = [
        jax.ShapeDtypeStruct(qp.shape, q.dtype),
        jax.ShapeDtypeStruct(kp.shape, k.dtype),
        jax.ShapeDtypeStruct(vp.shape, v.dtype),
    ]
    dqp, dkp, dvp = _call_kernel(
        functools.partial(_bwd_kernel, plan=plan),
        plan,
        out_shapes,
        [qp, kp, vp, dop, mask],
        interpret,
    )
    return (
        _unpack(dqp, plan, b, h, w, c),
        _unpack(dkp, plan, b, h, w, c),
        _unpack(dvp, plan, b, h, w, c),
    )


temporal_attention_pallas.defvjp(_temporal_fwd, _temporal_bwd)


def supported(channels: int) -> bool:
    return channels <= 128 and 128 % channels == 0


# ---------------------------------------------------------------------------
# Packed-layout entry: attention directly on (T, rows, 128) arrays.
#
# The unpacked API above repacks q/k/v (and their gradients) around every
# call — 11 full-tensor lane-shuffles per attention fwd+bwd. When the whole
# TemporalTransformer runs in packed layout (models/temporal.py), attention
# consumes and produces packed arrays with zero layout traffic.
# ---------------------------------------------------------------------------


def _packed_plan(rows: int, channels: int, num_heads: int, row_block: int):
    fold = 128 // channels
    return _TPlan(
        fold=fold,
        lanes=128,
        rows=rows,
        row_block=row_block,
        groups=fold * num_heads,
        head_dim=channels // num_heads,
        num_heads=num_heads,
        n_pixels=rows * fold,
    )


def packed_row_block(tq: int, s_len: int) -> int:
    """The row banding used by the packed pipeline (see _plan)."""
    return _plan(1, 128, 1, tq=tq, s_len=s_len).row_block


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def temporal_attention_packed(
    qp: Array,
    kp: Array,
    vp: Array,
    num_heads: int,
    channels: int,
    row_block: int,
    interpret: bool = False,
) -> Array:
    """Attention on lane-packed (Tq|S, rows, 128) arrays.

    ``rows`` must be a multiple of ``row_block``; callers pad once at
    pipeline entry (padded rows produce garbage that the caller trims —
    they never mix into real pixels, all ops are per-pixel).
    """
    out, _ = _packed_fwd(qp, kp, vp, num_heads, channels, row_block, interpret)
    return out


def _packed_fwd(qp, kp, vp, num_heads, channels, row_block, interpret):
    plan = _packed_plan(qp.shape[1], channels, num_heads, row_block)
    mask = _mask(plan)
    out_shape = jax.ShapeDtypeStruct(qp.shape, qp.dtype)
    out = _call_kernel(
        functools.partial(_fwd_kernel, plan=plan),
        plan,
        out_shape,
        [qp, kp, vp, mask],
        interpret,
    )
    return out, (qp, kp, vp)


def _packed_bwd(num_heads, channels, row_block, interpret, residuals, dout):
    qp, kp, vp = residuals
    plan = _packed_plan(qp.shape[1], channels, num_heads, row_block)
    mask = _mask(plan)
    out_shapes = [
        jax.ShapeDtypeStruct(qp.shape, qp.dtype),
        jax.ShapeDtypeStruct(kp.shape, kp.dtype),
        jax.ShapeDtypeStruct(vp.shape, vp.dtype),
    ]
    dqp, dkp, dvp = _call_kernel(
        functools.partial(_bwd_kernel, plan=plan),
        plan,
        out_shapes,
        [qp, kp, vp, dout, mask],
        interpret,
    )
    return dqp, dkp, dvp


temporal_attention_packed.defvjp(_packed_fwd, _packed_bwd)

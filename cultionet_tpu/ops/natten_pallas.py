"""Neighborhood attention as Pallas TPU kernels.

The reference outsources dilated neighborhood attention to the NATTEN CUDA
library (nn/modules/convolution.py:336-353); this module supplies the
TPU-native equivalent: a row-banded Mosaic kernel family with matching
forward AND backward passes (flash-style in-kernel softmax recompute — the
training path stores nothing beyond the layer inputs q, k, v).

Design (v2 — lane-packed, dilation-native, halo-DMA banded):

- **Layout**: queries/keys/values are flattened to ``(pixels, lanes)`` where
  lanes pack ``fold x heads x head_dim`` up to the 128-lane VPU width (small
  channel counts fold multiple batch elements into lanes). Per-head logit
  reductions and weight broadcasts are thin ``(px, L) @ (L, G)`` MXU matmuls
  against a constant group mask — no per-head tiny-trailing-dim arrays.
- **Dilation is native**: a window step is a roll of ``dilation`` image
  rows/cols; NATTEN's clamped-window border behavior is a per-pixel 3-way
  select between inward-shifted rolls (first ``k//2`` coset rows/cols, the
  interior, the last ``k//2``). No coset reshape, no ragged-shape fallback,
  no layout-churning transposes on the hot path.
- **Row banding**: the grid tiles image rows; each program DMAs only its
  key/value band (queries' rows plus a ``k//2 * dilation`` halo — the caller
  zero-pads the halo so DMA offsets stay static) from HBM into VMEM. VMEM
  use is bounded by the band size regardless of image height, so the kernels
  cover arbitrarily large scenes.
- **Backward**: the adjoint of each clamped shift is the sum of the inverse
  rolls of the mask-gated cotangent. Each program emits its band's dk/dv
  partials; bands overlap by the halo, and the caller overlap-adds them.

``fused_na_block`` (bottom) is the older single-program fully fused
LN->QKV->NA->proj->LN block kept for small-shape experiments; the banded
core above is the production path.
"""

import functools
import typing as T

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from .natten import neighborhood_attention_2d

Array = jax.Array

LN_EPS = 1e-6

# Backward (and dropout-forward) band size; see na2d_pallas/na2d_pallas_bwd.
_BWD_BAND_PX = 2048


# ---------------------------------------------------------------------------
# Packing plan: lanes, bands, padding.
# ---------------------------------------------------------------------------


class _Plan(T.NamedTuple):
    batch_groups: int
    fold: int
    lanes: int      # zero-padded to a 128 multiple (Mosaic DMA slices
                    # require lane-tile-aligned minor dims)
    raw_lanes: int  # fold * channels actually carrying data
    groups: int
    width_pad: int
    rows_per_band: int
    num_bands: int
    height_pad: int
    halo_rows: int

    @property
    def band_px(self) -> int:
        return (self.rows_per_band + 2 * self.halo_rows) * self.width_pad

    @property
    def query_px(self) -> int:
        return self.rows_per_band * self.width_pad

    @property
    def kv_px(self) -> int:
        return (self.height_pad + 2 * self.halo_rows) * self.width_pad

    @property
    def accumulate_kv(self) -> bool:
        """Backward dk/dv strategy: when the full (halo-padded) kv plane fits
        comfortably in VMEM, accumulate it in the revisited output block
        across the sequential band grid (zero at band 0) instead of emitting
        per-band partials for a host-graph overlap-add. 16 MB cap: at 24 MB
        the C=256 backward brushed the 110 MB scoped-vmem ceiling."""
        return 2 * self.kv_px * self.lanes * 4 <= 16 * 1024 * 1024


def _make_plan(
    batch: int,
    height: int,
    width: int,
    num_heads: int,
    head_dim: int,
    kernel_size: int,
    dilation: int,
    target_band_px: int = 4096,
) -> _Plan:
    channels = num_heads * head_dim
    width_pad = -(-width // 8) * 8
    halo_rows = (kernel_size // 2) * dilation

    fold = 1
    while (
        fold * 2 * channels <= 128
        and fold * 2 <= batch
        and batch % (fold * 2) == 0
    ):
        fold *= 2

    rows = max(2, (target_band_px // width_pad) // 2 * 2)
    rows = min(rows, -(-height // 2) * 2)
    num_bands = -(-height // rows)
    # Balance the bands: splitting height evenly across the band count
    # avoids a mostly-padding final band (50 rows at target 36 -> bands of
    # 36 + 14-padded-to-36, ~30% wasted work; balanced: 2 x 26). Measured
    # on v5e (experiments/na_band_sweep.json): the unbalanced 50x50 sites
    # ran ~25-35% slower than their single-band/balanced variants.
    rows = max(2, -(-(-(-height // num_bands)) // 2) * 2)
    raw_lanes = fold * channels
    return _Plan(
        batch_groups=batch // fold,
        fold=fold,
        lanes=-(-raw_lanes // 128) * 128,
        raw_lanes=raw_lanes,
        groups=fold * num_heads,
        width_pad=width_pad,
        rows_per_band=rows,
        num_bands=num_bands,
        height_pad=num_bands * rows,
        halo_rows=halo_rows,
    )


def _to_lanes(x: Array, plan: _Plan) -> Array:
    """(B, H, W, N, D) -> (batch_groups, H, W8, lanes); lane = f*C + n*D + d,
    zero-padded up to the 128-aligned lane count."""
    b, h, w, n, d = x.shape
    x = x.reshape(b, h, w, n * d)
    if plan.width_pad != w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, plan.width_pad - w), (0, 0)))
    if plan.fold > 1:
        x = x.reshape(plan.batch_groups, plan.fold, h, plan.width_pad, n * d)
        x = jnp.moveaxis(x, 1, 3)
        x = x.reshape(plan.batch_groups, h, plan.width_pad, plan.raw_lanes)
    if plan.lanes != plan.raw_lanes:
        x = jnp.pad(
            x, ((0, 0), (0, 0), (0, 0), (0, plan.lanes - plan.raw_lanes))
        )
    return x


def _from_lanes(
    x: Array, plan: _Plan, batch: int, height: int, width: int,
    num_heads: int, head_dim: int,
) -> Array:
    """Inverse of ``_to_lanes`` from (batch_groups, Hq, W8, lanes)."""
    x = x[:, :height, :width, : plan.raw_lanes]
    if plan.fold > 1:
        channels = num_heads * head_dim
        x = x.reshape(plan.batch_groups, height, width, plan.fold, channels)
        x = jnp.moveaxis(x, 3, 1)
    return x.reshape(batch, height, width, num_heads, head_dim)


def _query_flat(x: Array, plan: _Plan) -> Array:
    """Pad rows to height_pad and flatten pixels."""
    h = x.shape[1]
    if plan.height_pad != h:
        x = jnp.pad(x, ((0, 0), (0, plan.height_pad - h), (0, 0), (0, 0)))
    return x.reshape(x.shape[0], plan.height_pad * plan.width_pad, plan.lanes)


def _kv_flat(x: Array, plan: _Plan) -> Array:
    """Zero-pad the row halo top/bottom and flatten pixels."""
    h = x.shape[1]
    x = jnp.pad(
        x,
        (
            (0, 0),
            (plan.halo_rows, plan.height_pad - h + plan.halo_rows),
            (0, 0),
            (0, 0),
        ),
    )
    return x.reshape(
        x.shape[0],
        (plan.height_pad + 2 * plan.halo_rows) * plan.width_pad,
        plan.lanes,
    )


def _group_mask(plan: _Plan, head_dim: int) -> Array:
    """(lanes, groups) membership mask; zero rows for lane padding so padded
    lanes contribute nothing to logits and receive zero weights."""
    lane_group = np.arange(plan.lanes) // head_dim
    mask = np.equal.outer(lane_group, np.arange(plan.groups))
    mask[plan.raw_lanes:] = False
    return jnp.asarray(mask, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# Shared in-kernel shift machinery.
# ---------------------------------------------------------------------------


def _shift_ctx(plan: _Plan, kernel_size, dilation, height, width, t):
    """Build the clamped-shift helpers for one program (band ``t``)."""
    from jax.experimental.pallas import tpu as pltpu

    half = kernel_size // 2
    w8 = plan.width_pad
    npx = plan.query_px
    band_px = plan.band_px
    hd = plan.halo_rows
    lanes = plan.lanes

    pix = jax.lax.broadcasted_iota(jnp.int32, (npx, lanes), 0)
    r_loc = pix // w8
    h_glob = r_loc + t * plan.rows_per_band
    col = pix - r_loc * w8

    def from_band(a, dr):
        """Query-local view of the band shifted by ``dr`` image rows."""
        s = (hd + dr) * w8
        if s == 0:
            return a[:npx]
        return pltpu.roll(a, (-s) % band_px, 0)[:npx]

    def row_clamped(a, jh):
        out = from_band(a, dilation * (jh - half))
        for mi in range(half):
            out = jnp.where(
                (h_glob >= mi * dilation) & (h_glob < (mi + 1) * dilation),
                from_band(a, dilation * (jh - mi)),
                out,
            )
            out = jnp.where(
                (h_glob >= height - (mi + 1) * dilation)
                & (h_glob < height - mi * dilation),
                from_band(a, dilation * (jh + mi + 1 - kernel_size)),
                out,
            )
        return out

    def roll_q(a, dc):
        if dc % npx == 0:
            return a
        return pltpu.roll(a, (-dc) % npx, 0)

    def col_clamped(a, jw):
        out = roll_q(a, dilation * (jw - half))
        for mi in range(half):
            out = jnp.where(
                (col >= mi * dilation) & (col < (mi + 1) * dilation),
                roll_q(a, dilation * (jw - mi)),
                out,
            )
            out = jnp.where(
                (col >= width - (mi + 1) * dilation)
                & (col < width - mi * dilation),
                roll_q(a, dilation * (jw + mi + 1 - kernel_size)),
                out,
            )
        return out

    # --- adjoints (backward only) ---

    def to_band(bq, dr):
        """Adjoint of ``from_band``: embed query-local rows, inverse roll."""
        full = jnp.concatenate(
            [bq, jnp.zeros((band_px - npx, lanes), bq.dtype)], axis=0
        )
        s = (hd + dr) * w8
        if s == 0:
            return full
        return pltpu.roll(full, s % band_px, 0)

    def row_adjoint(bq, jh):
        first_any = h_glob < half * dilation
        last_any = h_glob >= height - half * dilation
        interior = jnp.logical_not(jnp.logical_or(first_any, last_any))
        acc = to_band(
            jnp.where(interior, bq, 0.0), dilation * (jh - half)
        )
        for mi in range(half):
            m_first = (h_glob >= mi * dilation) & (
                h_glob < (mi + 1) * dilation
            )
            m_last = (h_glob >= height - (mi + 1) * dilation) & (
                h_glob < height - mi * dilation
            )
            acc = acc + to_band(
                jnp.where(m_first, bq, 0.0), dilation * (jh - mi)
            )
            acc = acc + to_band(
                jnp.where(m_last, bq, 0.0),
                dilation * (jh + mi + 1 - kernel_size),
            )
        return acc

    def col_adjoint(bq, jw):
        first_any = col < half * dilation
        last_any = col >= width - half * dilation
        interior = jnp.logical_not(jnp.logical_or(first_any, last_any))
        acc = roll_q(
            jnp.where(interior, bq, 0.0), -dilation * (jw - half)
        )
        for mi in range(half):
            m_first = (col >= mi * dilation) & (col < (mi + 1) * dilation)
            m_last = (col >= width - (mi + 1) * dilation) & (
                col < width - mi * dilation
            )
            acc = acc + roll_q(
                jnp.where(m_first, bq, 0.0), -dilation * (jw - mi)
            )
            acc = acc + roll_q(
                jnp.where(m_last, bq, 0.0),
                -dilation * (jw + mi + 1 - kernel_size),
            )
        return acc

    return row_clamped, col_clamped, row_adjoint, col_adjoint


def _reduce_groups(x: Array, mask: Array, mm_dtype) -> Array:
    """(px, L) * lane-groups -> (px, G) via MXU (fp32 accumulation)."""
    return jax.lax.dot_general(
        x.astype(mm_dtype),
        mask.astype(mm_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _broadcast_groups(w: Array, mask: Array, mm_dtype) -> Array:
    """(px, G) -> (px, L) via MXU (fp32 accumulation)."""
    return jax.lax.dot_general(
        w.astype(mm_dtype),
        mask.astype(mm_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Forward kernel.
# ---------------------------------------------------------------------------


def _dropout_mask(plan: _Plan, attn_drop: float):
    """One (px, groups) keep-mask from the kernel's seeded PRNG stream,
    pre-scaled by 1/(1-p) (inverted dropout). Call order defines the
    stream: forward and backward must draw masks in the same sequence."""
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.prng_random_bits((plan.query_px, plan.groups))
    # low 24 bits -> uniform [0, 1) (sign-safe for int32 bit outputs)
    u = (bits & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))
    keep = (u >= attn_drop).astype(jnp.float32)
    return keep * (1.0 / (1.0 - attn_drop))


def _na2d_fwd_impl(
    seed_ref, q_ref, k_ref, v_ref, m_ref, o_ref, kb_ref, vb_ref, sem_ref,
    *, plan: _Plan, kernel_size, dilation, height, width, head_dim,
    attn_drop=0.0,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)
    npx = plan.query_px

    src = t * npx
    copy_k = pltpu.make_async_copy(
        k_ref.at[b, pl.ds(src, plan.band_px), :], kb_ref, sem_ref.at[0]
    )
    copy_v = pltpu.make_async_copy(
        v_ref.at[b, pl.ds(src, plan.band_px), :], vb_ref, sem_ref.at[1]
    )
    copy_k.start()
    copy_v.start()
    copy_k.wait()
    copy_v.wait()

    row_clamped, col_clamped, _, _ = _shift_ctx(
        plan, kernel_size, dilation, height, width, t
    )

    scale = head_dim**-0.5
    q = q_ref[0].astype(jnp.float32) * scale
    # Upcast the k/v bands to f32 BEFORE the roll/select shift machinery:
    # Mosaic lowers pltpu.roll to tpu.dynamic_rotate, which only supports
    # 32-bit element types on v5e ("Rotate with non-32-bit data" compile
    # error for bf16 bands), so the storage-dtype shortcut cannot compile
    # on real hardware even though it is exact in interpret mode.
    kb = kb_ref[:].astype(jnp.float32)
    vb = vb_ref[:].astype(jnp.float32)
    mask = m_ref[:]
    # bf16 inputs -> bf16 MXU passes (fp32 accumulation); fp32 stays exact.
    mm = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    if attn_drop > 0.0:
        # Per-program deterministic stream: the backward kernel reseeds
        # with the same (seed, program) pair and redraws identical masks
        # (Mosaic prng_seed accepts at most two words).
        pltpu.prng_seed(seed_ref[0], b * plan.num_bands + t)

    logits = []
    for jh in range(kernel_size):
        k_h = row_clamped(kb, jh)
        for jw in range(kernel_size):
            k_hw = col_clamped(k_h, jw)
            logits.append(_reduce_groups(q * k_hw, mask, mm))

    max_logit = logits[0]
    for l in logits[1:]:
        max_logit = jnp.maximum(max_logit, l)
    exps = [jnp.exp(l - max_logit) for l in logits]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    inv_denom = 1.0 / denom
    # Mosaic lowers 1/x to a fast approximate reciprocal (~2e-3 relative);
    # one Newton step squares the error to below f32 noise.
    inv_denom = inv_denom * (2.0 - denom * inv_denom)

    acc = jnp.zeros((npx, plan.lanes), dtype=jnp.float32)
    idx = 0
    for jh in range(kernel_size):
        v_h = row_clamped(vb, jh)
        for jw in range(kernel_size):
            v_hw = col_clamped(v_h, jw)
            w = exps[idx] * inv_denom
            if attn_drop > 0.0:
                # Inverted dropout on the attention weights (the natten
                # module's attn_drop between softmax and AV — reference
                # nn/modules/convolution.py:348).
                w = w * _dropout_mask(plan, attn_drop)
            w_full = _broadcast_groups(w, mask, mm)
            acc = acc + w_full * v_hw
            idx += 1

    o_ref[0] = acc.astype(o_ref.dtype)


def _na2d_fwd_kernel(
    q_ref, k_ref, v_ref, m_ref, o_ref, kb_ref, vb_ref, sem_ref, **kw
):
    _na2d_fwd_impl(
        None, q_ref, k_ref, v_ref, m_ref, o_ref, kb_ref, vb_ref, sem_ref,
        **kw,
    )


def _na2d_fwd_drop_kernel(
    q_ref, k_ref, v_ref, m_ref, seed_ref, o_ref, kb_ref, vb_ref, sem_ref,
    **kw,
):
    _na2d_fwd_impl(
        seed_ref, q_ref, k_ref, v_ref, m_ref, o_ref, kb_ref, vb_ref,
        sem_ref, **kw,
    )


# ---------------------------------------------------------------------------
# Backward kernel.
# ---------------------------------------------------------------------------


def _na2d_bwd_impl(
    seed_ref, q_ref, k_ref, v_ref, g_ref, m_ref,
    dq_ref, dkb_ref, dvb_ref,
    kb_ref, vb_ref, sem_ref,
    *, plan: _Plan, kernel_size, dilation, height, width, head_dim,
    attn_drop=0.0,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)
    npx = plan.query_px

    src = t * npx
    copy_k = pltpu.make_async_copy(
        k_ref.at[b, pl.ds(src, plan.band_px), :], kb_ref, sem_ref.at[0]
    )
    copy_v = pltpu.make_async_copy(
        v_ref.at[b, pl.ds(src, plan.band_px), :], vb_ref, sem_ref.at[1]
    )
    copy_k.start()
    copy_v.start()
    copy_k.wait()
    copy_v.wait()

    row_clamped, col_clamped, row_adjoint, col_adjoint = _shift_ctx(
        plan, kernel_size, dilation, height, width, t
    )

    scale = head_dim**-0.5
    qs = q_ref[0].astype(jnp.float32) * scale
    g = g_ref[0].astype(jnp.float32)
    # f32 bands before the shifts (tpu.dynamic_rotate is 32-bit only; see
    # the fwd impl note).
    kb = kb_ref[:].astype(jnp.float32)
    vb = vb_ref[:].astype(jnp.float32)
    mask = m_ref[:]
    mm = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    # Pass 1: recompute logits; raw per-window cotangent projections.
    # With attention dropout the chain is out = sum_j (m_j/(1-p)) w_j v_j:
    # dw_j picks up the same mask factor (r~_j = m_j r_j / (1-p)), and the
    # dv weights become the dropped weights w~_j = m_j w_j / (1-p). Masks
    # are redrawn from the identical (seed, b, t) stream as the forward.
    if attn_drop > 0.0:
        pltpu.prng_seed(seed_ref[0], b * plan.num_bands + t)

    logits = []
    dl_raw = []
    for jh in range(kernel_size):
        k_h = row_clamped(kb, jh)
        v_h = row_clamped(vb, jh)
        for jw in range(kernel_size):
            k_hw = col_clamped(k_h, jw)
            v_hw = col_clamped(v_h, jw)
            logits.append(_reduce_groups(qs * k_hw, mask, mm))
            dl_raw.append(_reduce_groups(g * v_hw, mask, mm))

    max_logit = logits[0]
    for l in logits[1:]:
        max_logit = jnp.maximum(max_logit, l)
    exps = [jnp.exp(l - max_logit) for l in logits]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    inv_denom = 1.0 / denom
    inv_denom = inv_denom * (2.0 - denom * inv_denom)  # Newton refine
    weights = [e * inv_denom for e in exps]

    if attn_drop > 0.0:
        # Same draw order as the forward's weight loop (idx = 0..k^2-1).
        drop_masks = [
            _dropout_mask(plan, attn_drop)
            for _ in range(kernel_size * kernel_size)
        ]
        dl_raw = [m_j * r_j for m_j, r_j in zip(drop_masks, dl_raw)]
        dropped_weights = [
            m_j * w_j for m_j, w_j in zip(drop_masks, weights)
        ]
    else:
        dropped_weights = weights

    dot_term = weights[0] * dl_raw[0]
    for w_j, r_j in zip(weights[1:], dl_raw[1:]):
        dot_term = dot_term + w_j * r_j
    dls = [w_j * (r_j - dot_term) for w_j, r_j in zip(weights, dl_raw)]

    # Pass 2: dq via forward key shifts; dk/dv via adjoint shifts, with the
    # w-axis adjoint accumulated per jh before one h-axis adjoint each.
    dq = jnp.zeros((npx, plan.lanes), dtype=jnp.float32)
    dkb = jnp.zeros((plan.band_px, plan.lanes), dtype=jnp.float32)
    dvb = jnp.zeros((plan.band_px, plan.lanes), dtype=jnp.float32)
    idx = 0
    for jh in range(kernel_size):
        k_h = row_clamped(kb, jh)
        dk_inner = jnp.zeros((npx, plan.lanes), dtype=jnp.float32)
        dv_inner = jnp.zeros((npx, plan.lanes), dtype=jnp.float32)
        for jw in range(kernel_size):
            k_hw = col_clamped(k_h, jw)
            dl_full = _broadcast_groups(dls[idx], mask, mm)
            w_full = _broadcast_groups(dropped_weights[idx], mask, mm)
            dq = dq + dl_full * k_hw
            dk_inner = dk_inner + col_adjoint(dl_full * qs, jw)
            dv_inner = dv_inner + col_adjoint(w_full * g, jw)
            idx += 1
        dkb = dkb + row_adjoint(dk_inner, jh)
        dvb = dvb + row_adjoint(dv_inner, jh)

    _store_bwd_outputs(
        pl, dq, dkb, dvb, dq_ref, dkb_ref, dvb_ref, scale, plan, t, npx
    )


def _store_bwd_outputs(
    pl, dq, dkb, dvb, dq_ref, dkb_ref, dvb_ref, scale, plan, t, npx
):
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)
    if plan.accumulate_kv:
        # Sequential band grid revisits the same (b,) output block: zero it
        # on the first band, then accumulate each band's halo-overlapped
        # partial in place (flushed to HBM once per batch group).
        @pl.when(t == 0)
        def _():
            dkb_ref[0] = jnp.zeros_like(dkb_ref[0])
            dvb_ref[0] = jnp.zeros_like(dvb_ref[0])

        sl = pl.ds(t * npx, plan.band_px)
        dkb_ref[0, sl, :] += dkb.astype(dkb_ref.dtype)
        dvb_ref[0, sl, :] += dvb.astype(dvb_ref.dtype)
    else:
        dkb_ref[0, 0] = dkb.astype(dkb_ref.dtype)
        dvb_ref[0, 0] = dvb.astype(dvb_ref.dtype)


def _na2d_bwd_kernel(
    q_ref, k_ref, v_ref, g_ref, m_ref,
    dq_ref, dkb_ref, dvb_ref,
    kb_ref, vb_ref, sem_ref,
    **kw,
):
    _na2d_bwd_impl(
        None, q_ref, k_ref, v_ref, g_ref, m_ref,
        dq_ref, dkb_ref, dvb_ref, kb_ref, vb_ref, sem_ref, **kw,
    )


def _na2d_bwd_drop_kernel(
    q_ref, k_ref, v_ref, g_ref, m_ref, seed_ref,
    dq_ref, dkb_ref, dvb_ref,
    kb_ref, vb_ref, sem_ref,
    **kw,
):
    _na2d_bwd_impl(
        seed_ref, q_ref, k_ref, v_ref, g_ref, m_ref,
        dq_ref, dkb_ref, dvb_ref, kb_ref, vb_ref, sem_ref, **kw,
    )


# ---------------------------------------------------------------------------
# Host-side wrappers.
# ---------------------------------------------------------------------------


def _pallas_supported(height, width, kernel_size, dilation) -> bool:
    return (
        kernel_size % 2 == 1
        and kernel_size * dilation <= min(height, width)
    )


def na2d_pallas(
    q: Array,
    k: Array,
    v: Array,
    kernel_size: int,
    dilation: int = 1,
    interpret: bool = False,
    attn_drop: float = 0.0,
    seed: T.Optional[Array] = None,
    target_band_px: T.Optional[int] = None,
) -> Array:
    """Banded Pallas neighborhood attention, drop-in for
    ops.natten.neighborhood_attention_2d (exact NATTEN clamped-window
    semantics, native dilation, any H/W >= kernel_size*dilation).

    ``attn_drop`` > 0 applies inverted dropout to the attention weights
    in-kernel (hardware PRNG seeded from ``seed`` + program ids) — the
    natten module's attn_drop, without leaving the fused path.

    ``target_band_px`` overrides the band-size heuristic (tests and band
    sweeps); the plan still balances rows across the resulting band count.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, height, width, num_heads, head_dim = q.shape
    if kernel_size == 1:
        return v
    if not _pallas_supported(height, width, kernel_size, dilation):
        weights_fn = (
            _xla_weights_dropout(attn_drop, seed) if attn_drop > 0 else None
        )
        return neighborhood_attention_2d(
            q, k, v, kernel_size, dilation, weights_fn=weights_fn
        )

    # With dropout the forward MUST use the backward's banding: masks are
    # drawn per (batch-group, band) program, so fwd/bwd band partitions
    # must coincide for the backward to redraw the same mask per pixel.
    plan = _make_plan(
        batch, height, width, num_heads, head_dim, kernel_size, dilation,
        target_band_px=target_band_px
        or (_BWD_BAND_PX if attn_drop > 0 else 4096),
    )
    qf = _query_flat(_to_lanes(q, plan), plan)
    kf = _kv_flat(_to_lanes(k, plan), plan)
    vf = _kv_flat(_to_lanes(v, plan), plan)
    mask = _group_mask(plan, head_dim)

    kernel = functools.partial(
        _na2d_fwd_drop_kernel if attn_drop > 0 else _na2d_fwd_kernel,
        plan=plan,
        kernel_size=kernel_size,
        dilation=dilation,
        height=height,
        width=width,
        head_dim=head_dim,
        attn_drop=float(attn_drop),
    )
    q_spec = pl.BlockSpec(
        (1, plan.query_px, plan.lanes),
        lambda b, t: (b, t, 0),
        memory_space=pltpu.VMEM,
    )
    kv_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    m_spec = pl.BlockSpec(
        (plan.lanes, plan.groups), lambda b, t: (0, 0),
        memory_space=pltpu.VMEM,
    )

    in_specs = [q_spec, kv_spec, kv_spec, m_spec]
    inputs = [qf, kf, vf, mask]
    if attn_drop > 0:
        seed_arr = jnp.asarray(
            seed if seed is not None else 0, dtype=jnp.int32
        ).reshape((1,))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(seed_arr)

    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        )
    out = pl.pallas_call(
        kernel,
        grid=(plan.batch_groups, plan.num_bands),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        in_specs=in_specs,
        out_specs=q_spec,
        scratch_shapes=[
            pltpu.VMEM((plan.band_px, plan.lanes), k.dtype),
            pltpu.VMEM((plan.band_px, plan.lanes), v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(*inputs)

    out = out.reshape(
        plan.batch_groups, plan.height_pad, plan.width_pad, plan.lanes
    )
    return _from_lanes(out, plan, batch, height, width, num_heads, head_dim)


def _overlap_add(bands: Array, plan: _Plan) -> Array:
    """Sum per-band kv cotangents into the halo-padded flat kv layout."""
    kv_px = (plan.height_pad + 2 * plan.halo_rows) * plan.width_pad
    acc = jnp.zeros(
        (plan.batch_groups, kv_px, plan.lanes), dtype=bands.dtype
    )
    for t in range(plan.num_bands):
        acc = acc.at[
            :, t * plan.query_px : t * plan.query_px + plan.band_px, :
        ].add(bands[:, t])
    return acc


def _xla_weights_dropout(attn_drop: float, seed):
    """weights_fn applying seeded inverted dropout (XLA fallback path)."""

    def weights_fn(w):
        key = jax.random.PRNGKey(jnp.asarray(seed, dtype=jnp.int32).ravel()[0])
        keep = jax.random.bernoulli(key, 1.0 - attn_drop, w.shape)
        return w * keep.astype(w.dtype) / (1.0 - attn_drop)

    return weights_fn


def na2d_pallas_bwd(
    q: Array,
    k: Array,
    v: Array,
    g: Array,
    kernel_size: int,
    dilation: int = 1,
    interpret: bool = False,
    attn_drop: float = 0.0,
    seed: T.Optional[Array] = None,
) -> T.Tuple[Array, Array, Array]:
    """Pallas NA backward (dq, dk, dv) with in-kernel softmax recompute."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, height, width, num_heads, head_dim = q.shape
    if kernel_size == 1:
        return jnp.zeros_like(q), jnp.zeros_like(k), g.astype(v.dtype)
    if not _pallas_supported(height, width, kernel_size, dilation):
        weights_fn = (
            _xla_weights_dropout(attn_drop, seed) if attn_drop > 0 else None
        )
        _, vjp = jax.vjp(
            lambda q_, k_, v_: neighborhood_attention_2d(
                q_, k_, v_, kernel_size, dilation, weights_fn=weights_fn
            ),
            q,
            k,
            v,
        )
        return vjp(g)

    # Smaller bands than the no-dropout forward: the backward's adjoint
    # accumulators and kv-plane output blocks leave less VMEM headroom for
    # per-band temps. MUST stay equal to the dropout forward's banding
    # (mask streams are seeded per band program).
    plan = _make_plan(
        batch, height, width, num_heads, head_dim, kernel_size, dilation,
        target_band_px=_BWD_BAND_PX,
    )
    qf = _query_flat(_to_lanes(q, plan), plan)
    gf = _query_flat(_to_lanes(g, plan), plan)
    kf = _kv_flat(_to_lanes(k, plan), plan)
    vf = _kv_flat(_to_lanes(v, plan), plan)
    mask = _group_mask(plan, head_dim)

    kernel = functools.partial(
        _na2d_bwd_drop_kernel if attn_drop > 0 else _na2d_bwd_kernel,
        plan=plan,
        kernel_size=kernel_size,
        dilation=dilation,
        height=height,
        width=width,
        head_dim=head_dim,
        attn_drop=float(attn_drop),
    )
    q_spec = pl.BlockSpec(
        (1, plan.query_px, plan.lanes),
        lambda b, t: (b, t, 0),
        memory_space=pltpu.VMEM,
    )
    kv_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    m_spec = pl.BlockSpec(
        (plan.lanes, plan.groups), lambda b, t: (0, 0),
        memory_space=pltpu.VMEM,
    )
    if plan.accumulate_kv:
        kv_out_spec = pl.BlockSpec(
            (1, plan.kv_px, plan.lanes),
            lambda b, t: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )
        kv_out_shape = jax.ShapeDtypeStruct(
            (plan.batch_groups, plan.kv_px, plan.lanes), jnp.float32
        )
    else:
        kv_out_spec = pl.BlockSpec(
            (1, 1, plan.band_px, plan.lanes),
            lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        )
        kv_out_shape = jax.ShapeDtypeStruct(
            (plan.batch_groups, plan.num_bands, plan.band_px, plan.lanes),
            jnp.float32,
        )

    in_specs = [q_spec, kv_spec, kv_spec, q_spec, m_spec]
    inputs = [qf, kf, vf, gf, mask]
    if attn_drop > 0:
        seed_arr = jnp.asarray(
            seed if seed is not None else 0, dtype=jnp.int32
        ).reshape((1,))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(seed_arr)

    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        )
    dqf, dk_out, dv_out = pl.pallas_call(
        kernel,
        grid=(plan.batch_groups, plan.num_bands),
        out_shape=(
            jax.ShapeDtypeStruct(qf.shape, q.dtype),
            kv_out_shape,
            kv_out_shape,
        ),
        in_specs=in_specs,
        out_specs=(q_spec, kv_out_spec, kv_out_spec),
        scratch_shapes=[
            pltpu.VMEM((plan.band_px, plan.lanes), k.dtype),
            pltpu.VMEM((plan.band_px, plan.lanes), v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(*inputs)

    dq = dqf.reshape(
        plan.batch_groups, plan.height_pad, plan.width_pad, plan.lanes
    )
    dq = _from_lanes(
        dq, plan, batch, height, width, num_heads, head_dim
    ).astype(q.dtype)

    def unpack_kv(out, like):
        flat = out if plan.accumulate_kv else _overlap_add(out, plan)
        grid = flat.reshape(
            plan.batch_groups,
            plan.height_pad + 2 * plan.halo_rows,
            plan.width_pad,
            plan.lanes,
        )[:, plan.halo_rows : plan.halo_rows + height]
        return _from_lanes(
            grid, plan, batch, height, width, num_heads, head_dim
        ).astype(like.dtype)

    return dq, unpack_kv(dk_out, k), unpack_kv(dv_out, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def na2d_fused(
    q: Array,
    k: Array,
    v: Array,
    kernel_size: int,
    dilation: int = 1,
    interpret: bool = False,
) -> Array:
    """na2d with Pallas forward AND Pallas backward (flash-style softmax
    recompute in the backward kernel; residuals are only q, k, v)."""
    return na2d_pallas(q, k, v, kernel_size, dilation, interpret=interpret)


def _na2d_fused_fwd(q, k, v, kernel_size, dilation, interpret):
    out = na2d_pallas(q, k, v, kernel_size, dilation, interpret=interpret)
    return out, (q, k, v)


def _na2d_fused_bwd(kernel_size, dilation, interpret, residuals, g):
    q, k, v = residuals
    return na2d_pallas_bwd(
        q, k, v, g, kernel_size, dilation, interpret=interpret
    )


na2d_fused.defvjp(_na2d_fused_fwd, _na2d_fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def na2d_fused_dropout(
    q: Array,
    k: Array,
    v: Array,
    seed: Array,
    kernel_size: int,
    dilation: int = 1,
    attn_drop: float = 0.0,
    interpret: bool = False,
) -> Array:
    """na2d with in-kernel attention-weights dropout (Pallas fwd + bwd).

    The backward redraws the identical dropout masks from (seed, program
    ids) — residuals stay just (q, k, v, seed), nothing mask-sized is
    stored. This keeps the fused Mosaic path on the TRAINING path with the
    natten module's attn_drop semantics (reference convolution.py:348).
    """
    return na2d_pallas(
        q, k, v, kernel_size, dilation,
        interpret=interpret, attn_drop=attn_drop, seed=seed,
    )


def _na2d_fused_dropout_fwd(
    q, k, v, seed, kernel_size, dilation, attn_drop, interpret
):
    out = na2d_pallas(
        q, k, v, kernel_size, dilation,
        interpret=interpret, attn_drop=attn_drop, seed=seed,
    )
    return out, (q, k, v, seed)


def _na2d_fused_dropout_bwd(
    kernel_size, dilation, attn_drop, interpret, residuals, g
):
    q, k, v, seed = residuals
    dq, dk, dv = na2d_pallas_bwd(
        q, k, v, g, kernel_size, dilation,
        interpret=interpret, attn_drop=attn_drop, seed=seed,
    )
    dseed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return dq, dk, dv, dseed


na2d_fused_dropout.defvjp(_na2d_fused_dropout_fwd, _na2d_fused_dropout_bwd)


# ---------------------------------------------------------------------------
# Fully fused LN -> QKV -> NA -> proj -> LN block (single-program variant for
# small channel counts; kept for experiments — the banded core is default).
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
            vmem_limit_bytes=110 * 1024 * 1024,
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

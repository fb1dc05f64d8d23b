"""Pallas attention-core kernel vs the XLA implementation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cultionet_tpu.ops.natten import neighborhood_attention_2d
from cultionet_tpu.ops.natten_pallas import na2d_fused, na2d_pallas


@pytest.mark.parametrize(
    "hw,heads,dim,dilation",
    [
        ((10, 10), 2, 8, 1),
        ((12, 16), 4, 16, 1),
        ((16, 12), 2, 8, 2),
        ((9, 9), 2, 8, 1),  # HW not a multiple of the pad tile
    ],
)
def test_na2d_pallas_matches_xla(hw, heads, dim, dilation):
    rng = np.random.default_rng(0)
    h, w = hw
    q = jnp.asarray(rng.normal(size=(2, h, w, heads, dim)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, h, w, heads, dim)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, h, w, heads, dim)), dtype=jnp.float32)

    expected = neighborhood_attention_2d(q, k, v, 3, dilation)
    got = na2d_pallas(q, k, v, 3, dilation, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=2e-5, rtol=1e-4
    )


def test_na2d_fused_grad_matches_xla():
    rng = np.random.default_rng(1)
    shape = (1, 8, 8, 2, 4)
    q = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)
    g = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)

    _, vjp_fused = jax.vjp(
        lambda q_, k_, v_: na2d_fused(q_, k_, v_, 3, 1, True), q, k, v
    )
    _, vjp_ref = jax.vjp(
        lambda q_, k_, v_: neighborhood_attention_2d(q_, k_, v_, 3, 1),
        q,
        k,
        v,
    )
    for a, b in zip(vjp_fused(g), vjp_ref(g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize("dilation", [1, 2])
def test_na2d_bf16_storage_dtype_shifts(dilation):
    """bf16 inputs ride the roll/select shift machinery in storage dtype
    (cast to f32 only at the product sites) — values must match the f32
    XLA oracle fed the same bf16-rounded operands, fwd and grad."""
    rng = np.random.default_rng(2)
    shape = (2, 10, 12, 2, 8)
    q = jnp.asarray(rng.normal(size=shape), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=shape), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=shape), dtype=jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=shape), dtype=jnp.bfloat16)

    def oracle(q_, k_, v_):
        out = neighborhood_attention_2d(
            q_.astype(jnp.float32),
            k_.astype(jnp.float32),
            v_.astype(jnp.float32),
            3,
            dilation,
        )
        return out.astype(jnp.bfloat16)

    expected, vjp_ref = jax.vjp(oracle, q, k, v)
    got, vjp_fused = jax.vjp(
        lambda q_, k_, v_: na2d_fused(q_, k_, v_, 3, dilation, True),
        q,
        k,
        v,
    )
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32),
        np.asarray(expected, dtype=np.float32),
        atol=0.05,  # bf16 output rounding + bf16 MXU passes in the kernel
        rtol=0.05,
    )
    for a, b in zip(vjp_fused(g), vjp_ref(g)):
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float32),
            np.asarray(b, dtype=np.float32),
            atol=0.08,
            rtol=0.08,
        )


# ---------------------------------------------------------------------------
# Band partition balancing (experiments/na_band_sweep.json): the plan must
# split rows evenly across the band count — a target-size-driven split left
# 50x50 sites a mostly-padding final band (~30% wasted work on v5e).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dilation", [1, 2])
@pytest.mark.parametrize("target", [256, 1024, 2048, 4096])
def test_make_plan_band_balance_invariants(dilation, target):
    from cultionet_tpu.ops.natten_pallas import _make_plan

    for height in list(range(3, 64)) + [100, 128, 137, 200, 512]:
        for width in (8, 25, 50, 100):
            if min(height, width) < 3 * dilation:
                continue
            plan = _make_plan(
                batch=2,
                height=height,
                width=width,
                num_heads=2,
                head_dim=8,
                kernel_size=3,
                dilation=dilation,
                target_band_px=target,
            )
            ctx = f"H={height} W={width} d={dilation} t={target}: {plan}"
            # Coverage: bands tile the (padded) height.
            assert plan.num_bands * plan.rows_per_band == plan.height_pad, ctx
            assert plan.height_pad >= height, ctx
            # Mosaic sublane alignment: even rows, at least one window step.
            assert plan.rows_per_band % 2 == 0, ctx
            assert plan.rows_per_band >= 2, ctx
            # Balance: rows = even-ceil(H / num_bands) — no band carries
            # more than one even-rounding step of padding beyond its share,
            # and the final band is never empty.
            expected_rows = max(2, -(-(-(-height // plan.num_bands)) // 2) * 2)
            assert plan.rows_per_band == expected_rows, ctx
            assert (plan.num_bands - 1) * plan.rows_per_band < height, ctx


def test_make_plan_lane_fold_selection():
    """Lane-fold policy at the model's NA channel widths: fold packs batch
    elements into lanes while fold*2*C <= 128, so C=16/32 (hidden=32
    stage a at h32/h64... ) reach full 128-lane fill, C=64 (hidden=64
    stage a) selects fold=2 = exactly 128 raw lanes, and C>=128 needs no
    fold (measured A/B: experiments/na_fold_h64.json)."""
    from cultionet_tpu.ops.natten_pallas import _make_plan

    for channels, batch, want_fold in [
        (16, 32, 8),   # doubles while fold*2*C <= 128: 8*16 = 128 lanes
        (32, 32, 4),
        (64, 32, 2),   # 2*2*64=256 > 128 stops at fold=2 -> 128 lanes
        (64, 2, 2),
        (64, 3, 1),    # batch not divisible by 2
        (128, 32, 1),
        (256, 32, 1),
    ]:
        plan = _make_plan(
            batch=batch,
            height=50,
            width=50,
            num_heads=4,
            head_dim=channels // 4,
            kernel_size=3,
            dilation=1,
        )
        ctx = f"C={channels} B={batch}: {plan}"
        assert plan.fold == want_fold, ctx
        assert plan.raw_lanes == want_fold * channels, ctx
        assert plan.raw_lanes <= 128 or channels > 128, ctx
        assert plan.batch_groups * plan.fold == batch, ctx
        # Never pad lanes beyond one 128 tile unless channels demand it.
        assert plan.lanes == -(-plan.raw_lanes // 128) * 128, ctx


def test_na2d_pallas_multiband_balanced_fwd():
    """Forward parity through a balanced multi-band plan (interpret mode)."""
    from cultionet_tpu.ops.natten_pallas import _make_plan

    rng = np.random.default_rng(3)
    shape = (2, 40, 12, 2, 8)
    q = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)

    plan = _make_plan(2, 40, 12, 2, 8, 3, 1, target_band_px=256)
    assert plan.num_bands >= 3  # the override really forces multi-band

    expected = neighborhood_attention_2d(q, k, v, 3, 1)
    got = na2d_pallas(q, k, v, 3, 1, interpret=True, target_band_px=256)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=2e-5, rtol=1e-4
    )


def test_na2d_fused_multiband_balanced_grad(monkeypatch):
    """Backward parity when the shared fwd/bwd band plan is multi-band."""
    from cultionet_tpu.ops import natten_pallas

    monkeypatch.setattr(natten_pallas, "_BWD_BAND_PX", 256)
    rng = np.random.default_rng(4)
    shape = (1, 40, 12, 2, 8)
    q = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)
    g = jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)

    _, vjp_fused = jax.vjp(
        lambda q_, k_, v_: na2d_fused(q_, k_, v_, 3, 1, True), q, k, v
    )
    _, vjp_ref = jax.vjp(
        lambda q_, k_, v_: neighborhood_attention_2d(q_, k_, v_, 3, 1),
        q,
        k,
        v,
    )
    for a, b in zip(vjp_fused(g), vjp_ref(g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )

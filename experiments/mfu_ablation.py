"""Per-fragment step-time breakdown on the real TPU (VERDICT r2 #4).

``jax.profiler`` hangs over the tunneled platform, so this measures the
same thing by construction: each model fragment (temporal front end,
encoder, decoder, fusion towers, heads+combine) is timed standalone —
fwd+bwd with host-readback sync — alongside the full train step and an
XLA cost analysis per fragment. The result attributes every millisecond
of the no-attention floor and reports MFU per fragment.

Usage: python mfu_ablation.py [--hidden 32] [--batch-size 32]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

PEAK = {"v6": 918e12, "v5p": 459e12, "v5": 197e12, "v4": 275e12}


def peak_flops():
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for key, val in PEAK.items():
        if key in kind:
            return val
    return 0.0


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def time_fn(fn, *args, iters=20):
    """fwd+bwd wall time via host readback; returns (ms, flops)."""
    def loss_fn(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(leaf.astype(jnp.float32) ** 2) for leaf in leaves)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    val, _ = grad_fn(*args)  # compile
    sync(val)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            val, _ = grad_fn(*args)
        sync(val)
        best = min(best, time.perf_counter() - t0)
    flops = 0.0
    try:
        cost = grad_fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        pass
    return best / iters * 1e3, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--out", default="mfu_ablation.json")
    args = ap.parse_args()

    from cultionet_tpu.models.temporal import PreTimeReduction
    from cultionet_tpu.models.unet_parts import (
        TowerUNetDecoder,
        TowerUNetEncoder,
        TowerUNetFinal,
        TowerUNetFinalCombine,
        TowerUNetFusion,
    )

    h = args.hidden
    bs = args.batch_size
    H = W = 100
    dil = [1, 2]
    kw = dict(
        dilations=dil,
        activation_type="SiLU",
        res_block_type="resa",
        batchnorm_first=False,
        attention_weights=None,  # fragments of the no-attention floor
    )
    rng = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16

    def feats(hh, ww, c):
        return jax.random.normal(rng, (bs, hh, ww, c), dtype)

    results = {}
    peak = peak_flops()

    # fragment: temporal front end
    pre = PreTimeReduction(out_channels=h, in_time=12)
    x5 = jax.random.normal(rng, (bs, 12, H, W, 3), dtype)
    v = pre.init(rng, x5, training=False)
    ms, fl = time_fn(
        lambda xx: pre.apply(v, xx, training=False), x5
    )
    results["pre_time_reduction"] = {"ms": ms, "gflops": fl / 1e9}

    # fragment: encoder
    enc = TowerUNetEncoder(
        channels=[h, h * 2, h * 4, h * 8], pool_by_max=False, **kw
    )
    xin = feats(H, W, h)
    v = enc.init(rng, xin, training=False)
    ms, fl = time_fn(lambda xx: enc.apply(v, xx, training=False), xin)
    results["encoder"] = {"ms": ms, "gflops": fl / 1e9}

    # encoder outputs for downstream fragments
    embs = {
        "x_a": feats(H, W, h),
        "x_b": feats(H // 2, W // 2, h * 2),
        "x_c": feats(H // 4, W // 4, h * 4),
        "x_d": feats(H // 8 + 1, W // 8 + 1, h * 8),
    }
    up = h * 4
    dec = TowerUNetDecoder(up_channels=up, **kw)
    v = dec.init(rng, embs, training=False)
    ms, fl = time_fn(lambda ee: dec.apply(v, ee, training=False), embs)
    results["decoder"] = {"ms": ms, "gflops": fl / 1e9}

    decs = {
        "x_du": feats(H // 8 + 1, W // 8 + 1, up),
        "x_cu": feats(H // 4, W // 4, up),
        "x_bu": feats(H // 2, W // 2, up),
        "x_au": feats(H, W, up),
    }
    fus = TowerUNetFusion(
        channels=[h, h * 2, h * 4, h * 8],
        up_channels=up,
        use_latlon=False,
        **kw,
    )
    v = fus.init(rng, embs, decs, None, training=False)
    ms, fl = time_fn(
        lambda ee, dd: fus.apply(v, ee, dd, None, training=False),
        embs,
        decs,
    )
    results["fusion_towers"] = {"ms": ms, "gflops": fl / 1e9}

    towers = {
        "x_tower_c": feats(H // 4, W // 4, up),
        "x_tower_b": feats(H // 2, W // 2, up),
        "x_tower_a": feats(H, W, up),
    }
    final_a = TowerUNetFinal(num_classes=1)
    v = final_a.init(rng, towers["x_tower_a"], training=False)
    ms, fl = time_fn(
        lambda tt: final_a.apply(v, tt, training=False),
        towers["x_tower_a"],
    )
    results["final_head_a"] = {"ms": ms, "gflops": fl / 1e9}

    for name, row in results.items():
        mfu = (
            (row["gflops"] * 1e9) / (row["ms"] / 1e3) / peak
            if peak and row["ms"]
            else 0.0
        )
        row["mfu"] = round(mfu, 4)
        print(
            f"{name:22s} {row['ms']:8.2f} ms  {row['gflops']:8.1f} GFLOP"
            f"  mfu={row['mfu']:.3f}",
            flush=True,
        )

    Path(args.out).write_text(json.dumps(results, indent=1))
    print("->", args.out)


if __name__ == "__main__":
    main()

"""Where the attention time goes: per-site NA sandwich vs kernel-only.

The hidden=32 model runs 9 NA sandwiches (LN -> QKV -> kernel -> proj ->
LN): encoder a/b/c, decoder up a/b/c, fusion towers a/b/c. This times
each production site fwd+bwd three ways on the real TPU:

- sandwich: the full LN/QKV/kernel/proj/LN block as the model runs it
- module:   NeighborhoodAttention2D alone (QKV + kernel + proj)
- kernel:   the Pallas na2d call alone on pre-split heads

to attribute the ~28 ms whole-step attention cost (BASELINE.md train-step
ablation) between the Mosaic kernels and the surrounding XLA matmuls.

Usage: python experiments/na_block_ablation.py [--hidden 32] [--drop 0.1]
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
from einops import rearrange
from flax import linen as nn


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def time_fn(fn, *args, iters=30):
    def loss_fn(*a):
        out = fn(*a)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    val, _ = grad_fn(*args)
    sync(val)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            val, _ = grad_fn(*args)
        sync(val)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


class Sandwich(nn.Module):
    num_heads: int
    kernel_size: int
    dilation: int
    attn_drop: float

    @nn.compact
    def __call__(self, x):
        from cultionet_tpu.nn.attention import NeighborhoodAttention2D

        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = NeighborhoodAttention2D(
            num_heads=self.num_heads,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            attn_drop=self.attn_drop,
            proj_drop=self.attn_drop,
        )(h, training=self.attn_drop > 0)
        return nn.LayerNorm(epsilon=1e-5)(h)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--drop", type=float, default=0.1)
    ap.add_argument("--out", default="experiments/na_block_ablation.json")
    args = ap.parse_args()

    from cultionet_tpu.models.unet_parts import NATTEN_PARAMS
    from cultionet_tpu.nn.attention import NeighborhoodAttention2D
    from cultionet_tpu.ops.natten_pallas import na2d_fused, na2d_fused_dropout

    h = args.hidden
    bs = args.batch_size
    # (site, H, W, C, config key) for the hidden=32 model's 9 NA sites.
    sites = [
        ("enc_a", 100, 100, h, "a"),
        ("enc_b", 50, 50, 2 * h, "b"),
        ("enc_c", 25, 25, 4 * h, "c"),
        ("dec_au", 100, 100, 4 * h, "a"),
        ("dec_bu", 50, 50, 4 * h, "b"),
        ("dec_cu", 25, 25, 4 * h, "c"),
        ("tower_a", 100, 100, 4 * h, "a"),
        ("tower_b", 50, 50, 4 * h, "b"),
        ("tower_c", 25, 25, 4 * h, "c"),
    ]
    rng = jax.random.PRNGKey(0)
    results = {}
    totals = {"sandwich": 0.0, "module": 0.0, "kernel": 0.0}
    for name, H, W, C, key in sites:
        cfg = NATTEN_PARAMS[key]
        heads = cfg["natten_num_heads"]
        ksize = cfg["natten_kernel_size"]
        dil = cfg["natten_dilation"]
        x = jax.random.normal(rng, (bs, H, W, C), jnp.bfloat16)

        sw = Sandwich(heads, ksize, dil, args.drop)
        v = sw.init({"params": rng, "dropout": rng}, x)
        ms_sw = time_fn(
            lambda xx: sw.apply(v, xx, rngs={"dropout": rng}), x
        )

        mod = NeighborhoodAttention2D(
            num_heads=heads,
            kernel_size=ksize,
            dilation=dil,
            attn_drop=args.drop,
            proj_drop=args.drop,
        )
        vm = mod.init({"params": rng, "dropout": rng}, x, training=True)
        ms_mod = time_fn(
            lambda xx: mod.apply(
                vm, xx, training=args.drop > 0, rngs={"dropout": rng}
            ),
            x,
        )

        q = rearrange(x, "b h w (n d) -> b h w n d", n=heads)
        if args.drop > 0:
            ms_k = time_fn(
                lambda qq: na2d_fused_dropout(
                    qq, qq, qq, jnp.int32(7), ksize, dil, args.drop
                ),
                q,
            )
        else:
            ms_k = time_fn(
                lambda qq: na2d_fused(qq, qq, qq, ksize, dil), q
            )
        results[name] = {
            "shape": [bs, H, W, C],
            "config": key,
            "sandwich_ms": ms_sw,
            "module_ms": ms_mod,
            "kernel_ms": ms_k,
        }
        totals["sandwich"] += ms_sw
        totals["module"] += ms_mod
        totals["kernel"] += ms_k
        print(name, results[name], flush=True)
    results["totals"] = totals
    print(json.dumps(totals))
    Path(args.out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

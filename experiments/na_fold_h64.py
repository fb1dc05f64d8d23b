"""NA-kernel lane fill at hidden=64 (VERDICT r3 weak #1).

At hidden=64 the model's NA sites run C=64 (enc_a) and C=128/256
(everything else). The packing plan folds batch elements into lanes
while ``fold*2*C <= 128``, so C=64 selects fold=2 (raw_lanes=128, full
VPU fill) and C>=128 needs no fold. This probe measures that the fold
actually earns its keep: per-site fwd+bwd scan-delta time with the
natural plan vs fold forced to 1 (half-filled lanes at C=64).

Usage: python experiments/na_fold_h64.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from einops import rearrange


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def scan_time(step, x0, n_lo=8, n_hi=24, reps=3):
    def run(n):
        @jax.jit
        def body(x):
            out, _ = jax.lax.scan(
                lambda c, _: (step(c), None), x, None, length=n
            )
            return out

        out = body(x0)
        sync(out.astype(jnp.float32).sum())
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = body(x0)
            sync(out.astype(jnp.float32).sum())
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(n_hi) - run(n_lo)) / (n_hi - n_lo) * 1e3


def main():
    from cultionet_tpu.models.unet_parts import NATTEN_PARAMS
    from cultionet_tpu.ops import natten_pallas

    bs, h = 32, 64
    drop = 0.1
    sites = [
        ("enc_a", 100, 100, h, "a"),        # C=64: fold=2 candidate
        ("enc_b", 50, 50, 2 * h, "b"),      # C=128: fold=1 inherent
        ("dec_au", 100, 100, 4 * h, "a"),   # C=256
        ("tower_b", 50, 50, 4 * h, "b"),
    ]
    orig_make_plan = natten_pallas._make_plan

    def fold1_make_plan(batch, height, width, num_heads, head_dim,
                        kernel_size, dilation, target_band_px=4096):
        plan = orig_make_plan(
            batch, height, width, num_heads, head_dim,
            kernel_size, dilation, target_band_px,
        )
        if plan.fold == 1:
            return plan
        raw = num_heads * head_dim
        return plan._replace(
            batch_groups=batch,
            fold=1,
            lanes=-(-raw // 128) * 128,
            raw_lanes=raw,
            groups=num_heads,
        )

    rng = jax.random.PRNGKey(0)
    results = {}
    for name, H, W, C, key in sites:
        cfg = NATTEN_PARAMS[key]
        heads, ksize, dil = (
            cfg["natten_num_heads"],
            cfg["natten_kernel_size"],
            cfg["natten_dilation"],
        )
        plan = orig_make_plan(
            bs, H, W, heads, C // heads, ksize, dil
        )
        x = jax.random.normal(rng, (bs, H, W, C), jnp.bfloat16)
        row = {
            "shape": [bs, H, W, C],
            "dilation": dil,
            "fold": plan.fold,
            "raw_lanes": plan.raw_lanes,
            "lanes": plan.lanes,
        }

        def kernel_step(c):
            q = rearrange(c, "b h w (n d) -> b h w n d", n=heads)

            def f(qq):
                o = natten_pallas.na2d_fused_dropout(
                    qq, qq, qq, jnp.int32(7), ksize, dil, drop
                )
                return jnp.sum(o.astype(jnp.float32) ** 2)

            g = jax.grad(f)(q)
            return rearrange(g, "b h w n d -> b h w (n d)").astype(c.dtype)

        row["ms_natural"] = scan_time(kernel_step, x)
        if plan.fold > 1:
            natten_pallas._make_plan = fold1_make_plan
            try:
                row["ms_fold1"] = scan_time(kernel_step, x)
            finally:
                natten_pallas._make_plan = orig_make_plan
        results[name] = row
        print(name, json.dumps(row), flush=True)

    Path("experiments/na_fold_h64.json").write_text(
        json.dumps(results, indent=1) + "\n"
    )
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

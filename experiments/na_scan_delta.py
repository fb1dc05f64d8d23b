"""True device time per NA site via the scan-delta probe.

Per-dispatch timing over the tunneled platform carries a ~1.5 ms floor
(BASELINE.md r2 timing note), which inflates small per-op measurements —
the per-site numbers in na_block_ablation.py sum to 79 ms while the
whole-step attention delta is 28 ms (attention_delta_step.py). This
harness runs n fwd+bwd iterations inside ONE ``lax.scan`` dispatch and
differences two n values, cancelling dispatch/readback overhead exactly.

Usage: python experiments/na_scan_delta.py
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
from flax import linen as nn


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def scan_time(step, x0, n_lo=8, n_hi=24, reps=3):
    """Per-iteration device ms for ``step`` (carry -> carry)."""

    def run(n):
        @jax.jit
        def body(x):
            out, _ = jax.lax.scan(
                lambda c, _: (step(c), None), x, None, length=n
            )
            return out

        out = body(x0)
        sync(out.astype(jnp.float32).sum())  # compile+warm
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
    from cultionet_tpu.nn.attention import NeighborhoodAttention2D
    from cultionet_tpu.ops.natten_pallas import na2d_fused_dropout

    bs, h = 32, 32
    drop = 0.1
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
    tot_kernel = tot_module = 0.0
    for name, H, W, C, key in sites:
        cfg = NATTEN_PARAMS[key]
        heads, ksize, dil = (
            cfg["natten_num_heads"],
            cfg["natten_kernel_size"],
            cfg["natten_dilation"],
        )
        x = jax.random.normal(rng, (bs, H, W, C), jnp.bfloat16)

        def kernel_step(c):
            q = rearrange(c, "b h w (n d) -> b h w n d", n=heads)

            def f(qq):
                o = na2d_fused_dropout(
                    qq, qq, qq, jnp.int32(7), ksize, dil, drop
                )
                return jnp.sum(o.astype(jnp.float32) ** 2)

            g = jax.grad(f)(q)
            return rearrange(g, "b h w n d -> b h w (n d)").astype(c.dtype)

        ms_k = scan_time(kernel_step, x)

        mod = NeighborhoodAttention2D(
            num_heads=heads, kernel_size=ksize, dilation=dil,
            attn_drop=drop, proj_drop=drop,
        )
        vm = mod.init({"params": rng, "dropout": rng}, x, training=True)

        def module_step(c):
            def f(xx):
                o = mod.apply(
                    vm, xx, training=True, rngs={"dropout": rng}
                )
                return jnp.sum(o.astype(jnp.float32) ** 2)

            return jax.grad(f)(c).astype(c.dtype)

        ms_m = scan_time(module_step, x)

        results[name] = {
            "shape": [bs, H, W, C],
            "kernel_ms": ms_k,
            "module_ms": ms_m,
        }
        tot_kernel += ms_k
        tot_module += ms_m
        print(name, results[name], flush=True)
    results["totals"] = {"kernel": tot_kernel, "module": tot_module}
    print(json.dumps(results["totals"]))
    Path("experiments/na_scan_delta.json").write_text(
        json.dumps(results, indent=1)
    )


if __name__ == "__main__":
    main()

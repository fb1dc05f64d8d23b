"""True device time per NA site via unrolled-chain differencing.

scan-of-grad-of-pallas compiles pathologically over the tunnel, so this
jits an UNROLLED chain of n fwd+bwd iterations (data-dependent, so they
serialize) and differences n=8 vs n=2 — one dispatch each, cancelling
dispatch/readback overhead like the scan-delta probe in BASELINE.md.

Usage: python experiments/na_chain_delta.py
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


def chain_time(step, x0, n_lo=2, n_hi=8, reps=3):
    def make(n):
        @jax.jit
        def body(x):
            for _ in range(n):
                x = step(x)
            return x

        return body

    def run(n):
        body = make(n)
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
    ]
    # dec_* shapes == tower_* shapes, so towers reuse dec numbers.
    rng = jax.random.PRNGKey(0)
    results = {}
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

        ms_k = chain_time(kernel_step, x)

        mod = NeighborhoodAttention2D(
            num_heads=heads, kernel_size=ksize, dilation=dil,
            attn_drop=drop, proj_drop=drop,
        )
        vm = mod.init({"params": rng, "dropout": rng}, x, training=True)

        def module_step(c):
            def f(xx):
                o = mod.apply(vm, xx, training=True, rngs={"dropout": rng})
                return jnp.sum(o.astype(jnp.float32) ** 2)

            return jax.grad(f)(c).astype(c.dtype)

        ms_m = chain_time(module_step, x)

        results[name] = {
            "shape": [bs, H, W, C],
            "kernel_ms": ms_k,
            "module_ms": ms_m,
        }
        print(name, results[name], flush=True)

    model_total_kernel = sum(
        results[n]["kernel_ms"]
        for n in ("enc_a", "enc_b", "enc_c")
    ) + 2 * sum(
        results[n]["kernel_ms"]
        for n in ("dec_au", "dec_bu", "dec_cu")
    )
    model_total_module = sum(
        results[n]["module_ms"]
        for n in ("enc_a", "enc_b", "enc_c")
    ) + 2 * sum(
        results[n]["module_ms"]
        for n in ("dec_au", "dec_bu", "dec_cu")
    )
    results["model_totals_9_sites"] = {
        "kernel": model_total_kernel,
        "module": model_total_module,
    }
    print(json.dumps(results["model_totals_9_sites"]))
    Path("experiments/na_chain_delta.json").write_text(
        json.dumps(results, indent=1)
    )


if __name__ == "__main__":
    main()

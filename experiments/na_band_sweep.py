"""Band-size sweep for the banded NA kernels (production dropout path).

With attention dropout the fwd and bwd kernels share one band partition
(_BWD_BAND_PX, hard-coded 2048 since r2 with no recorded sweep). This
times fwd+bwd per model NA site via the scan-delta probe for a range of
band sizes to pick the constant (or a per-shape rule) empirically.

Usage: python experiments/na_band_sweep.py [--hidden 32] [--bs 32]
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

    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument(
        "--out", default="",
        help="result JSON (default experiments/na_band_sweep.json for "
        "h32, ..._h<h>.json otherwise)",
    )
    args = ap.parse_args()
    bs, h = args.bs, args.hidden
    out_path = Path(
        args.out
        or (
            "experiments/na_band_sweep.json"
            if h == 32
            else f"experiments/na_band_sweep_h{h}.json"
        )
    )
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
    band_sizes = [1024, 2048, 4096, 8192]
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
        row = {"shape": [bs, H, W, C], "dilation": dil}
        for band in band_sizes:
            natten_pallas._BWD_BAND_PX = band

            def kernel_step(c):
                q = rearrange(c, "b h w (n d) -> b h w n d", n=heads)

                def f(qq):
                    o = natten_pallas.na2d_fused_dropout(
                        qq, qq, qq, jnp.int32(7), ksize, dil, drop
                    )
                    return jnp.sum(o.astype(jnp.float32) ** 2)

                g = jax.grad(f)(q)
                return rearrange(
                    g, "b h w n d -> b h w (n d)"
                ).astype(c.dtype)

            try:
                row[f"band_{band}"] = scan_time(kernel_step, x)
            except Exception as e:  # VMEM overflow at large bands
                row[f"band_{band}"] = f"fail: {type(e).__name__}"
        results[name] = row
        print(name, row, flush=True)
    natten_pallas._BWD_BAND_PX = 2048
    out_path.write_text(json.dumps(results, indent=1))
    print(json.dumps({k: v for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()

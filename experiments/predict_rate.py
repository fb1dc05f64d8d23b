"""Forward-only predict throughput sweep over batch size (and hidden).

The predict path's inner step (make_predict_step: dequantize -> bf16
forward -> fp32 outputs) on the canonical chip, host-readback timed on
the real TPU. Informs the ScenePredictor default batch size.

Usage: python experiments/predict_rate.py [--hidden 32] [--out FILE]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cultionet_tpu.utils.timing import best_of  # noqa: E402


def _sync(x) -> float:
    return float(np.asarray(jax.device_get(x)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--sizes", type=int, nargs="+", default=[8, 16, 32, 64])
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from cultionet_tpu.data.synthetic import create_batch
    from cultionet_tpu.enums import AttentionTypes
    from cultionet_tpu.models import CultioNet
    from cultionet_tpu.train.optim import build_optimizer
    from cultionet_tpu.train.step import create_train_state, make_predict_step

    platform = jax.devices()[0].platform
    precision = "bf16" if platform == "tpu" else "fp32"

    rng = np.random.default_rng(0)
    results = {}
    for bs in args.sizes:
        batch = create_batch(
            num_channels=3, num_time=12, height=100, width=100,
            batch_size=bs, rng=rng,
        )
        batch = batch.replace(
            x=np.round(np.asarray(batch.x) * 10000.0).astype(np.int16),
            y=np.asarray(batch.y, dtype=np.int16),
            bdist=np.round(np.asarray(batch.bdist) * 10000.0).astype(
                np.int16
            ),
        )
        batch = jax.device_put(batch)
        model = CultioNet(
            in_time=12,
            hidden_channels=args.hidden,
            dropout=0.0,
            attention_weights=AttentionTypes.NATTEN,
            dilations=[1, 2],
        )
        tx = build_optimizer(optimizer="AdamW", learning_rate=1e-3)
        state = create_train_state(model, tx, batch.dequantize(), seed=0)
        pstep = make_predict_step(precision=precision)
        for _ in range(3):
            outputs = pstep(state, batch)
        _sync(outputs["distance"].sum())
        sec = best_of(
            lambda: pstep(state, batch),
            lambda out: _sync(out["distance"].sum()),
            n_iters=30,
            repeats=3,
        )
        rate = bs / sec
        results[str(bs)] = {
            "ms_per_step": round(sec * 1e3, 2),
            "chips_per_sec": round(rate, 1),
        }
        print(f"bs={bs}: {sec * 1e3:.2f} ms/step, {rate:.1f} chips/s")

    out = {
        "hidden": args.hidden,
        "platform": platform,
        "precision": precision,
        "results": results,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()

"""Bound the inference BN-fold prize: predict-forward with BN vs identity-BN.

VERDICT r4 weak #3(a): the predict path runs training-shaped BN — folding
BN into conv weights at predict/export time was the untried lever. Before
building the (cross-cutting) fold, measure its ceiling: replace EVERY
BatchNorm with identity (ops/flags.set_identity_bn) and time the same
forward step. The BN->identity delta upper-bounds any possible fold gain,
since a fold still pays the conv.

Usage (real TPU): python experiments/bn_fold_bench.py [--out FILE]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cultionet_tpu.ops.flags import set_identity_bn
from cultionet_tpu.utils.timing import best_of  # noqa: E402


def _sync(x) -> float:
    return float(np.asarray(jax.device_get(x)))


def time_forward(hidden: int, bs: int, identity_bn: bool) -> float:
    from cultionet_tpu.data.synthetic import create_batch
    from cultionet_tpu.enums import AttentionTypes
    from cultionet_tpu.models import CultioNet
    from cultionet_tpu.train.optim import build_optimizer
    from cultionet_tpu.train.step import create_train_state, make_predict_step

    platform = jax.devices()[0].platform
    precision = "bf16" if platform == "tpu" else "fp32"

    set_identity_bn(identity_bn)
    try:
        rng = np.random.default_rng(0)
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
            hidden_channels=hidden,
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
        return best_of(
            lambda: pstep(state, batch),
            lambda out: _sync(out["distance"].sum()),
            n_iters=30,
            repeats=3,
        )
    finally:
        set_identity_bn(False)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, nargs="+", default=[32, 64])
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    results = {}
    for h in args.hidden:
        with_bn = time_forward(h, args.bs, identity_bn=False)
        no_bn = time_forward(h, args.bs, identity_bn=True)
        delta_pct = 100.0 * (with_bn - no_bn) / with_bn
        results[f"h{h}"] = {
            "with_bn_ms": round(with_bn * 1e3, 2),
            "identity_bn_ms": round(no_bn * 1e3, 2),
            "fold_ceiling_pct": round(delta_pct, 2),
        }
        print(
            f"h{h} bs={args.bs}: with_bn {with_bn * 1e3:.2f} ms, "
            f"identity_bn {no_bn * 1e3:.2f} ms "
            f"-> fold ceiling {delta_pct:.2f}%"
        )

    out = {
        "bs": args.bs,
        "platform": jax.devices()[0].platform,
        "results": results,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()

"""Train this framework on the USA chips (TPU) — the accuracy-parity run.

Mirrors experiments/torch_train_reference.py exactly: same chips, same
deterministic every-5th val split, same normalization stats, same recipe
(hidden=32, natten, dropout 0.1, TanimotoComplement cls+reg, AdamW lr=0.01
OneCycleLR, wd=1e-3, eps=1e-4, grad-norm clip 1.0, batch 8 x accum 2), and
the same shared numpy scorer on the val predictions, so the two frameworks'
crop-mask/edge F1 are directly comparable.

Usage:
  python jax_train_usa.py --epochs 60 --out jax_history.json
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from torch_train_reference import (  # noqa: E402
    eval_metrics,
    load_chip,
    norm_stats,
    split_files,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chips", default="usa_project/data/train/processed")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--precision", default="16-mixed")
    ap.add_argument("--augment-prob", type=float, default=0.0)
    ap.add_argument("--out", default="jax_history.json")
    ap.add_argument("--ckpt-dir", default="jax_usa_ckpt")
    ap.add_argument(
        "--temporal-encoder",
        default="conv",
        choices=["conv", "transformer"],
        help="B,C,T,H,W temporal embedding: the reference's 3-D-conv "
        "PreTimeReduction (nunet.py:18-105) or the restored "
        "TemporalTransformer (north-star config #3)",
    )
    ap.add_argument(
        "--use-chipstore",
        default=None,
        choices=[None, "stream", "hbm", "auto"],
        help="fast train-input path: 'hbm' pins the int16 split on device "
        "(e2e == step rate); default None streams host-loaded batches",
    )
    args = ap.parse_args()

    import jax

    from cultionet_tpu.config import CultionetParams
    from cultionet_tpu.data.datasets import ChipDataset
    from cultionet_tpu.model import fit
    from cultionet_tpu.utils.normalize import NormValues

    chip_dir = Path(args.chips)
    train_files, val_files = split_files(chip_dir)
    print(f"train={len(train_files)} val={len(val_files)}")
    med, std = norm_stats(train_files)
    print("norm median", med, "std", std)

    nv = NormValues(
        dataset_mean=med,
        dataset_std=std,
        dataset_crop_counts=np.zeros(2, dtype=np.int64),
        dataset_edge_counts=np.zeros(2, dtype=np.int64),
        num_channels=len(med),
    )

    root = chip_dir.parent  # ChipDataset resolves root/processed
    dataset = ChipDataset(root, norm_values=nv, random_seed=args.seed)
    assert len(dataset.files) == len(train_files) + len(val_files)

    # Pin the split to the shared every-5th protocol (torch side uses the
    # identical lists) instead of the random val_frac split.
    train_sub = dataset._subset(train_files)
    val_sub = dataset._subset(val_files)
    val_sub.augment_prob = 0.0
    dataset.split_train_val = (
        lambda val_frac, spatial_balance=False, rng=None: (
            train_sub,
            val_sub,
        )
    )

    ckpt_dir = Path(args.ckpt_dir).resolve()
    params = CultionetParams(
        ckpt_file=ckpt_dir / "last.ckpt",
        dataset=dataset,
        val_frac=0.2,
        batch_size=args.batch_size,
        edge_class=2,
        augment_prob=args.augment_prob,
        in_channels=3,
        in_time=13,
        hidden_channels=args.hidden,
        dropout=0.1,
        dilations=[1, 2],
        attention_weights="natten",
        optimizer="AdamW",
        loss_name="TanimotoComplementLoss",
        learning_rate=args.lr,
        lr_scheduler="OneCycleLR",
        weight_decay=1e-3,
        eps=1e-4,
        epochs=args.epochs,
        accumulate_grad_batches=args.accum,
        gradient_clip_val=1.0,
        precision=args.precision,
        random_seed=args.seed,
        use_chipstore=args.use_chipstore or False,
        temporal_encoder=args.temporal_encoder,
    )

    t0 = time.time()
    result = fit(params)
    train_time = time.time() - t0
    print(f"fit done in {train_time:.0f}s")

    # Shared-scorer evaluation of the FINAL state on the val split.
    import jax.numpy as jnp

    from cultionet_tpu.data.batch import Batch

    state = result.state
    variables = {
        "params": state.params,
        "batch_stats": state.batch_stats,
    }

    dists, edges, crops, ys, bds = [], [], [], [], []
    for f in val_files:
        x, y, bdist = load_chip(f)
        xn = (x - med) / std
        batch = Batch(x=jnp.asarray(xn[None]))
        out = result.model.apply(variables, batch, training=False)
        dists.append(np.asarray(out["distance"])[0, ..., 0])
        edges.append(np.asarray(out["edge"])[0, ..., 0])
        crops.append(np.asarray(out["crop"])[0, ..., 0])
        ys.append(y)
        bds.append(bdist)

    m = eval_metrics(
        np.stack(dists),
        np.stack(edges),
        np.stack(crops),
        np.stack(ys),
        np.stack(bds),
    )
    print("final val metrics (shared scorer):", m)

    payload = {
        "history": result.history,
        "final_val_metrics": m,
        "train_time_s": train_time,
        "best_score": float(result.best_score),
        "n_devices": len(jax.devices()),
        "config": {
            k: str(v)
            for k, v in vars(args).items()
        },
    }
    Path(args.out).write_text(json.dumps(payload, indent=1))
    print("->", args.out)


if __name__ == "__main__":
    main()

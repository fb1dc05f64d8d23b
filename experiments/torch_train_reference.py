"""Train the PyTorch reference model on the USA chips (CPU) — parity anchor.

This harness reproduces the reference's training loop outside Lightning
(reference models/lightning.py:209-466, model.py:273-330) so that the
torch model can train in this minimal image (lightning/torchmetrics are
stubbed by utils/torch_import.py; natten is replaced by the faithful torch
stand-in used by the parity tests):

- model:      reference ``TowerUNet`` (models/nunet.py:108), natten
              attention, hidden=32, dropout=0.1 — the README recipe
- loss:       TanimotoComplementLoss cls + reg (lightning.py LOSS_DICT,
              default per args.yml:441)
- labels:     get_true_labels semantics (edge==2, crop==1, weak -1 mask)
- optimizer:  AdamW(lr=0.01, betas=(0.9, 0.98), eps=1e-4, wd=1e-3) +
              OneCycleLR per-step (lightning.py:611-683), grad-norm clip 1.0
- metrics:    F-beta(beta=2, macro over present classes) + MCC + MAE in
              numpy — the same definitions as cultionet_tpu/train/metrics.py
              (itself validated against sklearn in tests)

Usage:
  python torch_train_reference.py --chips usa_project/data/train/processed \
      --epochs 60 --batch-size 8 --accum 2 --out torch_history.json
  python torch_train_reference.py ... --time-only   # one-step timing
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cultionet_tpu.utils.torch_import import load_reference_module  # noqa


# ---------------------------------------------------------------------------
# Shared experiment protocol (identical for the JAX side — jax_train_usa.py)
# ---------------------------------------------------------------------------

def split_files(chip_dir: Path):
    """Deterministic 80/20 split: sorted files, every 5th chip is val."""
    files = sorted(Path(chip_dir).glob("*.npz"))
    val = files[::5]
    train = [f for f in files if f not in set(val)]
    return train, val


def load_chip(path: Path):
    z = np.load(path)
    x = z["x"][0]  # (T, H, W, C) float scaled [0, 1]
    y = z["y"][0].astype(np.int64)
    bdist = z["bdist"][0].astype(np.float32)
    return x, y, bdist


def norm_stats(train_files):
    """Per-channel median/std over the train split (reference
    NormValues.from_dataset semantics, normalize.py:119-213)."""
    samples = []
    for f in train_files:
        x, _, _ = load_chip(f)
        samples.append(x.reshape(-1, x.shape[-1])[::37])
    allx = np.concatenate(samples, axis=0)
    med = np.median(allx, axis=0)
    std = allx.std(axis=0)
    return med.astype(np.float32), std.astype(np.float32)


def fbeta_macro(pred, true, beta=2.0, num_classes=2):
    cm = np.zeros((num_classes, num_classes))
    for t in range(num_classes):
        for p in range(num_classes):
            cm[t, p] = np.sum((true == t) & (pred == p))
    tp = np.diag(cm)
    fn = cm.sum(1) - tp
    fp = cm.sum(0) - tp
    b2 = beta * beta
    denom = (1 + b2) * tp + b2 * fn + fp
    score = np.where(denom > 0, (1 + b2) * tp / np.maximum(denom, 1), 0.0)
    present = (cm.sum(1) + cm.sum(0)) > 0
    return float(score[present].mean()) if present.any() else 0.0


def mcc_binary(pred, true):
    tp = float(np.sum((pred == 1) & (true == 1)))
    tn = float(np.sum((pred == 0) & (true == 0)))
    fp = float(np.sum((pred == 1) & (true == 0)))
    fn = float(np.sum((pred == 0) & (true == 1)))
    denom = np.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return float((tp * tn - fp * fn) / denom) if denom > 0 else 0.0


def eval_metrics(dist, edge_p, crop_p, y, bdist, edge_class=2):
    """Shared numpy scorer for both frameworks' predictions."""
    true_edge = (y == edge_class).astype(np.int64)
    true_crop = ((y > 0) & (y < edge_class)).astype(np.int64)
    valid = y != -1
    dist, bdist = dist[valid], bdist[valid]
    edge_hat = (edge_p > 0.5).astype(np.int64)[valid]
    crop_hat = (crop_p > 0.5).astype(np.int64)[valid]
    true_edge, true_crop = true_edge[valid], true_crop[valid]
    return {
        "dist_mae": float(np.abs(dist - bdist).mean()),
        "edge_f1": fbeta_macro(edge_hat, true_edge),
        "crop_f1": fbeta_macro(crop_hat, true_crop),
        "edge_mcc": mcc_binary(edge_hat, true_edge),
        "crop_mcc": mcc_binary(crop_hat, true_crop),
    }


# ---------------------------------------------------------------------------
# Torch harness
# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chips", default="usa_project/data/train/processed")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="torch_history.json")
    ap.add_argument("--time-only", action="store_true")
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()

    import torch

    if args.threads:
        torch.set_num_threads(args.threads)

    train_files, val_files = split_files(Path(args.chips))
    print(f"train={len(train_files)} val={len(val_files)}")
    med, std = norm_stats(train_files)
    print("norm median", med, "std", std)

    def to_tensors(files):
        xs, ys, bs = [], [], []
        for f in files:
            x, y, bdist = load_chip(f)
            x = (x - med) / std
            # (T, H, W, C) -> (C, T, H, W) reference layout
            xs.append(np.transpose(x, (3, 0, 1, 2)))
            ys.append(y)
            bs.append(bdist)
        return (
            torch.from_numpy(np.stack(xs).astype(np.float32)),
            torch.from_numpy(np.stack(ys)),
            torch.from_numpy(np.stack(bs)),
        )

    xtr, ytr, btr = to_tensors(train_files)
    xva, yva, bva = to_tensors(val_files)
    print("train x", tuple(xtr.shape), "val x", tuple(xva.shape))

    nunet = load_reference_module("cultionet.models.nunet")
    losses_mod = load_reference_module("cultionet.losses")

    torch.manual_seed(args.seed)
    model = nunet.TowerUNet(
        in_channels=int(xtr.shape[1]),
        in_time=int(xtr.shape[2]),
        hidden_channels=args.hidden,
        num_classes=1,
        attention_weights="natten",
        res_block_type="resa",
        dropout=0.1,
        dilations=[1, 2],
        activation_type="SiLU",
        edge_activation=True,
        mask_activation=True,
        pool_by_max=False,
        batchnorm_first=False,
        use_latlon=False,
    )
    n_params = sum(p.numel() for p in model.parameters())
    print(f"params: {n_params/1e6:.2f}M")

    cls_loss = losses_mod.TanimotoComplementLoss()
    reg_loss = losses_mod.TanimotoComplementLoss(
        transform_logits=False, one_hot_targets=False
    )

    def calc_loss(pred, y, bdist):
        true_edge = torch.where(y == 2, 1, 0).long()
        true_crop = torch.where((y > 0) & (y < 2), 1, 0).long()
        mask = None
        if int(y.min()) == -1:
            mask = torch.where(y == -1, 0, 1).long().unsqueeze(1)
        dist_l = reg_loss(inputs=pred["distance"], targets=bdist, mask=mask)
        edge_l = cls_loss(inputs=pred["edge"], targets=true_edge, mask=mask)
        crop_l = cls_loss(inputs=pred["crop"], targets=true_crop, mask=mask)
        return (dist_l + edge_l + crop_l) / 3.0

    opt = torch.optim.AdamW(
        model.parameters(),
        lr=args.lr,
        weight_decay=1e-3,
        eps=1e-4,
        betas=(0.9, 0.98),
    )
    steps_per_epoch = int(np.ceil(len(train_files) / args.batch_size))
    opt_steps_per_epoch = int(np.ceil(steps_per_epoch / args.accum))
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt,
        max_lr=args.lr,
        epochs=args.epochs,
        steps_per_epoch=opt_steps_per_epoch,
    )

    rng = np.random.default_rng(args.seed)

    if args.time_only:
        model.train()
        xb, yb, bb = xtr[: args.batch_size], ytr[: args.batch_size], btr[: args.batch_size]
        for i in range(3):
            t0 = time.time()
            pred = model(xb, latlon_coords=None)
            loss = calc_loss(pred, yb, bb)
            loss.backward()
            opt.step()
            opt.zero_grad()
            print(f"step {i}: {time.time()-t0:.2f}s loss={float(loss):.4f}")
        return

    history = []
    t_start = time.time()
    for epoch in range(args.epochs):
        model.train()
        perm = rng.permutation(len(train_files))
        ep_loss, n_seen = 0.0, 0
        opt.zero_grad()
        for si in range(steps_per_epoch):
            idx = perm[si * args.batch_size : (si + 1) * args.batch_size]
            xb, yb, bb = xtr[idx], ytr[idx], btr[idx]
            pred = model(xb, latlon_coords=None)
            loss = calc_loss(pred, yb, bb)
            (loss / args.accum).backward()
            ep_loss += float(loss) * len(idx)
            n_seen += len(idx)
            if (si + 1) % args.accum == 0 or si == steps_per_epoch - 1:
                torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
                opt.step()
                opt.zero_grad()
                sched.step()

        # validation
        model.eval()
        val_loss, vn = 0.0, 0
        preds = {"dist": [], "edge": [], "crop": []}
        with torch.no_grad():
            for vi in range(0, len(val_files), args.batch_size):
                xb = xva[vi : vi + args.batch_size]
                yb = yva[vi : vi + args.batch_size]
                bb = bva[vi : vi + args.batch_size]
                pred = model(xb, latlon_coords=None)
                val_loss += float(calc_loss(pred, yb, bb)) * len(xb)
                vn += len(xb)
                preds["dist"].append(pred["distance"].squeeze(1).numpy())
                preds["edge"].append(pred["edge"].squeeze(1).numpy())
                preds["crop"].append(pred["crop"].squeeze(1).numpy())
        m = eval_metrics(
            np.concatenate(preds["dist"]),
            np.concatenate(preds["edge"]),
            np.concatenate(preds["crop"]),
            yva.numpy(),
            bva.numpy(),
        )
        row = {
            "epoch": epoch,
            "loss": ep_loss / max(n_seen, 1),
            "val_loss": val_loss / max(vn, 1),
            **m,
            "elapsed_s": time.time() - t_start,
        }
        history.append(row)
        print(
            f"ep {epoch:3d} loss {row['loss']:.4f} vloss {row['val_loss']:.4f} "
            f"ef1 {m['edge_f1']:.4f} cf1 {m['crop_f1']:.4f} "
            f"cmcc {m['crop_mcc']:.4f} mae {m['dist_mae']:.4f}"
        )
        Path(args.out).write_text(json.dumps(history, indent=1))

    print(f"done in {time.time()-t_start:.0f}s -> {args.out}")


if __name__ == "__main__":
    main()

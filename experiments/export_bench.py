"""Serving-artifact throughput: exported StableHLO vs in-process predict.

Exports the flagship h32 predict program (cultionet_tpu/export.py) for
the current backend, reloads it cold (pure ``jax.export.deserialize`` —
the path a serving host takes), and times `.call` against the in-process
``make_predict_step`` on the canonical 3x12x100x100 chip at bs=32.
Expected: parity — the artifact is the same XLA program with params as
baked constants, so serving costs nothing over in-process inference.

Run on the TPU (no JAX_PLATFORMS override). Writes export_bench.json.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cultionet_tpu.data.synthetic import create_batch
from cultionet_tpu.enums import AttentionTypes
from cultionet_tpu.export import export_state, load_predictor
from cultionet_tpu.models import CultioNet
from cultionet_tpu.train.optim import build_optimizer
from cultionet_tpu.train.step import (
    create_train_state,
    make_predict_step,
    strip_static,
)
from cultionet_tpu.utils.timing import best_of

BATCH = 32
OUT = Path(__file__).parent / "export_bench.json"


def main() -> None:
    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)
    batch = create_batch(
        num_channels=3, num_time=12, height=100, width=100,
        batch_size=BATCH, rng=rng,
    )
    model = CultioNet(
        in_time=12,
        hidden_channels=32,
        dropout=0.1,
        attention_weights=AttentionTypes.NATTEN,
        dilations=[1, 2],
    )
    state = create_train_state(
        model, build_optimizer("AdamW", 1e-3), batch, seed=0
    )
    precision = "bf16" if platform != "cpu" else "fp32"

    # int16 wire-format inputs (what a serving host would receive).
    x = rng.integers(0, 10000, size=(BATCH, 12, 100, 100, 3), dtype=np.int16)
    lat = np.full((BATCH,), 45.0, np.float32)
    lon = np.full((BATCH,), -120.0, np.float32)

    import tempfile

    bench_tmp = tempfile.mkdtemp(prefix="export_bench_")
    t0 = time.perf_counter()
    artifact = export_state(
        state,
        Path(bench_tmp) / "export_bench.cnx",
        in_time=12,
        in_channels=3,
        batch_size=BATCH,
        chip_size=100,
        precision=precision,
        platforms=[platform],
    )
    export_sec = time.perf_counter() - t0
    artifact_mb = artifact.stat().st_size / 1e6

    t0 = time.perf_counter()
    pred = load_predictor(artifact)
    out = pred(x, lat, lon)  # compile + run
    cold_sec = time.perf_counter() - t0
    # Device-resident inputs: measure the program, not the axon tunnel
    # (the in-process baseline's batch is device-resident too).
    xd, latd, lond = jax.device_put(x), jax.device_put(lat), jax.device_put(lon)
    served_sec = best_of(
        lambda: pred.call_on_device(xd, latd, lond),
        lambda o: float(np.asarray(o[0]).sum()),
        n_iters=20,
        repeats=3,
    )

    # In-process baseline on the same int16 batch.
    pstep = make_predict_step(precision=precision)
    int16_batch = strip_static(batch)
    for _ in range(3):
        outputs = pstep(state, int16_batch)
    float(np.asarray(outputs["distance"]).sum())
    inproc_sec = best_of(
        lambda: pstep(state, int16_batch),
        lambda o: float(np.asarray(o["distance"]).sum()),
        n_iters=20,
        repeats=3,
    )

    # Output parity (exported program == in-process program).
    direct = pstep(state, int16_batch.replace(x=x, lat=lat, lon=lon))
    max_abs = float(
        np.abs(np.asarray(direct["crop"]) - out["crop"]).max()
    )

    result = {
        "platform": platform,
        "precision": precision,
        "batch": BATCH,
        "artifact_mb": round(artifact_mb, 2),
        "export_sec": round(export_sec, 2),
        "cold_load_and_first_call_sec": round(cold_sec, 2),
        "served_ms_per_batch": round(served_sec * 1e3, 2),
        "served_chips_per_sec": round(BATCH / served_sec, 1),
        "inprocess_ms_per_batch": round(inproc_sec * 1e3, 2),
        "inprocess_chips_per_sec": round(BATCH / inproc_sec, 1),
        "crop_max_abs_diff": max_abs,
    }
    print(json.dumps(result, indent=2))
    OUT.write_text(json.dumps(result, indent=2) + "\n")


if __name__ == "__main__":
    main()

"""Offline chip-creation throughput (VERDICT r3 #2).

Times `cultionet_tpu create` over the 120 real-geometry USA grids
(tif/gpkg ingestion -> label math -> npz chips) serial vs process-pool,
into a THROWAWAY project (time_series_vars/user_train symlinked from
experiments/usa_project) so the training chips are never rewritten.

The reference parallelizes this with a joblib loky pool
(scripts/cultionet.py:512-529); this repo fans per-grid work over a
fork ProcessPoolExecutor (data/create.py). NOTE: this container is a
single-core host (nproc=1), so pool scaling cannot exceed 1x here —
the bench records serial-vs-pool parity on one core; scaling comes from
cores, and the pool/serial chip digests are pinned identical by
tests/test_create_predict.py + tests/test_cli.py.

Usage: python - [--workers 1 4] [--out FILE] < experiments/create_bench.py
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent if "__file__" in dict(globals()) else Path.cwd()
USA = REPO / "experiments" / "usa_project"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workers", type=int, nargs="+", default=[1, 4])
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--out", type=str, default="")
    p.add_argument("--workdir", type=str, default="/tmp/create_bench")
    args = p.parse_args()

    work = Path(args.workdir)
    if work.exists():
        shutil.rmtree(work)
    proj = work / "project"
    proj.mkdir(parents=True)
    (proj / "time_series_vars").symlink_to(USA / "time_series_vars")
    (proj / "user_train").symlink_to(USA / "user_train")

    n_grids = len(list((USA / "user_train").glob("*.gpkg")))
    results = dict(n_grids=n_grids, nproc=os.cpu_count(), runs=[])
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")

    for workers in args.workers:
        best = None
        for _ in range(args.repeats):
            shutil.rmtree(proj / "data", ignore_errors=True)
            t0 = time.perf_counter()
            r = subprocess.run(
                [
                    sys.executable, "-m", "cultionet_tpu", "create",
                    "-p", str(proj),
                    "--start-date", "2021-01-01",
                    "--end-date", "2022-01-01",
                    "--max-crop-class", "1",
                    "--num-workers", str(workers),
                    "--overwrite",
                ],
                cwd=REPO,
                env=env,
                capture_output=True,
                text=True,
            )
            wall = time.perf_counter() - t0
            assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
            n_out = len(list((proj / "data/train/processed").glob("*.npz")))
            assert n_out == n_grids, (n_out, n_grids)
            best = wall if best is None else min(best, wall)
        results["runs"].append(
            dict(
                num_workers=workers,
                wall_s=round(best, 2),
                grids_per_min=round(n_grids / best * 60.0, 1),
            )
        )
        print(json.dumps(results["runs"][-1]))

    shutil.rmtree(work)
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()

"""True multi-process distributed test (VERDICT r3 #6; SURVEY §7.6).

Spawns TWO separate python processes, each owning 2 virtual CPU devices,
joined through ``jax.distributed.initialize`` into one 4-device global
mesh — the actual multi-host topology (the reference's Lightning DDP
rank-spawn analogue, model.py:179-185), not the single-process 8-device
simulation the rest of the suite uses. Exercises:

- ``initialize_distributed`` + ``topology_summary`` (2 processes x 2
  local devices -> 4 global);
- ``assert_same_across_hosts`` (the steps_per_epoch lockstep guard);
- ``global_batch_from_local``: each process contributes its own 2-sample
  slice of a global 4-sample batch via
  ``jax.make_array_from_process_local_data``;
- one sharded train step over the global mesh — the GSPMD gradient
  all-reduce spans processes, so both must report the SAME loss;
- per-process chipstore cache naming over a shared filesystem (the
  ADVICE r2 multi-host race fix): two processes packing the same dataset
  must land on distinct ``-p{proc}-`` store files.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO_ROOT = Path(__file__).resolve().parent.parent

WORKER = """
import json, os, sys

pid = int(sys.argv[1])
port = sys.argv[2]
tmpdir = sys.argv[3]

import jax

jax.config.update("jax_platforms", "cpu")

from cultionet_tpu.parallel.distributed import (
    assert_same_across_hosts,
    initialize_distributed,
    topology_summary,
)

initialize_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
topo = topology_summary()
assert topo["process_count"] == 2, topo
assert topo["global_device_count"] == 4, topo
assert topo["local_device_count"] == 2, topo
assert_same_across_hosts(7, "lockstep-probe")

import numpy as np

from cultionet_tpu.data.chipstore import build_chipstore_from_dataset
from cultionet_tpu.data.datasets import ChipDataset
from cultionet_tpu.data.synthetic import create_batch
from cultionet_tpu.models import CultioNet
from cultionet_tpu.parallel import (
    batch_sharding,
    create_mesh,
    make_sharded_train_step,
    replicated,
)
from cultionet_tpu.parallel.mesh import global_batch_from_local
from cultionet_tpu.train.optim import build_optimizer
from cultionet_tpu.train.step import create_train_state

mesh = create_mesh()  # all 4 GLOBAL devices
# Each process loads a DIFFERENT local slice (seeded by process id) —
# the multi-host input-assembly contract: 2 local samples -> global 4.
local = create_batch(
    num_channels=2,
    num_time=5,
    height=16,
    width=16,
    batch_size=2,
    rng=np.random.default_rng(pid),
)
global_batch = global_batch_from_local(local, batch_sharding(mesh))
leaf = global_batch.x
assert leaf.shape[0] == 4, leaf.shape  # global batch spans both processes

model = CultioNet(
    in_time=5, hidden_channels=4, dropout=0.0,
    attention_weights=None, dilations=[1],
)
state = create_train_state(
    model, build_optimizer(optimizer="AdamW", learning_rate=1e-3),
    local, seed=0,
)  # same seed + shapes -> identical initial params on both processes
state = jax.device_put(state, replicated(mesh))
step = make_sharded_train_step(mesh, precision="fp32")
state, logs = step(state, global_batch, jax.random.PRNGKey(0))
loss = float(np.asarray(jax.device_get(logs["loss"].addressable_data(0))))

ds = ChipDataset(tmpdir)
store = build_chipstore_from_dataset(
    ds, os.path.join(tmpdir, "cache", "train.store")
)
print("RESULT " + json.dumps({"pid": pid, "loss": loss, "store": str(store)}))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step(tmp_path):
    from cultionet_tpu.data.synthetic import create_batch

    processed = tmp_path / "processed"
    rng = np.random.default_rng(0)
    for i in range(3):
        create_batch(
            num_channels=2, num_time=5, height=16, width=16, rng=rng
        ).to_file(processed / f"data_{i:03d}.npz")

    port = _free_port()
    env = dict(
        # A clean environment (not os.environ): the parent pytest process
        # pins JAX_PLATFORMS/XLA_FLAGS for its own 8-device mesh, and the
        # axon sitecustomize must be disarmed (PALLAS_AXON_POOL_IPS) so
        # the workers genuinely run CPU-only.
        PATH="/usr/bin:/bin:/usr/local/bin",
        HOME="/tmp",
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), str(port), str(tmp_path)],
            cwd=REPO_ROOT,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    results = {}
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line in:\n{out}"
        r = json.loads(lines[-1][len("RESULT "):])
        results[r["pid"]] = r

    assert set(results) == {0, 1}
    # GSPMD all-reduced the gradients/metrics across processes: both see
    # the identical global loss, and it is finite.
    assert np.isfinite(results[0]["loss"])
    assert results[0]["loss"] == results[1]["loss"]
    # ADVICE r2 multi-host fix: per-process store names, no shared-file race.
    store0, store1 = Path(results[0]["store"]), Path(results[1]["store"])
    assert store0 != store1
    assert "-p0-" in store0.name and "-p1-" in store1.name
    assert store0.exists() and store1.exists()

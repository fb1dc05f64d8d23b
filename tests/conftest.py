"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual XLA devices so the pjit/shard_map
data-parallel paths are exercised without TPU hardware (the pattern the
reference lacks entirely — it has no distributed tests, see
/root/reference/tests/ and SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment may preset JAX_PLATFORMS (e.g. a TPU tunnel) and a
# sitecustomize may import jax before this conftest runs — force CPU at the
# config level too.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles hundreds of XLA CPU
# programs, many identical across tests and across runs (same model
# shapes). A warm cache turns the fast tier from ~27 min into single
# digits on this 1-core host; CI restores it via actions/cache.
try:
    from pathlib import Path

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_test_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(100)

"""Profiling: jax.profiler traces + block-until-ready timing harness.

TPU-native replacement for the reference's Lightning profiler pass-through
(model.py:102,185) and torch.compile instrumentation (SURVEY.md §5): xplane
trace dumps viewable in TensorBoard/XProf, plus a simple steady-state step
timer that excludes compilation.
"""

import contextlib
import time
import typing as T
from pathlib import Path

import jax


@contextlib.contextmanager
def profile_trace(log_dir: T.Union[str, Path]):
    """Capture a jax.profiler trace (xplane) into ``log_dir``."""
    log_dir = str(log_dir)
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_profiler_server(port: int = 9999) -> None:
    """Live profiling endpoint for xprof capture."""
    jax.profiler.start_server(port)


def time_step(
    fn: T.Callable,
    *args,
    warmup: int = 3,
    iters: int = 20,
    repeats: int = 3,
) -> float:
    """Best-of-``repeats`` mean step latency (seconds), post-compilation."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)

    best = float("inf")
    for _ in range(repeats):
        start = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - start) / iters)
    return best

"""Shared best-of-N timing loop for benchmarks.

Timing discipline on the tunneled 'axon' TPU platform (BASELINE.md):
``jax.block_until_ready`` does not wait for execution, so callers must
synchronize by host readback — the ``sync`` callable is handed the last
iteration's representative output and must block until it is real host
data (e.g. ``lambda v: float(np.asarray(v))``).

Used by bench.py and experiments/predict_rate.py so the two cannot drift
(ADVICE r3).
"""

import time
import typing as T

__all__ = ["best_of"]


def best_of(
    body: T.Callable[[], T.Any],
    sync: T.Callable[[T.Any], None],
    n_iters: int = 30,
    repeats: int = 3,
) -> float:
    """Best-of-``repeats`` mean seconds per call of ``body``.

    Each repeat runs ``body`` ``n_iters`` times back-to-back (letting the
    device pipeline dispatches) and then calls ``sync`` on the final
    return value to drain execution before reading the clock. The caller
    is responsible for warmup/compile before invoking this.
    """
    best = float("inf")
    for _ in range(repeats):
        start = time.perf_counter()
        out = None
        for _ in range(n_iters):
            out = body()
        sync(out)
        best = min(best, time.perf_counter() - start)
    return best / n_iters

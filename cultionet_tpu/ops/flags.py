"""Runtime feature flags for kernel dispatch."""

import os
import typing as T

_USE_PALLAS_NATTEN: T.Optional[bool] = None


def set_pallas_natten(enabled: T.Optional[bool]) -> None:
    """Force the Pallas neighborhood-attention kernel on/off
    (None = auto: env CULTIONET_TPU_PALLAS_NATTEN, else TPU-platform default)."""
    global _USE_PALLAS_NATTEN
    _USE_PALLAS_NATTEN = enabled


def pallas_natten_enabled() -> bool:
    if _USE_PALLAS_NATTEN is not None:
        return _USE_PALLAS_NATTEN
    env = os.environ.get("CULTIONET_TPU_PALLAS_NATTEN")
    if env is not None:
        return env not in ("0", "false", "False")
    # Default off: the Mosaic kernels are a measured opt-in (several minutes
    # of compile across the model's NA configs); enable with
    # CULTIONET_TPU_PALLAS_NATTEN=1 or set_pallas_natten(True).
    return False

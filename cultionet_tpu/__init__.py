"""cultionet-tpu: a TPU-native framework for crop-field boundary segmentation
from satellite image time series.

A ground-up JAX/Flax/Pallas re-design with the capabilities of the reference
PyTorch library (jgrss/cultionet v2.0.0b): the TowerUNet model family with
dilated neighborhood attention, multi-task (distance / edge / crop) training,
offline chip engineering, normalization statistics, augmentation, and
large-scene sliding-window inference — all engineered for the TPU compilation
model (static shapes, NHWC layout, pjit/shard_map data parallelism, Pallas
kernels on the hot path).
"""

__version__ = "0.1.0"

from . import enums  # noqa: F401
from . import losses  # noqa: F401


def __getattr__(name):
    # Lazy top-level API (mirrors the reference package surface,
    # src/cultionet/__init__.py) without importing the full stack at
    # package-import time.
    if name in ("fit", "fit_transfer", "load_model", "predict",
                "predict_lightning"):
        from . import model

        return getattr(model, name)
    if name == "CultionetParams":
        from .config import CultionetParams

        return CultionetParams
    raise AttributeError(name)

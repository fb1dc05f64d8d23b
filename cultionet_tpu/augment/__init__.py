from . import functional
from .augmenters import (
    AUGMENTATION_NAMES,
    Augmenters,
    label_segments,
)

__all__ = ["AUGMENTATION_NAMES", "Augmenters", "functional", "label_segments"]

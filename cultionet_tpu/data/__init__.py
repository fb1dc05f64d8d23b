from .batch import Batch, collate
from .constant import SCALE_FACTOR
from .datasets import ChipDataset
from .loader import ChipLoader
from .synthetic import create_batch

__all__ = [
    "Batch",
    "ChipDataset",
    "ChipLoader",
    "SCALE_FACTOR",
    "collate",
    "create_batch",
]

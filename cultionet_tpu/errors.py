"""Framework errors (reference errors/__init__.py:1-17)."""


class TensorShapeError(Exception):
    """Raised when chip tensors have unexpected shapes."""


class TopologyClipError(Exception):
    """Raised when vector training data cannot be clipped to a grid."""

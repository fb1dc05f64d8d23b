"""int16-packing scale for x, bdist, and output rasters
(reference data/constant.py:1)."""

SCALE_FACTOR = 10_000.0

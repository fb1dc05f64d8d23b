"""Raster label engineering: polygon burn-in, edge extraction, boundary
distance transforms.

Capability parity with the reference's data/utils.py:113-327 using only
numpy + cv2 + scipy (no rasterio/geopandas): polygon rasterization is
cv2.fillPoly under an affine world->pixel transform, the Euclidean distance
transform and Sobel orientation are cv2, per-segment normalization uses
scipy.ndimage labeled statistics.
"""

import typing as T

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from scipy import ndimage


def _roll_trim(arr_pad: np.ndarray, shift: int, axis: int) -> np.ndarray:
    return np.roll(arr_pad, shift, axis=axis)[1:-1, 1:-1]


def _neighbor_count(
    array: np.ndarray, predicate: T.Callable[[np.ndarray], np.ndarray]
) -> np.ndarray:
    """Count of the 4 rook neighbors satisfying ``predicate``
    (edge-padded, reference data/utils.py:122-156)."""
    array_pad = np.pad(array, 1, mode="edge")
    count = np.zeros(array.shape, dtype=np.uint8)
    for shift, axis in ((1, 0), (-1, 0), (1, 1), (-1, 1)):
        count += predicate(_roll_trim(array_pad, shift, axis)).astype(np.uint8)
    return count


def get_crop_count(array: np.ndarray, edge_class: int) -> np.ndarray:
    return _neighbor_count(array, lambda r: (r > 0) & (r != edge_class))


def get_edge_count(array: np.ndarray, edge_class: int) -> np.ndarray:
    return _neighbor_count(array, lambda r: r == edge_class)


def get_non_count(array: np.ndarray) -> np.ndarray:
    return _neighbor_count(array, lambda r: r == 0)


def cleanup_edges(
    array: np.ndarray, original: np.ndarray, edge_class: int
) -> np.ndarray:
    """Edge cleanup rules (reference data/utils.py:159-200): fill edge gaps,
    remove crop pixels touching non-crop across an edge, restore all-non-crop
    pixels, drop isolated crop clumps."""
    original_zero = get_non_count(original)

    array = np.where(
        (array == 0)
        & (get_crop_count(array, edge_class) > 0)
        & (get_edge_count(array, edge_class) > 0),
        edge_class,
        array,
    )
    array = np.where(
        (array > 0)
        & (array != edge_class)
        & (get_non_count(array) > 0)
        & (get_edge_count(array, edge_class) > 0),
        0,
        array,
    )
    array = np.where(original_zero == 4, 0, array)
    array = np.where(
        (array > 0)
        & (array != edge_class)
        & (get_crop_count(array, edge_class) <= 1)
        & (get_edge_count(array, edge_class) <= 1),
        0,
        array,
    )
    return array


def edge_gradient(array: np.ndarray) -> np.ndarray:
    """Morphological gradient of crop fields (reference data/utils.py:262-269)."""
    se = np.ones((2, 2), dtype="uint8")
    return np.uint8(
        cv2.morphologyEx(np.uint8(array), cv2.MORPH_GRADIENT, se) > 0
    )


def create_boundary_distances(
    labels_array: np.ndarray, train_type: str, cell_res: float
) -> T.Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Distance-from-boundary + Sobel orientation
    (reference data/utils.py:203-229)."""
    if train_type.lower() == "polygon":
        mask = np.uint8(labels_array)
    else:
        mask = np.uint8(1 - labels_array)

    segments = ndimage.label(mask)[0]

    bdist = cv2.distanceTransform(mask, cv2.DIST_L2, 3)
    bdist *= cell_res

    padded = np.pad(bdist, 5, mode="edge")
    grad_x = cv2.Sobel(padded, cv2.CV_32F, dx=1, dy=0, ksize=5)
    grad_y = cv2.Sobel(padded, cv2.CV_32F, dx=0, dy=1, ksize=5)
    ori = cv2.phase(grad_x, grad_y, angleInDegrees=False)
    ori = ori[5:-5, 5:-5] / np.deg2rad(360)
    ori[labels_array == 0] = 0

    return mask, segments, bdist, ori


def normalize_boundary_distances(
    labels_array: np.ndarray,
    train_type: str,
    cell_res: float,
    normalize: bool = True,
) -> T.Tuple[np.ndarray, np.ndarray]:
    """Per-segment max normalization of boundary distances
    (reference data/utils.py:232-259); regionprops replaced by
    scipy.ndimage.maximum over labeled segments."""
    _, segments, bdist, ori = create_boundary_distances(
        labels_array, train_type, cell_res
    )
    dist_max = 1e9
    if normalize:
        dist_max = 1.0
        num_segments = int(segments.max())
        if num_segments > 0:
            seg_max = ndimage.maximum(
                bdist, labels=segments, index=np.arange(1, num_segments + 1)
            )
            seg_max = np.concatenate(([1.0], np.asarray(seg_max)))
            divisor = seg_max[segments]
            with np.errstate(divide="ignore", invalid="ignore"):
                bdist = np.where(segments > 0, bdist / divisor, bdist)

    bdist = np.nan_to_num(
        bdist.clip(0, dist_max), nan=1.0, neginf=1.0, posinf=1.0
    )
    ori = np.nan_to_num(ori.clip(0, 1), nan=1.0, neginf=1.0, posinf=1.0)
    return bdist, ori


def fillz(x: np.ndarray) -> np.ndarray:
    """Fill zeros with the 3x3 focal mean over (H, W) of a (T, C, H, W) or
    (..., H, W) stack (reference data/utils.py:322-327)."""
    size = (1,) * (x.ndim - 2) + (3, 3)
    focal_mean = ndimage.uniform_filter(x, size=size, mode="reflect")
    return np.where(x == 0, focal_mean, x)


def merge_distances(
    foreground_distances: np.ndarray,
    crop_mask: np.ndarray,
    edge_mask: np.ndarray,
    inverse: bool = True,
    beta: float = 10.0,
) -> np.ndarray:
    """Merge foreground and background distance transforms
    (reference nn/functional.py:8-69); arrays are (H, W)."""
    background_mask = (crop_mask == 0) & (edge_mask == 0)
    bdist = cv2.distanceTransform(
        background_mask.astype("uint8"), cv2.DIST_L2, 3
    )
    max_val = bdist.max()
    if max_val > 0:
        bdist = bdist / max_val
    if inverse:
        bdist = 1.0 - bdist
        foreground = 1.0 - foreground_distances
    else:
        foreground = foreground_distances
    if beta != 1:
        bdist = np.nan_to_num(bdist**beta)
        foreground = np.nan_to_num(foreground**beta)

    distance = np.where(background_mask, bdist, foreground).astype("float32")
    distance[edge_mask == 1] = 1.0 if inverse else 0.0
    return distance


# ---------------------------------------------------------------------------
# Polygon rasterization (rasterio.features.rasterize replacement)
# ---------------------------------------------------------------------------


def world_to_pixel(
    coords: np.ndarray,
    bounds: T.Tuple[float, float, float, float],
    shape: T.Tuple[int, int],
) -> np.ndarray:
    """Map (N, 2) world (x, y) coords to fractional pixel (col, row)."""
    left, bottom, right, top = bounds
    nrows, ncols = shape
    cell_x = (right - left) / ncols
    cell_y = (top - bottom) / nrows
    cols = (coords[:, 0] - left) / cell_x
    rows = (top - coords[:, 1]) / cell_y
    return np.stack([cols, rows], axis=-1)


def polygons_to_array(
    shapes: T.Sequence[T.Tuple[T.Any, int]],
    bounds: T.Tuple[float, float, float, float],
    out_shape: T.Tuple[int, int],
    fill_value: int = 0,
    dtype: str = "uint8",
    all_touched: bool = True,
) -> np.ndarray:
    """Burn polygons into a raster (reference data/utils.py:272-319).

    ``shapes`` is a sequence of (polygon, value) where polygon is either an
    (N, 2) array of exterior-ring world coordinates or a dict
    {"exterior": (N, 2), "holes": [(M, 2), ...]}.

    ``all_touched`` (reference rasterize flag, default True there and
    here): additionally burn every pixel the polygon OUTLINE touches, not
    just pixels whose center falls inside — approximated by drawing the
    ring with a 1-px polyline on top of the fill.
    """
    if dtype == "uint8" and shapes:
        if max(int(v) for _, v in shapes) > 255:
            dtype = "int32"
    out = np.full(out_shape, fill_value, dtype=dtype)

    for polygon, value in shapes:
        if isinstance(polygon, dict):
            exterior = np.asarray(polygon["exterior"], dtype=np.float64)
            holes = [
                np.asarray(h, dtype=np.float64)
                for h in polygon.get("holes", [])
            ]
        else:
            exterior = np.asarray(polygon, dtype=np.float64)
            holes = []

        mask = np.zeros(out_shape, dtype=np.uint8)
        ext_px = world_to_pixel(exterior, bounds, out_shape)
        ext_i32 = np.round(ext_px).astype(np.int32)
        cv2.fillPoly(mask, [ext_i32], 1)
        if all_touched:
            cv2.polylines(
                mask, [ext_i32], isClosed=True, color=1, thickness=1
            )
        for hole in holes:
            hole_px = world_to_pixel(hole, bounds, out_shape)
            cv2.fillPoly(mask, [np.round(hole_px).astype(np.int32)], 0)
        out = np.where(mask > 0, np.asarray(value, dtype=dtype), out)

    return out

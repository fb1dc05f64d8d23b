"""Pure-python vector (GeoJSON) polygon reading — no GDAL/geopandas.

The reference clips training polygons per grid from gpkg files via
geopandas/GEOS (scripts/cultionet.py:266-299, data/create.py:411-530). Here
GeoJSON FeatureCollections are parsed directly and "clipping" is a bbox
intersection filter: the polygon burn-in (data/label_math.py) rasterizes
against the region grid, which bounds the geometry exactly — polygons
partially outside the grid contribute only their in-grid pixels, matching
the reference's clip-then-rasterize result for label math.
"""

import json
import typing as T
from pathlib import Path

import numpy as np

Ring = np.ndarray  # (N, 2) exterior-ring coordinates
Shapes = T.List[T.Tuple[Ring, int]]

_CLASS_KEYS = ("class", "crop_class", "class_value", "value", "DN", "id")


def _feature_class(properties: T.Optional[dict]) -> int:
    if properties:
        for key in _CLASS_KEYS:
            if key in properties and properties[key] is not None:
                try:
                    return int(properties[key])
                except (TypeError, ValueError):
                    continue
    return 1


def _rings_from_geometry(geometry: dict) -> T.List[Ring]:
    """Exterior rings of Polygon / MultiPolygon geometries (holes are not
    represented by the reference's label math either — rasterized labels
    use filled exteriors, data/utils.py:272)."""
    gtype = geometry.get("type")
    coords = geometry.get("coordinates")
    if gtype == "Polygon":
        return [np.asarray(coords[0], dtype="float64")]
    if gtype == "MultiPolygon":
        return [np.asarray(poly[0], dtype="float64") for poly in coords]
    if gtype == "GeometryCollection":
        rings: T.List[Ring] = []
        for geom in geometry.get("geometries", []):
            rings.extend(_rings_from_geometry(geom))
        return rings
    return []


def parse_geojson(source: T.Union[str, Path, dict]) -> Shapes:
    """(ring, class_value) pairs from a GeoJSON FeatureCollection /
    Feature / bare geometry."""
    if isinstance(source, (str, Path)):
        source = json.loads(Path(source).read_text())

    gtype = source.get("type")
    if gtype == "FeatureCollection":
        shapes: Shapes = []
        for feature in source.get("features", []):
            value = _feature_class(feature.get("properties"))
            for ring in _rings_from_geometry(feature.get("geometry") or {}):
                shapes.append((ring, value))
        return shapes
    if gtype == "Feature":
        value = _feature_class(source.get("properties"))
        return [
            (ring, value)
            for ring in _rings_from_geometry(source.get("geometry") or {})
        ]
    return [(ring, 1) for ring in _rings_from_geometry(source)]


def filter_by_bounds(
    shapes: Shapes, bounds: T.Tuple[float, float, float, float]
) -> Shapes:
    """Keep shapes whose bbox intersects (left, bottom, right, top) — the
    per-grid polygon clip (reference gpd.clip, scripts/cultionet.py:266)."""
    left, bottom, right, top = bounds
    kept: Shapes = []
    for ring, value in shapes:
        xs, ys = ring[:, 0], ring[:, 1]
        if (
            xs.min() <= right
            and xs.max() >= left
            and ys.min() <= top
            and ys.max() >= bottom
        ):
            kept.append((ring, value))
    return kept


def read_region_polygons(
    region_path: T.Union[str, Path],
    bounds: T.Optional[T.Tuple[float, float, float, float]] = None,
    project_path: T.Optional[T.Union[str, Path]] = None,
) -> T.Optional[Shapes]:
    """Polygons for one region, first match wins:

    1. ``<region>/polygons.json`` — [[ring, class], ...] pairs (native)
    2. ``<region>/polygons.geojson`` — GeoJSON FeatureCollection
    3. ``<project>/polygons.geojson`` — project-wide GeoJSON, bbox-clipped
       to the region bounds (the reference's per-grid clip of the shared
       training-polygon layer)
    """
    region_path = Path(region_path)
    native = region_path / "polygons.json"
    if native.is_file():
        raw = json.loads(native.read_text())
        return [
            (np.asarray(ring, dtype="float64"), int(value))
            for ring, value in raw
        ]
    regional = region_path / "polygons.geojson"
    if regional.is_file():
        return parse_geojson(regional)
    if project_path is not None:
        shared = Path(project_path) / "polygons.geojson"
        if shared.is_file():
            shapes = parse_geojson(shared)
            if bounds is not None:
                shapes = filter_by_bounds(shapes, bounds)
            return shapes
    return None

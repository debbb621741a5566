"""GeoJSON serialization (reference X14, vector.py:25-33,120-149).

Byte-stable by construction: compact separators, sorted property keys,
coordinates snapped to the 0.01 precision grid and formatted with a fixed
%.2f — the reference's manifest-content parity requirement ("byte-identical
output") pinned without orjson. `geometry`, `extent_geometry`, `burn_val`
are dropped from feature properties (reference vector.py:70,101 — F8).
"""

from __future__ import annotations

import json

import numpy as np

from geotiff_tiler_spark.operators import strtree as st

DROP_PROPS = ("geometry", "extent_geometry", "burn_val")


def _ring_coords(ring: np.ndarray) -> list[list[float]]:
    snapped = st.snap_coords(ring, 0.01)
    return [[round(float(x), 2), round(float(y), 2)] for x, y in snapped]


def feature_json(wkb: bytes, props: dict, is_truncated: bool | None = None) -> str:
    """One GeoJSON Feature string (compact, sorted keys)."""
    polys = st.parse_wkb(wkb)
    if len(polys) == 1:
        geom = {"type": "Polygon", "coordinates": [_ring_coords(r) for r in polys[0]]}
    else:
        geom = {
            "type": "MultiPolygon",
            "coordinates": [[_ring_coords(r) for r in rings] for rings in polys],
        }
    properties = {k: v for k, v in props.items() if k not in DROP_PROPS}
    if is_truncated is not None:
        properties["is_truncated"] = bool(is_truncated)
    feat = {"type": "Feature", "geometry": geom, "properties": properties}
    return json.dumps(feat, separators=(",", ":"), sort_keys=True)


def feature_collection_json(features: list[str], epsg: int = 4326) -> str:
    """FeatureCollection with the reference's CRS tag format
    (vector.py:129: urn:ogc:def:crs:EPSG::{code})."""
    crs = {"type": "name", "properties": {"name": f"urn:ogc:def:crs:EPSG::{epsg}"}}
    return (
        '{"crs":' + json.dumps(crs, separators=(",", ":"), sort_keys=True)
        + ',"features":[' + ",".join(features) + '],"type":"FeatureCollection"}'
    )

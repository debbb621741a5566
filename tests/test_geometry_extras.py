"""Polygon clipping (J4/J7), GeoJSON (X14), reprojection (X1/X2),
attr-field resolution (J8), read-back (S9/S10)."""

import json

import numpy as np
import pytest

from geotiff_tiler_spark.functions import geojson
from geotiff_tiler_spark.operators import reproject, strtree as st
from geotiff_tiler_spark.sources.checks import resolve_attr_field


def test_clip_ring_matches_area_oracle():
    # clip a triangle by a box; verify area via a dense point-sampling oracle
    tri = np.array([[0.0, 0.0], [10.0, 0.0], [5.0, 10.0], [0.0, 0.0]])
    clipped = st.clip_ring_to_box(tri, 2.0, 1.0, 8.0, 6.0)
    assert len(clipped) >= 4
    got_area = st.ring_area(clipped)
    xs, ys = np.meshgrid(np.linspace(0, 10, 401), np.linspace(0, 10, 401))
    inside_tri = st.points_in_rings(xs.ravel(), ys.ravel(), [tri])
    in_box = (
        (xs.ravel() >= 2) & (xs.ravel() <= 8) & (ys.ravel() >= 1) & (ys.ravel() <= 6)
    )
    mc_area = (inside_tri & in_box).mean() * 100.0
    assert abs(got_area - mc_area) < 0.5


def test_clip_wkb_truncation_flag():
    sq = np.array([[1.0, 1.0], [4.0, 1.0], [4.0, 4.0], [1.0, 4.0]])
    wkb = st.wkb_polygon([sq])
    # fully inside -> untouched, not truncated
    out, trunc = st.clip_wkb_to_box(wkb, 0, 0, 10, 10)
    assert not trunc and out is not None
    assert st.parse_wkb(out)[0][0].shape == st.parse_wkb(wkb)[0][0].shape
    # straddling -> truncated, clipped geometry
    out2, trunc2 = st.clip_wkb_to_box(wkb, 0, 0, 2.5, 10)
    assert trunc2 and out2 is not None
    bb = st.polygon_bbox(st.parse_wkb(out2))
    assert bb[2] <= 2.5 + 1e-9
    # disjoint -> dropped (reference: empty intersection removed)
    out3, trunc3 = st.clip_wkb_to_box(wkb, 8, 8, 9, 9)
    assert out3 is None and trunc3


def test_repair_and_explode():
    good = np.array([[0.0, 0.0], [2.0, 0.0], [1.0, 2.0]])
    degenerate = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])  # zero area
    multi = st.wkb_multipolygon([[good], [degenerate]])
    parts = st.explode_multipolygon(multi)
    assert len(parts) == 1  # degenerate dropped (F2/X7)
    assert st.parse_wkb(parts[0])[0][0].shape[0] == 4


def test_geojson_byte_stable_and_prop_projection():
    tri = np.array([[0.004, 0.0], [2.0, 0.0], [1.0, 2.006]])
    wkb = st.wkb_polygon([tri])
    f1 = geojson.feature_json(wkb, {"class": "road", "burn_val": 3, "geometry": "x"}, True)
    f2 = geojson.feature_json(wkb, {"burn_val": 3, "geometry": "x", "class": "road"}, True)
    assert f1 == f2  # key order independent -> byte-stable
    obj = json.loads(f1)
    assert obj["properties"] == {"class": "road", "is_truncated": True}
    # snapping to 0.01 (reference vector.py:119)
    assert obj["geometry"]["coordinates"][0][0] == [0.0, 0.0]
    assert obj["geometry"]["coordinates"][0][2] == [1.0, 2.01]
    fc = geojson.feature_collection_json([f1], epsg=32618)
    assert "urn:ogc:def:crs:EPSG::32618" in fc
    json.loads(fc)


def test_reproject_roundtrip_and_known_values():
    lon = np.array([0.0, -73.98, 151.21])
    lat = np.array([0.0, 40.75, -33.87])
    x, y = reproject.reproject_points(lon, lat, "EPSG:4326", "EPSG:3857")
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    # known value: lon 180 -> pi*R
    x180, _ = reproject.lonlat_to_mercator(np.array([180.0]), np.array([0.0]))
    assert abs(x180[0] - np.pi * reproject.R) < 1e-3
    lon2, lat2 = reproject.reproject_points(x, y, "EPSG:3857", "EPSG:4326")
    assert np.allclose(lon2, lon, atol=1e-9) and np.allclose(lat2, lat, atol=1e-9)
    with pytest.raises(ValueError):
        reproject.reproject_points(lon, lat, "EPSG:4326", "EPSG:9999")


def test_reproject_raster_nearest_identity_and_fill():
    src = np.arange(12, dtype=np.uint8).reshape(3, 4)
    # identity CRS, same grid -> identical
    out = reproject.reproject_raster_nearest(
        src, (0.0, 1.0, 0.0, 1.0), (3, 4), (0.0, 1.0, 0.0, 1.0), "EPSG:4326", "EPSG:4326"
    )
    assert (out == src).all()
    # destination extends past source -> 255 fill (reference io.py:704-706)
    out2 = reproject.reproject_raster_nearest(
        src, (0.0, 1.0, 0.0, 1.0), (3, 6), (0.0, 1.0, 0.0, 1.0), "EPSG:4326", "EPSG:4326"
    )
    assert (out2[:, :4] == src).all() and (out2[:, 4:] == 255).all()
    # cross-CRS roundtrip keeps values (nearest-neighbor)
    merc = reproject.reproject_raster_nearest(
        src,
        (0.0, 1.0, 0.0, 1.0),
        (3, 4),
        (0.0, 111319.49079327358, 0.0, 110579.0),
        "EPSG:4326",
        "EPSG:3857",
    )
    assert merc.shape == (3, 4) and (merc != 255).any()


def test_resolve_attr_field():
    assert resolve_attr_field(["a", "class", "b"], ["klass", "class"]) == "class"
    with pytest.raises(ValueError):
        resolve_attr_field(["a"], ["class"])
    with pytest.raises(ValueError):
        resolve_attr_field(["class", "klass"], ["class", "klass"])


def test_readback_partition_pruned(spark, docs, tmp_path_factory):
    from geotiff_tiler_spark.operators.tiling import TilingParams
    from geotiff_tiler_spark.plans.pipeline import create_tiles
    from geotiff_tiler_spark.sources import readers

    base = str(tmp_path_factory.mktemp("readback"))
    p = TilingParams(label_threshold=None)
    create_tiles(spark, docs, p, f"{base}/out", f"{base}/mf")
    trn = readers.read_tiles(spark, f"{base}/out", split="trn")
    assert trn.count() > 0
    assert set(r.split for r in trn.select("split").distinct().collect()) == {"trn"}
    sample = readers.sample_tiles(spark, f"{base}/out", f"{base}/mf", max_rows=5)
    assert 0 < sample.count() <= 5
    idx_missing = readers.sample_tiles(
        spark, f"{base}/out", f"{base}/mf", image_id=-1
    )
    assert idx_missing.count() == 0


def test_export_tile_vectors(spark, docs):
    import json as _json

    from geotiff_tiler_spark.operators import strtree as _st, tiling
    from geotiff_tiler_spark.operators.tiling import TilingParams
    from geotiff_tiler_spark.plans.vector_export import export_tile_vectors
    from geotiff_tiler_spark.sources.labels import label_polygons

    p = TilingParams(label_threshold=None)
    pts = tiling.doc_points(docs, p)
    tiles = tiling.filter_patches(tiling.full_tile_grid(pts, p), p).filter("keep")
    polys = label_polygons(spark, n=60)
    out = export_tile_vectors(tiles, polys, p).collect()
    assert out
    n = 1 << p.image_res
    cw, ch = 360.0 / n, 180.0 / n
    ax, ay = cw / p.width, ch / p.height
    from geotiff_tiler_spark.functions import geo as _geo

    for r in out[:50]:
        obj = _json.loads(r.geojson)
        assert obj["type"] == "Feature"
        assert obj["properties"]["is_truncated"] == r.is_truncated
        # geometry must lie within the tile's geo box (+snap tolerance)
        coords = obj["geometry"]["coordinates"]
        rings = coords if obj["geometry"]["type"] == "Polygon" else [c for p_ in coords for c in p_]
        ix = (r.image_id % (1 << 54)) // (1 << 27)
        iy = r.image_id % (1 << 27)
        x0 = ix * cw - 180.0 + r.tile_x * ax
        y0 = iy * ch - 90.0 + r.tile_y * ay
        x1, y1 = x0 + p.patch_w * ax, y0 + p.patch_h * ay
        for ring in rings:
            for x, y in ring:
                assert x0 - 0.011 <= x <= x1 + 0.011
                assert y0 - 0.011 <= y <= y1 + 0.011
    # truncation sanity: at least one truncated and (usually) one untouched
    flags = {r.is_truncated for r in out}
    assert True in flags


# ---------------------------------------------------------------------------
# F2 full repair: make_valid for self-intersecting rings (VERDICT item 7)
# ---------------------------------------------------------------------------


def test_make_valid_bowtie_splits_into_lobes():
    """Reference io.py:89-104 semantics: a bowtie outer ring repairs into
    the MultiPolygon of its two lobes (shapely make_valid 'structure'
    result), preserving the even-odd covered area."""
    import numpy as np

    from geotiff_tiler_spark.operators import strtree as st

    bowtie = np.array([[0.0, 0.0], [4.0, 4.0], [4.0, 0.0], [0.0, 4.0]])
    assert not st.ring_is_simple(bowtie)
    repaired = st.make_valid_polygons([[bowtie]])
    assert len(repaired) == 2  # two lobes
    for rings in repaired:
        assert len(rings) == 1 and st.ring_is_simple(rings[0])
    total = sum(st.ring_area(rings[0]) for rings in repaired)
    assert abs(total - 8.0) < 1e-9  # even-odd area of the bowtie preserved
    # point membership agrees with even-odd ray casting on the raw ring
    xs = np.linspace(-1, 5, 40)
    ys = np.linspace(-1, 5, 40)
    gx, gy = np.meshgrid(xs, ys)
    gx, gy = gx.ravel(), gy.ravel()
    raw = st.points_in_rings(gx, gy, [np.vstack([bowtie, bowtie[:1]])])
    wkb = st.make_valid_wkb(st.wkb_polygon([bowtie]))
    fixed = st.points_in_wkb(gx, gy, wkb)
    assert (raw == fixed).all()


def test_make_valid_keeps_valid_geometry_unchanged():
    import numpy as np

    from geotiff_tiler_spark.operators import strtree as st

    sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    hole = np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]])
    out = st.make_valid_polygons([[sq, hole]])
    assert len(out) == 1 and len(out[0]) == 2
    assert abs(st.ring_area(out[0][0]) - 16.0) < 1e-9
    assert abs(st.ring_area(out[0][1]) - 4.0) < 1e-9


def test_make_valid_drops_degenerate():
    import numpy as np

    from geotiff_tiler_spark.operators import strtree as st

    line = np.array([[0.0, 0.0], [4.0, 0.0], [8.0, 0.0]])  # zero area
    assert st.make_valid_wkb(st.wkb_polygon([line])) is None


def test_repair_vector_layer_dataframe(spark):
    """The mapInPandas load-repair: bowtie rows are repaired (bbox
    recomputed), degenerate rows are dropped, valid rows untouched."""
    import numpy as np

    from geotiff_tiler_spark.operators import strtree as st
    from geotiff_tiler_spark.sources.labels import repair_vector_layer

    bowtie = st.wkb_polygon([np.array([[0.0, 0.0], [4.0, 4.0], [4.0, 0.0], [0.0, 4.0]])])
    sq = st.wkb_polygon([np.array([[10.0, 10.0], [12.0, 10.0], [12.0, 12.0], [10.0, 12.0]])])
    line = st.wkb_polygon([np.array([[0.0, 0.0], [4.0, 0.0], [8.0, 0.0]])])
    df = spark.createDataFrame(
        [
            (1, "road", bytearray(bowtie), -99.0, -99.0, 99.0, 99.0),
            (2, "fore", bytearray(sq), 10.0, 10.0, 12.0, 12.0),
            (3, "hydro", bytearray(line), 0.0, 0.0, 8.0, 0.0),
        ],
        "feature_id long, class string, wkb binary, xmin double, ymin double, xmax double, ymax double",
    )
    out = {r.feature_id: r for r in repair_vector_layer(df).collect()}
    assert set(out) == {1, 2}  # degenerate row 3 dropped
    # bbox recomputed from the repaired bowtie
    assert (out[1].xmin, out[1].ymin, out[1].xmax, out[1].ymax) == (0.0, 0.0, 4.0, 4.0)
    polys = st.parse_wkb(bytes(out[1].wkb))
    assert len(polys) == 2  # multipolygon of lobes
    assert bytes(out[2].wkb) == bytes(sq)  # valid geometry untouched

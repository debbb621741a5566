"""Unit tests: portable hash, geocoder, cell index vs pure-Python oracles."""

import math

from pyspark.sql import functions as F

from geotiff_tiler_spark.functions import geo
from geotiff_tiler_spark.functions.hashing import py_hash64, py_seeded_hash64


def py_geo(text: str):
    u = py_hash64(text, 1) % (1 << 32)
    v = py_hash64(text, 17) % (1 << 32)
    return u / 2**32 * 360.0 - 180.0, v / 2**32 * 180.0 - 90.0


def py_cell(lon, lat, res):
    n = 1 << res
    ix = min(max(math.floor((lon + 180.0) / 360.0 * n), 0), n - 1)
    iy = min(max(math.floor((lat + 90.0) / 180.0 * n), 0), n - 1)
    return res * (1 << 54) + ix * (1 << 27) + iy


def test_portable_hash_matches_python(spark):
    vals = ["", "a", "hello world", "äöü unicode"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    from geotiff_tiler_spark.functions.hashing import portable_hash64, seeded_hash64

    rows = df.select(
        "s", portable_hash64("s").alias("h"), seeded_hash64("s", 7).alias("hs")
    ).collect()
    for r in rows:
        assert r.h == py_hash64(r.s)
        assert r.hs == py_seeded_hash64(r.s, 7)


def test_geocode_matches_python(spark):
    texts = ["doc one", "another document", "x"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = df.select(
        "text", geo.geo_lon("text").alias("lon"), geo.geo_lat("text").alias("lat")
    ).collect()
    for r in rows:
        lon, lat = py_geo(r.text)
        assert abs(r.lon - lon) < 1e-12 and abs(r.lat - lat) < 1e-12
        assert -180 <= r.lon < 180 and -90 <= r.lat < 90


def test_cell_roundtrip(spark):
    pts = [(-179.9, -89.9), (0.0, 0.0), (179.9, 89.9), (-180.0, 90.0), (45.3, -12.7)]
    df = spark.createDataFrame(pts, ["lon", "lat"])
    for res in (0, 3, 7):
        rows = df.select(
            "lon",
            "lat",
            geo.cell_id("lon", "lat", res).alias("cell"),
            geo.unpack_ix(geo.cell_id("lon", "lat", res)).alias("ix"),
            geo.unpack_iy(geo.cell_id("lon", "lat", res)).alias("iy"),
            geo.unpack_res(geo.cell_id("lon", "lat", res)).alias("r"),
        ).collect()
        for row in rows:
            assert row.cell == py_cell(row.lon, row.lat, res)
            n = 1 << res
            assert 0 <= row.ix < n and 0 <= row.iy < n and row.r == res


def test_parent_cell_consistency(spark):
    df = spark.createDataFrame([(-73.98, 40.75)], ["lon", "lat"])
    row = df.select(
        geo.cell_id("lon", "lat", 8).alias("c8"),
        geo.parent_cell(geo.cell_id("lon", "lat", 8), 8, 3).alias("p3"),
        geo.cell_id("lon", "lat", 3).alias("c3"),
    ).collect()[0]
    assert row.p3 == row.c3


def test_pixel_coords_in_range(spark, docs):
    from geotiff_tiler_spark.operators.tiling import TilingParams, doc_points

    p = TilingParams()
    pts = doc_points(docs, p)
    bad = pts.filter(
        (F.col("px") < 0)
        | (F.col("px") >= p.width)
        | (F.col("py") < 0)
        | (F.col("py") >= p.height)
    )
    assert bad.count() == 0

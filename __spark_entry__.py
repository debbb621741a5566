"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is implemented with the engine's DataFrame
operators (geotiff_tiler_spark.*); each ``oracle_sql()`` entry is the
equivalent DuckDB SQL, generated from the SAME constants/formula helpers
so the two sides cannot drift.

Naming: q{NN}_{operator} maps to SURVEY.md §2 ids in each docstring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geotiff_tiler_spark.functions import geo
from geotiff_tiler_spark.operators import tiling
from geotiff_tiler_spark.operators.tiling import TilingParams

# One canonical parameter set for the contract queries (the example
# notebook's patch_size=112 family; stride defaults to max(patch) ->
# tumbling windows; see reference tiler.py:148).
P = TilingParams(
    image_res=3,
    width=448,
    height=448,
    patch_w=112,
    patch_h=112,
    stride=None,
    discard_empty=True,
    label_threshold=0.0002,
    grid_size=4,
    val_ratio=0.2,
)

# ---------------------------------------------------------------------------
# Shared DuckDB SQL fragments (single source of truth with the Spark side:
# the *_sql helpers in functions/geo.py mirror functions/geo.py Columns).
# ---------------------------------------------------------------------------

_LON = geo.geo_lon_sql("text")
_LAT = geo.geo_lat_sql("text")


def _pts_cte(p: TilingParams = P) -> str:
    """DuckDB CTE: documents -> geocoded points with image + pixel coords."""
    return f"""
pts AS (
  SELECT doc_id, lang,
         {_LON} AS lon,
         {_LAT} AS lat,
         {geo.cell_id_sql(_LON, _LAT, p.image_res)} AS image_id,
         {geo.pixel_x_sql(_LON, p.image_res, p.width)} AS px,
         {geo.pixel_y_sql(_LAT, p.image_res, p.height)} AS py
  FROM documents
)"""


def _grid_cte(p: TilingParams = P) -> str:
    """DuckDB CTE: full stride grid for every observed image (W1)."""
    s = p.eff_stride
    return f"""
imgs AS (SELECT DISTINCT image_id FROM pts),
grid AS (
  SELECT image_id, tx.x AS tile_x, ty.y AS tile_y
  FROM imgs,
       generate_series(0, {p.width - 1}, {s}) tx(x),
       generate_series(0, {p.height - 1}, {s}) ty(y)
)"""


def _stats_cte(p: TilingParams = P) -> str:
    """DuckDB CTE: per-tile label stats (tumbling assignment)."""
    s = p.eff_stride
    return f"""
stats AS (
  SELECT image_id,
         CAST(floor(px / {s}) * {s} AS BIGINT) AS tile_x,
         CAST(floor(py / {s}) * {s} AS BIGINT) AS tile_y,
         COUNT(*) AS point_cnt,
         COUNT(DISTINCT px * 1000000 + py) AS nonzero_px
  FROM pts
  GROUP BY 1, 2, 3
)"""


def _tiles_cte(p: TilingParams = P) -> str:
    """DuckDB CTE: grid left-joined to stats with empty tiles zero-filled."""
    return f"""
tiles AS (
  SELECT g.image_id, g.tile_x, g.tile_y,
         COALESCE(s.point_cnt, 0) AS point_cnt,
         COALESCE(s.nonzero_px, 0) AS nonzero_px
  FROM grid g LEFT JOIN stats s
    ON g.image_id = s.image_id AND g.tile_x = s.tile_x AND g.tile_y = s.tile_y
)"""


def _keep_sql(p: TilingParams = P) -> str:
    """F1 patch-filter predicate (reference tiler.py:1033-1049)."""
    size = p.patch_w * p.patch_h
    conds = []
    if p.discard_empty:
        conds.append("nonzero_px > 0")
    if p.label_threshold is not None:
        conds.append(f"nonzero_px::DOUBLE / {float(size)} >= {float(p.label_threshold)}")
    return "(" + " AND ".join(conds) + ")" if conds else "TRUE"


def _splits_cte(p: TilingParams = P) -> str:
    """J9 grid-cell membership + deterministic hash split (fallback rule)."""
    cw = p.width / p.grid_size
    ch = p.height / p.grid_size
    g1 = p.grid_size - 1
    pct = int(p.val_ratio * 100)
    return f"""
cells AS (
  SELECT *,
    LEAST(CAST(floor(tile_x / {cw}) AS BIGINT), {g1}) AS grid_x,
    LEAST(CAST(floor(tile_y / {ch}) AS BIGINT), {g1}) AS grid_y
  FROM tiles
),
splits AS (
  SELECT *,
    CASE WHEN ('0x' || substr(md5(image_id::VARCHAR || '_' || grid_x::VARCHAR || '_' || grid_y::VARCHAR), 1, 15))::BIGINT % 100 < {pct}
         THEN 'val' ELSE 'trn' END AS split
  FROM cells
)"""


# ---------------------------------------------------------------------------
# queries()
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q01_geocode_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geocode + cell encode (SURVEY §7 step 2; geo.cell_id). Pure codegen stage."""
    pts = tiling.doc_points(_docs(spark, sf_dir), P)
    return pts.groupBy("image_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.min("lon").alias("min_lon"),
        F.max("lat").alias("max_lat"),
    )


def q02_stride_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/A3: stride-grid enumeration; count == ceil(W/s)*ceil(H/s) per image."""
    pts = tiling.doc_points(_docs(spark, sf_dir), P)
    grid = tiling.stride_grid(pts.select("image_id").distinct(), P)
    return grid.groupBy("image_id").agg(
        F.count(F.lit(1)).alias("n_tiles"),
        F.sum("tile_x").alias("sum_x"),
        F.sum("tile_y").alias("sum_y"),
    )


def q03_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W2: point->tile assignment with per-tile label stats (non-empty tiles)."""
    pts = tiling.doc_points(_docs(spark, sf_dir), P)
    assigned = tiling.assign_tiles(pts, P)
    return tiling.tile_label_stats(assigned, P).select(
        "image_id", "tile_x", "tile_y", "point_cnt", "nonzero_px"
    )


def q04_patch_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: `_filter_patches` truth table -> kept/discarded counts per image."""
    pts = tiling.doc_points(_docs(spark, sf_dir), P)
    tiles = tiling.full_tile_grid(pts, P)
    flagged = tiling.filter_patches(tiles, P)
    return flagged.groupBy("image_id").agg(
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("kept"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("discarded"),
    )


def q05_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 + split: grid-cell membership and split labels for kept tiles."""
    pts = tiling.doc_points(_docs(spark, sf_dir), P)
    tiles = tiling.filter_patches(tiling.full_tile_grid(pts, P), P).filter("keep")
    split = tiling.assign_split(tiles, P, validation_cells=None)
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_tiles"),
        F.sum("point_cnt").alias("points"),
    )


def q06_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: running band statistics (sum/sum^2/count -> mean/std, float64)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("s1"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = F.greatest(F.col("s2") / F.col("n") - mean * mean, F.lit(0.0))
    return agg.select(
        "l_returnflag",
        "n",
        F.round(mean, 6).alias("mean_qty"),
        F.round(F.sqrt(var), 6).alias("std_qty"),
    )


def q07_class_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-image class distribution (class = lang), exact fractions."""
    pts = tiling.doc_points(_docs(spark, sf_dir), P)
    per_class = pts.groupBy("image_id", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    total = pts.groupBy("image_id").agg(F.count(F.lit(1)).alias("tot"))
    return per_class.join(total, "image_id").select(
        "image_id",
        "lang",
        "cnt",
        (F.col("cnt").cast("double") / F.col("tot")).alias("frac"),
    )


def q08_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-grid-cell class distribution with int-truncation bounds
    (reference val.py:39-101)."""
    p = P
    pts = tiling.doc_points(_docs(spark, sf_dir), p)
    cw = p.width / p.grid_size
    ch = p.height / p.grid_size
    g1 = p.grid_size - 1
    cells = pts.withColumn(
        "grid_x", F.least((F.col("px") / F.lit(cw)).cast("bigint"), F.lit(g1))
    ).withColumn(
        "grid_y", F.least((F.col("py") / F.lit(ch)).cast("bigint"), F.lit(g1))
    )
    per = cells.groupBy("image_id", "grid_x", "grid_y", "lang").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = cells.groupBy("image_id", "grid_x", "grid_y").agg(
        F.count(F.lit(1)).alias("tot")
    )
    return per.join(tot, ["image_id", "grid_x", "grid_y"]).select(
        "image_id",
        "grid_x",
        "grid_y",
        "lang",
        "cnt",
        (F.col("cnt").cast("double") / F.col("tot")).alias("frac"),
    )


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the M0 end-to-end tiling pipeline on sf0.001.

    pages -> geocode/cell/pixel encode -> stride grid -> per-tile label
    stats -> F1 filter -> J9 split assignment. Returns kept tiles with
    split labels (the rows a shard writer would consume).
    """
    sf_dir = "/root/testdata/sf0.001"
    pts = tiling.doc_points(_docs(spark, sf_dir), P)
    tiles = tiling.filter_patches(tiling.full_tile_grid(pts, P), P).filter("keep")
    split = tiling.assign_split(tiles, P, validation_cells=None)
    return tiling.patch_key(split).select(
        "patch_key", "image_id", "tile_x", "tile_y", "point_cnt", "nonzero_px", "split"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_geocode_cells": q01_geocode_cells,
        "q02_stride_grid": q02_stride_grid,
        "q03_tile_assign": q03_tile_assign,
        "q04_patch_filter": q04_patch_filter,
        "q05_split_assign": q05_split_assign,
        "q06_band_stats": q06_band_stats,
        "q07_class_distribution": q07_class_distribution,
        "q08_spatial_grid": q08_spatial_grid,
    }


def oracle_sql() -> dict[str, str]:
    p = P
    s = p.eff_stride
    cw = p.width / p.grid_size
    ch = p.height / p.grid_size
    g1 = p.grid_size - 1
    return {
        "q01_geocode_cells": f"""
WITH {_pts_cte()}
SELECT image_id, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
       MIN(lon) AS min_lon, MAX(lat) AS max_lat
FROM pts GROUP BY image_id
""",
        "q02_stride_grid": f"""
WITH {_pts_cte()}, {_grid_cte()}
SELECT image_id, COUNT(*) AS n_tiles, SUM(tile_x) AS sum_x, SUM(tile_y) AS sum_y
FROM grid GROUP BY image_id
""",
        "q03_tile_assign": f"""
WITH {_pts_cte()}, {_stats_cte()}
SELECT image_id, tile_x, tile_y, point_cnt, nonzero_px FROM stats
""",
        "q04_patch_filter": f"""
WITH {_pts_cte()}, {_grid_cte()}, {_stats_cte()}, {_tiles_cte()}
SELECT image_id,
       SUM(CASE WHEN {_keep_sql()} THEN 1 ELSE 0 END) AS kept,
       SUM(CASE WHEN {_keep_sql()} THEN 0 ELSE 1 END) AS discarded
FROM tiles GROUP BY image_id
""",
        "q05_split_assign": f"""
WITH {_pts_cte()}, {_grid_cte()}, {_stats_cte()}, {_tiles_cte()},
kept AS (SELECT * FROM tiles WHERE {_keep_sql()}),
cells AS (
  SELECT *,
    LEAST(CAST(floor(tile_x / {cw}) AS BIGINT), {g1}) AS grid_x,
    LEAST(CAST(floor(tile_y / {ch}) AS BIGINT), {g1}) AS grid_y
  FROM kept
),
splits AS (
  SELECT *,
    CASE WHEN ('0x' || substr(md5(image_id::VARCHAR || '_' || grid_x::VARCHAR || '_' || grid_y::VARCHAR), 1, 15))::BIGINT % 100 < {int(p.val_ratio * 100)}
         THEN 'val' ELSE 'trn' END AS split
  FROM cells
)
SELECT split, COUNT(*) AS n_tiles, SUM(point_cnt) AS points
FROM splits GROUP BY split
""",
        "q06_band_stats": """
WITH agg AS (
  SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS s1,
         SUM(l_quantity * l_quantity) AS s2
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND(s1 / n, 6) AS mean_qty,
       ROUND(sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0.0)), 6) AS std_qty
FROM agg
""",
        "q07_class_distribution": f"""
WITH {_pts_cte()},
per AS (SELECT image_id, lang, COUNT(*) AS cnt FROM pts GROUP BY 1, 2),
tot AS (SELECT image_id, COUNT(*) AS tot FROM pts GROUP BY 1)
SELECT per.image_id, per.lang, per.cnt, per.cnt::DOUBLE / tot.tot AS frac
FROM per JOIN tot ON per.image_id = tot.image_id
""",
        "q08_spatial_grid": f"""
WITH {_pts_cte()},
cells AS (
  SELECT *,
    LEAST(CAST(floor(px / {cw}) AS BIGINT), {g1}) AS grid_x,
    LEAST(CAST(floor(py / {ch}) AS BIGINT), {g1}) AS grid_y
  FROM pts
),
per AS (SELECT image_id, grid_x, grid_y, lang, COUNT(*) AS cnt FROM cells GROUP BY 1,2,3,4),
tot AS (SELECT image_id, grid_x, grid_y, COUNT(*) AS tot FROM cells GROUP BY 1,2,3)
SELECT per.image_id, per.grid_x, per.grid_y, per.lang, per.cnt,
       per.cnt::DOUBLE / tot.tot AS frac
FROM per JOIN tot
  ON per.image_id = tot.image_id AND per.grid_x = tot.grid_x AND per.grid_y = tot.grid_y
""",
    }

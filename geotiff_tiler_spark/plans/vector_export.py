"""Per-tile vector export: clip label polygons to tile windows and emit
GeoJSON features — the reference's per-sample `vectors.geojson` payload
(reference tiler.py:940-954 writes one GeoJSON per sample; clip +
truncation semantics from vector.py:65-149; serialization vector.py:120-149).

Plan shape:
  tiles (image_id, tile_x, tile_y) --geo-box arithmetic (JVM)-->
  tile boxes x polygons --cell equi-join prefilter-->
  candidate pairs --mapInPandas: Sutherland-Hodgman clip + snap +
  byte-stable GeoJSON--> (tile identity, feature_id, is_truncated, geojson)

The tile's geo box derives from the image cell's affine frame (X6); edge
tiles extend past the cell boundary exactly like the reference's boundless
windows (tiler.py:789-817).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geotiff_tiler_spark.functions import geo
from geotiff_tiler_spark.operators.spatial_join import boxes_to_cells
from geotiff_tiler_spark.operators.tiling import TilingParams

EXPORT_SCHEMA = (
    "image_id long, tile_x long, tile_y long, feature_id long, "
    "is_truncated boolean, geojson string"
)


def tile_geo_boxes(tiles: DataFrame, params: TilingParams) -> DataFrame:
    """Attach the tile window's geographic box (from the image cell's
    affine frame; boundless past the cell edge like W2)."""
    n = 1 << params.image_res
    cw, ch = 360.0 / n, 180.0 / n
    ax, ay = cw / params.width, ch / params.height
    ix = geo.unpack_ix("image_id").cast("double")
    iy = geo.unpack_iy("image_id").cast("double")
    x0 = ix * cw - 180.0 + F.col("tile_x").cast("double") * ax
    y0 = iy * ch - 90.0 + F.col("tile_y").cast("double") * ay
    return (
        tiles.withColumn("txmin", x0)
        .withColumn("tymin", y0)
        .withColumn("txmax", x0 + params.patch_w * ax)
        .withColumn("tymax", y0 + params.patch_h * ay)
    )


def export_tile_vectors(
    tiles: DataFrame, polygons: DataFrame, params: TilingParams
) -> DataFrame:
    """J7 + X14: clip every candidate (tile, polygon) pair; emit byte-stable
    GeoJSON with is_truncated; empty intersections dropped (the reference
    drops empty clips, vector.py:110-113)."""
    tb = tile_geo_boxes(tiles.select("image_id", "tile_x", "tile_y"), params)
    # prefilter: tile boxes and polygon bboxes meet in shared image_res cells
    tcells = boxes_to_cells(
        tb.withColumnRenamed("txmin", "xmin")
        .withColumnRenamed("tymin", "ymin")
        .withColumnRenamed("txmax", "xmax")
        .withColumnRenamed("tymax", "ymax"),
        params.image_res,
    ).withColumnRenamed("xmin", "txmin").withColumnRenamed("ymin", "tymin").withColumnRenamed(
        "xmax", "txmax"
    ).withColumnRenamed("ymax", "tymax")
    pcells = boxes_to_cells(polygons, params.image_res).select(
        "cell", "feature_id", "class", "wkb", "xmin", "ymin", "xmax", "ymax"
    )
    cand = (
        tcells.join(pcells, "cell")
        .filter(
            (F.col("xmin") <= F.col("txmax"))
            & (F.col("xmax") >= F.col("txmin"))
            & (F.col("ymin") <= F.col("tymax"))
            & (F.col("ymax") >= F.col("tymin"))
        )
        .select(
            "image_id", "tile_x", "tile_y", "txmin", "tymin", "txmax", "tymax",
            "feature_id", "class", "wkb",
        )
        .distinct()
    )

    def _clip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from geotiff_tiler_spark.functions import geojson as gj
        from geotiff_tiler_spark.operators import strtree as st

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                clipped, truncated = st.clip_wkb_to_box(
                    bytes(r["wkb"]), r["txmin"], r["tymin"], r["txmax"], r["tymax"]
                )
                if clipped is None:
                    continue
                feat = gj.feature_json(
                    clipped,
                    {"class": r["class"], "feature_id": int(r["feature_id"])},
                    is_truncated=truncated,
                )
                rows.append(
                    (
                        int(r["image_id"]),
                        int(r["tile_x"]),
                        int(r["tile_y"]),
                        int(r["feature_id"]),
                        bool(truncated),
                        feat,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "tile_x", "tile_y", "feature_id", "is_truncated", "geojson",
                ],
            )

    return cand.mapInPandas(_clip, EXPORT_SCHEMA)

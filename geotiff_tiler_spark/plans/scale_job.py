"""The data-bound scale workload used for the N vs 4N scaling evidence.

The correctness suite at sf0.1 is dominated by fixed per-stage overheads
(hundreds of ms per stage on sub-MB inputs), which makes strong-scaling
measurements meaningless. This job synthesizes the north-rule pages table
at millions of rows (sources/pages.synth_pages — pure JVM codegen, no I/O)
and runs the engine's load-bearing operators end-to-end:

  1. extract_text from html (the per-url invariant path)
  2. geocode + cell/pixel encode + stride-grid tiling + F1 filter + split
  3. point-in-box spatial join against a synthesized label layer
  4. MinHash + LSH candidate pairs on a 1/8 subset
  5. exact dedup groups

Throughput metric = (tiles + join output rows) / sec — the BASELINE.json
metric shape. All stages are shuffle-light: the tiling aggregate and the
dedup aggregates are partial+final hash aggs; the spatial join is a cell
equi-join; minhash is explode + hash agg.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from geotiff_tiler_spark.operators import dedup, spatial_join, tiling
from geotiff_tiler_spark.operators.tiling import TilingParams
from geotiff_tiler_spark.sources import labels, pages

SCALE_PARAMS = TilingParams(
    image_res=6,  # 4096 x 4096 potential cells -> thousands of images
    width=448,
    height=448,
    patch_w=112,
    patch_h=112,
    stride=None,
    discard_empty=True,
    label_threshold=None,
    grid_size=4,
    val_ratio=0.2,
)


def run_scale_workload(spark: SparkSession, n_pages: int, n_boxes: int = 20000) -> dict:
    t_gen0 = time.time()
    pg = pages.synth_pages(spark, n_pages)
    docs = pg.select(
        "doc_id", pages.extract_text("html").alias("text"), "lang"
    ).persist()
    docs.count()  # materialize: stands in for the one storage scan of the
    # input table (downstream subtrees would otherwise re-run the generator)
    t0 = time.time()
    sec_gen = round(t0 - t_gen0, 2)

    # tiling pipeline (geocode runs md5 over extracted text — data-bound)
    pts = tiling.doc_points(docs, SCALE_PARAMS)
    tiles = tiling.kept_tiles(pts, SCALE_PARAMS)
    split = tiling.assign_split(tiles, SCALE_PARAMS, validation_cells=None)
    n_tiles = split.count()
    t_tiles = time.time()

    # spatial join: synthesized label boxes over a range table
    sup = spark.range(n_boxes).withColumnRenamed("id", "s_suppkey")
    boxes = labels.label_boxes(sup)
    hits = spatial_join.point_in_box_join(
        pts.select("doc_id", "lon", "lat"), boxes, SCALE_PARAMS.image_res
    )
    n_hits = hits.count()
    t_join = time.time()

    # dedup ladder on a contiguous subset (keeps the synthetic (id, id-1)
    # duplicate pairs intact; a modulo sample would separate them)
    sub = docs.filter(F.col("doc_id") < n_pages // 8)
    sigs = dedup.minhash_signature(sub)
    pairs = dedup.lsh_candidate_pairs(dedup.lsh_buckets(sigs))
    n_pairs = pairs.count()
    t_lsh = time.time()
    n_groups = dedup.exact_dedup_groups(docs).count()
    t_dedup = time.time()

    docs.unpersist()
    total = t_dedup - t0
    out_rows = n_tiles + n_hits + n_pairs
    return {
        "sec_gen": sec_gen,
        "n_pages": n_pages,
        "tiles": n_tiles,
        "join_rows": n_hits,
        "lsh_pairs": n_pairs,
        "dedup_groups": n_groups,
        "sec_tiling": round(t_tiles - t0, 2),
        "sec_join": round(t_join - t_tiles, 2),
        "sec_dedup": round(t_dedup - t_join, 2),
        "sec_dedup_lsh": round(t_lsh - t_join, 2),
        "sec_dedup_exact": round(t_dedup - t_lsh, 2),
        "sec_total": round(total, 2),
        "tiles_join_rows_per_sec": round(out_rows / total, 1),
    }

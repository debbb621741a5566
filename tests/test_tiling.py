"""Tiling operator invariants mirrored from the reference's semantics:

- total patch count = ceil(W/s) * ceil(H/s) (reference val.py:93-95)
- patch filter truth table (reference tiler.py:1033-1049)
- grid-cell int-truncation bounds (reference tiler.py:834-846, val.py:63-66)
- sliding-window multi-assignment when stride < patch
"""

import math

from pyspark.sql import functions as F

from geotiff_tiler_spark.operators import tiling
from geotiff_tiler_spark.operators.tiling import TilingParams


def test_total_patch_count_formula(spark):
    # non-divisible dims exercise partial edge patches
    for w, h, s in [(448, 448, 112), (300, 200, 112), (300, 200, 56), (112, 112, 112)]:
        p = TilingParams(width=w, height=h, patch_w=112, patch_h=112, stride=s)
        images = spark.createDataFrame([(1,)], ["image_id"])
        n = tiling.stride_grid(images, p).count()
        assert n == math.ceil(w / s) * math.ceil(h / s) == p.tiles_per_image


def test_filter_patches_truth_table(spark):
    # replicate _filter_patches: size==0 -> discard; discard_empty &
    # nonzero==0 -> discard; nonzero/size < threshold -> discard
    p = TilingParams(patch_w=10, patch_h=10, discard_empty=True, label_threshold=0.05)
    rows = [
        (1, 0, 0, 0, 0),  # empty -> discard
        (1, 0, 10, 4, 4),  # 4/100 < 0.05 -> discard
        (1, 10, 0, 5, 5),  # 5/100 == 0.05 -> keep (>= threshold)
        (1, 10, 10, 60, 50),  # keep
    ]
    df = spark.createDataFrame(
        rows, ["image_id", "tile_x", "tile_y", "point_cnt", "nonzero_px"]
    )
    got = {
        (r.tile_x, r.tile_y): r.keep
        for r in tiling.filter_patches(df, p).collect()
    }
    assert got == {(0, 0): False, (0, 10): False, (10, 0): True, (10, 10): True}

    # discard_empty=False keeps empty tiles when no threshold
    p2 = TilingParams(patch_w=10, patch_h=10, discard_empty=False, label_threshold=None)
    got2 = {r.tile_x: r.keep for r in tiling.filter_patches(df, p2).collect()}
    assert all(got2.values())


def test_grid_cell_truncation(spark):
    # reference: grid_x = int(x / (width/grid_size)), clamped to grid-1
    p = TilingParams(width=300, height=200, grid_size=4)
    # width/4 = 75.0; x=74 -> 0, x=75 -> 1, x=299 -> 3
    rows = [(1, 74, 0, 1, 1), (1, 75, 0, 1, 1), (1, 299, 199, 1, 1)]
    df = spark.createDataFrame(
        rows, ["image_id", "tile_x", "tile_y", "point_cnt", "nonzero_px"]
    )
    got = {r.tile_x: (r.grid_x, r.grid_y) for r in tiling.grid_cell_of_tile(df, p).collect()}
    assert got[74] == (0, 0)
    assert got[75] == (1, 0)
    assert got[299] == (3, 3)


def test_sliding_window_multi_assignment(spark):
    # stride 56 < patch 112: an interior point belongs to 4 tiles (2 per axis)
    p = TilingParams(width=448, height=448, patch_w=112, patch_h=112, stride=56)
    pts = spark.createDataFrame([(1, 1, 200, 200)], ["doc_id", "image_id", "px", "py"])
    assigned = tiling.assign_tiles(pts, p).collect()
    anchors = sorted((r.tile_x, r.tile_y) for r in assigned)
    assert anchors == [(112, 112), (112, 168), (168, 112), (168, 168)]
    for x, y in anchors:
        assert x <= 200 < x + 112 and y <= 200 < y + 112 and x % 56 == 0


def test_edge_point_tumbling(spark):
    # tumbling: every point maps to exactly one tile, incl. edge pixels
    p = TilingParams(width=448, height=448, patch_w=112, patch_h=112, stride=None)
    pts = spark.createDataFrame(
        [(i, 1, px, py) for i, (px, py) in enumerate([(0, 0), (447, 447), (111, 112)])],
        ["doc_id", "image_id", "px", "py"],
    )
    assigned = tiling.assign_tiles(pts, p)
    assert assigned.count() == 3
    per_doc = assigned.groupBy("doc_id").count().collect()
    assert all(r["count"] == 1 for r in per_doc)


def test_split_assignment_ratio_and_determinism(spark, docs):
    p = TilingParams()
    pts = tiling.doc_points(docs, p)
    tiles = tiling.filter_patches(tiling.full_tile_grid(pts, p), p).filter("keep")
    s1 = tiling.assign_split(tiles, p).groupBy("split").count().collect()
    s2 = tiling.assign_split(tiles, p).groupBy("split").count().collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    counts = dict(map(tuple, s1))
    assert counts.get("trn", 0) > 0  # deterministic hash split produces both
    # explicit validation cells: dict form
    vc = {r.image_id: {"0_0", "1_1"} for r in tiles.select("image_id").distinct().collect()}
    s3 = tiling.assign_split(tiles, p, validation_cells=vc)
    val_cells = s3.filter("split = 'val'").select("cell_key").distinct().collect()
    assert set(r.cell_key for r in val_cells) <= {"0_0", "1_1"}

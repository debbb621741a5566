"""Fixed-stride patch-grid tiling — the engine's core operator family.

Reference semantics re-expressed Spark-first:

- stride grid enumeration (reference tiler.py:779-780): a double python loop
  ``for y in range(0, H, stride): for x in range(0, W, stride)`` becomes an
  ``explode(sequence(...))`` cross of two lazy sequences — a deterministic
  2-D tumbling/sliding window over pixel space, fully JVM-side.
- total patch count invariant (reference val.py:93-95):
  ``ceil(W/stride) * ceil(H/stride)`` including partial edge patches.
- patch filter (reference tiler.py:1033-1049 `_filter_patches`): discard when
  the label window is empty / below `label_threshold` nonzero fraction.
  Late materialization (label read before image read, tiler.py:799-817) maps
  to: the filter runs on cheap per-tile counts BEFORE any heavy per-tile
  payload work.
- grid-cell split assignment (reference tiler.py:834-846): grid_x =
  x // (width / grid_size) with float division then int truncation — the
  exact tile->validation-cell mapping the north rule requires to match.

An "image" here is one geocell at ``image_res`` rasterized to
``width`` x ``height`` pixels; its work-list identity column is `image_id`
(the packed cell id), playing the role of the reference's image stem
(tiler.py:208).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geotiff_tiler_spark.functions import geo


@dataclass(frozen=True)
class TilingParams:
    """Mirror of the reference Tiler's knobs (tiler.py:80-180)."""

    image_res: int = 3  # geocell resolution that defines one "image"
    width: int = 448  # image raster width in pixels
    height: int = 448  # image raster height
    patch_w: int = 112  # reference default patch_size (README/example)
    patch_h: int = 112
    stride: int | None = None  # None -> max(patch) (reference tiler.py:148)
    discard_empty: bool = True
    label_threshold: float | None = None  # min nonzero fraction
    grid_size: int = 4  # validation spatial grid (reference val.py:39)
    val_ratio: float = 0.2

    @property
    def eff_stride(self) -> int:
        return self.stride if self.stride is not None else max(self.patch_w, self.patch_h)

    @property
    def tiles_per_image(self) -> int:
        """ceil(W/s) * ceil(H/s) — reference val.py:93-95."""
        s = self.eff_stride
        return -(-self.width // s) * -(-self.height // s)


def doc_points(docs: DataFrame, params: TilingParams, text_col: str = "text") -> DataFrame:
    """Pages/documents -> geocoded points with image + pixel coordinates.

    Narrow stage (no shuffle): geocode, cell-encode, pixel-encode are all
    scalar expressions, so this fuses into the parquet scan under
    whole-stage codegen.
    """
    t = F.col(text_col)
    return (
        docs.withColumn("lon", geo.geo_lon(t))
        .withColumn("lat", geo.geo_lat(t))
        .withColumn("image_id", geo.cell_id("lon", "lat", params.image_res))
        .withColumn("px", geo.pixel_x("lon", params.image_res, params.width))
        .withColumn("py", geo.pixel_y("lat", params.image_res, params.height))
    )


def stride_grid(images: DataFrame, params: TilingParams) -> DataFrame:
    """Enumerate every patch anchor of every image (reference W1).

    `images` needs one row per image with an `image_id` column. Output:
    one row per (image_id, tile_x, tile_y) — including partial edge patches,
    exactly range(0, W, stride) x range(0, H, stride).
    """
    s = params.eff_stride
    xs = F.sequence(F.lit(0), F.lit(params.width - 1), F.lit(s))
    ys = F.sequence(F.lit(0), F.lit(params.height - 1), F.lit(s))
    return (
        images.select("image_id")
        .withColumn("tile_x", F.explode(xs))
        .withColumn("tile_y", F.explode(ys))
        .withColumn("tile_x", F.col("tile_x").cast("bigint"))
        .withColumn("tile_y", F.col("tile_y").cast("bigint"))
    )


def assign_tiles(points: DataFrame, params: TilingParams) -> DataFrame:
    """Map each point to every patch whose window contains it (W1 probe side).

    Tumbling (stride >= patch): at most one tile per point.
    Sliding  (stride < patch): a point belongs to up to
    ceil(patch/stride) anchors per axis — enumerated with a small
    `sequence` explode, still pure JVM expressions (no shuffle).
    Anchor arithmetic: a = (floor(p/s) - j) * s for j in [0, ceil(patch/s));
    keep 0 <= a and p < a + patch and a is a grid anchor (a < W).
    """
    s = params.eff_stride
    jx = -(-params.patch_w // s)  # ceil(patch/stride) candidate anchors
    jy = -(-params.patch_h // s)
    out = points.withColumn("_jx", F.explode(F.sequence(F.lit(0), F.lit(jx - 1))))
    out = out.withColumn(
        "tile_x", ((F.floor(F.col("px") / s) - F.col("_jx")) * s).cast("bigint")
    ).drop("_jx")
    out = out.filter(
        (F.col("tile_x") >= 0)
        & (F.col("px") < F.col("tile_x") + params.patch_w)
        & (F.col("tile_x") < params.width)
    )
    out = out.withColumn("_jy", F.explode(F.sequence(F.lit(0), F.lit(jy - 1))))
    out = out.withColumn(
        "tile_y", ((F.floor(F.col("py") / s) - F.col("_jy")) * s).cast("bigint")
    ).drop("_jy")
    out = out.filter(
        (F.col("tile_y") >= 0)
        & (F.col("py") < F.col("tile_y") + params.patch_h)
        & (F.col("tile_y") < params.height)
    )
    return out


def tile_label_stats(points_with_tiles: DataFrame, params: TilingParams) -> DataFrame:
    """Per-tile label statistics: the cheap proxy read of the label window.

    groupBy is a partial+final hash aggregate (map-side combine), keyed on
    (image_id, tile_x, tile_y) — the tile identity (reference tiler.py:848).
    `nonzero_px` = number of label-bearing pixels in the window (each point
    marks one pixel; duplicates collapse via distinct pixel count).
    """
    return points_with_tiles.groupBy("image_id", "tile_x", "tile_y").agg(
        F.count(F.lit(1)).alias("point_cnt"),
        F.countDistinct("px", "py").alias("nonzero_px"),
    )


def full_tile_grid(points: DataFrame, params: TilingParams) -> DataFrame:
    """All tiles of every image present in the data, with label stats.

    Left join of the enumerated grid against observed per-tile stats, so
    empty tiles exist with nonzero_px = 0 (the reference reads EVERY window
    and only then filters, tiler.py:779-804). The grid side is tiny
    (#images x tiles_per_image) — broadcast-friendly; the stats side has
    already been reduced by the hash aggregate, so this join is cheap at
    any scale.
    """
    assigned = assign_tiles(points, params)
    stats = tile_label_stats(assigned, params)
    images = points.select("image_id").distinct()
    grid = stride_grid(images, params)
    return grid.join(stats, ["image_id", "tile_x", "tile_y"], "left").fillna(
        {"point_cnt": 0, "nonzero_px": 0}
    )


def filter_patches(tiles: DataFrame, params: TilingParams) -> DataFrame:
    """The F1 patch filter (reference `_filter_patches`, tiler.py:1033-1049).

    Truth table (label window of size patch_w*patch_h):
      1. size == 0                                   -> discard (degenerate)
      2. discard_empty and nonzero == 0              -> discard
      3. threshold set and nonzero/size < threshold  -> discard
    Emits `keep` so discard counters (reference tiler.py:1005-1014) stay
    computable; call .filter("keep") for the output path.
    """
    size = params.patch_w * params.patch_h
    keep = F.lit(size > 0)
    if params.discard_empty:
        keep = keep & (F.col("nonzero_px") > 0)
    if params.label_threshold is not None:
        keep = keep & (
            F.col("nonzero_px").cast("double") / F.lit(float(size))
            >= F.lit(float(params.label_threshold))
        )
    return tiles.withColumn("keep", keep)


def grid_cell_of_tile(tiles: DataFrame, params: TilingParams) -> DataFrame:
    """Validation-grid membership (reference tiler.py:834-846, EXACT).

    grid_x = int(tile_x / (width / grid_size)) — float division, int
    truncation, then clamp to grid_size-1 (reference min(grid_x, ...)).
    cell_key = "{gx}_{gy}".
    """
    cw = params.width / params.grid_size
    ch = params.height / params.grid_size
    gx = F.least(
        (F.col("tile_x") / F.lit(cw)).cast("bigint"), F.lit(params.grid_size - 1)
    )
    gy = F.least(
        (F.col("tile_y") / F.lit(ch)).cast("bigint"), F.lit(params.grid_size - 1)
    )
    return tiles.withColumn("grid_x", gx).withColumn("grid_y", gy).withColumn(
        "cell_key", F.concat_ws("_", "grid_x", "grid_y")
    )


def assign_split(
    tiles: DataFrame,
    params: TilingParams,
    validation_cells: dict[int, set[str]] | set[str] | None = None,
) -> DataFrame:
    """Tile -> split label (reference tiler.py:838-846).

    `validation_cells` comes from the greedy/random selector
    (operators.stats.select_validation_cells); it is driver-side-small
    (<= grid_size^2 entries per image) and enters the plan as a literal
    broadcast set — exactly the reference's `cell_id in validation_cells`.
    When a dict {image_id -> cells} is given, membership is per image.
    Fallback when no selector ran: deterministic hash split at val_ratio
    (portable across engines for the oracle).
    """
    t = grid_cell_of_tile(tiles, params)
    if validation_cells is None:
        from geotiff_tiler_spark.functions.hashing import portable_hash64

        bucket = portable_hash64(
            F.concat_ws("_", F.col("image_id"), F.col("cell_key"))
        ) % F.lit(100)
        is_val = bucket < F.lit(int(params.val_ratio * 100))
    elif isinstance(validation_cells, dict):
        tags = [f"{img}:{ck}" for img, cells in validation_cells.items() for ck in cells]
        tag = F.concat_ws(":", F.col("image_id").cast("string"), F.col("cell_key"))
        is_val = tag.isin(tags) if tags else F.lit(False)
    else:
        is_val = F.col("cell_key").isin(sorted(validation_cells)) if validation_cells else F.lit(False)
    return t.withColumn("split", F.when(is_val, F.lit("val")).otherwise(F.lit("trn")))


def patch_key(tiles: DataFrame, prefix: str = "tiles") -> DataFrame:
    """Tile identity key `{prefix}_{image}_{x}_{y}` (reference tiler.py:848)."""
    return tiles.withColumn(
        "patch_key",
        F.concat_ws("_", F.lit(prefix), F.col("image_id"), F.col("tile_x"), F.col("tile_y")),
    )


def assign_split_by_cells(
    tiles: DataFrame, params: TilingParams, val_cells: DataFrame
) -> DataFrame:
    """J9 split assignment against a DISTRIBUTED validation-cell table
    (image_id, cell_key) — the scale form of `assign_split(validation_cells=dict)`:
    a left join instead of literal isin lists, so billions of images work.
    The val_cells side is tiny relative to tiles (<= grid^2 rows/image) and
    usually broadcastable; Catalyst/AQE picks the strategy."""
    t = grid_cell_of_tile(tiles, params)
    marked = val_cells.withColumn("_is_val", F.lit(True))
    joined = t.join(marked, ["image_id", "cell_key"], "left")
    return joined.withColumn(
        "split",
        F.when(F.col("_is_val"), F.lit("val")).otherwise(F.lit("trn")),
    ).drop("_is_val")


def kept_tiles(points: DataFrame, params: TilingParams) -> DataFrame:
    """Fast path for the output pipeline: when discard_empty is set, every
    kept tile has label pixels, so it MUST appear in the per-tile stats —
    the full-grid left join (distinct images + grid explode + 3-way
    shuffle alignment) exists only to count discarded tiles. This path
    filters the stats aggregate directly: identical kept set, two fewer
    shuffles. Falls back to the grid join when empty tiles can be kept."""
    if not params.discard_empty and params.label_threshold in (None, 0):
        return filter_patches(full_tile_grid(points, params), params).filter("keep")
    assigned = assign_tiles(points, params)
    stats = tile_label_stats(assigned, params)
    return filter_patches(stats, params).filter("keep")

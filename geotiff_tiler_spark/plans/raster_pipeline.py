"""Spark wiring for the raster tier: tile materialization + target columns.

The reference materializes per-tile numpy windows inside one process
(tiler.py:779-832) and computes training targets per image
(build_targets.py). Here each tile is one ROW with a binary label-patch
payload, produced and consumed by Arrow-batched pandas UDFs:

  points --applyInPandas per (image, tile)--> label tiles (binary patch)
         --mapInPandas--> target tiles (EDT weight / heatmap / raw SDF)
         --groupBy(image).max + broadcast rejoin--> normalized SDF (X11's
           global-then-local normalization: the one operator that CANNOT be
           done in a single grouped pass, SURVEY §7 "what's hard")

Payload format: raw uint8 (H*W) bytes for labels/uint8 targets, float32
bytes for SDF — Parquet-friendly binary columns, decoded with
np.frombuffer (zero-copy) inside the UDFs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geotiff_tiler_spark.operators import raster
from geotiff_tiler_spark.operators.tiling import TilingParams, assign_tiles

LABEL_TILE_SCHEMA = (
    "image_id long, tile_x long, tile_y long, patch binary, "
    "n_label_px long, n_classes int"
)

TARGET_SCHEMA = (
    "image_id long, tile_x long, tile_y long, target binary, "
    "max_abs double, nonzero long"
)


def synthetic_nodata_mask(px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Deterministic stand-in for 'all image bands == nodata' (W3): a sparse
    diagonal stripe pattern. Any real deployment derives this from the
    image payload instead."""
    return ((px * 7 + py * 13) % 97) == 0


def materialize_label_tiles(
    points: DataFrame, params: TilingParams, class_order: list[str], class_col: str = "lang"
) -> DataFrame:
    """Burn each tile's points into a (patch_h, patch_w) uint8 label patch.

    Burn map: class_order index + 1 (reference X3 continuous mapping);
    ascending-burn overwrite; nodata pixels -> 255 (W3). One output row per
    non-empty tile; the applyInPandas group key is the tile identity, so
    partitioning matches the write layout."""
    burn_map = raster.burn_value_map(class_order, continuous=True)
    pw, ph = params.patch_w, params.patch_h

    # F3 class filter (reference io.py:784-789): only requested classes are
    # rasterized; rows with other class values are dropped before burning
    assigned = (
        assign_tiles(points, params)
        .filter(F.col(class_col).isin(class_order))
        .select("image_id", "tile_x", "tile_y", "px", "py", class_col)
    )

    # r6 (guide §4.1/§4.2): applyInArrow instead of applyInPandas — the
    # 1000s of per-tile groups paid a pandas block-manager construction
    # each (~3 ms/group dominated the q35 stage); Arrow hands the group
    # as column buffers. Same numpy math, byte-identical patches
    # (test_label_tiles_arrow_matches_pandas). The nodata stripe mask is
    # one add+mod over a precomputed local-grid base instead of two
    # np.add.outer allocations per tile: ((7*(px+tx) + 13*(py+ty)) % 97
    # == ((7*px + 13*py) + (7*tx + 13*ty)) % 97 exactly (non-negative
    # ints), so synthetic_nodata_mask's values are unchanged.
    base_grid = (
        7 * np.add.outer(np.zeros(ph, dtype=np.int64), np.arange(pw))
        + 13 * np.add.outer(np.arange(ph, dtype=np.int64), np.zeros(pw, dtype=np.int64))
    )

    def _burn_arrow(tbl):
        import pyarrow as pa

        img = tbl.column("image_id")[0].as_py()
        tx = tbl.column("tile_x")[0].as_py()
        ty = tbl.column("tile_y")[0].as_py()
        lx = tbl.column("px").to_numpy(zero_copy_only=False).astype(np.int64) - tx
        ly = tbl.column("py").to_numpy(zero_copy_only=False).astype(np.int64) - ty
        # boundless window: coordinates past the image edge still land in
        # the full-size patch; outside the patch would be a bug
        keep = (lx >= 0) & (lx < pw) & (ly >= 0) & (ly < ph)
        lx, ly = lx[keep], ly[keep]
        cls = tbl.column(class_col).to_pylist()
        burn = np.array(
            [burn_map[c] for c, kp in zip(cls, keep) if kp], dtype=np.int64
        )
        patch = raster.rasterize_points(lx, ly, burn, pw, ph)
        nod = (base_grid + (7 * tx + 13 * ty)) % 97 == 0
        patch = raster.apply_nodata_mask(patch, nod)
        lbl = (patch > 0) & (patch != raster.IGNORE)
        n_label = int(lbl.sum())
        n_classes = int(len(np.unique(patch[lbl])))
        return pa.Table.from_arrays(
            [
                pa.array([img], pa.int64()),
                pa.array([tx], pa.int64()),
                pa.array([ty], pa.int64()),
                pa.array([patch.tobytes()], pa.binary()),
                pa.array([n_label], pa.int64()),
                pa.array([n_classes], pa.int32()),
            ],
            ["image_id", "tile_x", "tile_y", "patch", "n_label_px", "n_classes"],
        )

    return assigned.groupBy("image_id", "tile_x", "tile_y").applyInArrow(
        _burn_arrow, LABEL_TILE_SCHEMA
    )


def _decode(patch: bytes, ph: int, pw: int) -> np.ndarray:
    return np.frombuffer(patch, dtype=np.uint8).reshape(ph, pw)


def compute_tile_targets(
    tiles: DataFrame, params: TilingParams, kind: str = "edt"
) -> DataFrame:
    """Per-tile target computation (X8 edt-weight, X10 vertex heatmap,
    X11 raw SDF) via mapInPandas over the binary patches."""
    pw, ph = params.patch_w, params.patch_h

    def _targets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                label = _decode(bytes(r["patch"]), ph, pw)
                if kind == "edt":
                    t = raster.dual_distance_weight(label)
                    payload = t.tobytes()
                    max_abs = float(t.max())
                    nonzero = int((t > 0).sum())
                elif kind == "vertices":
                    mask = (label > 0) & (label != raster.IGNORE)
                    ys, xs = np.nonzero(mask)
                    hm = raster.gaussian_splat(
                        np.stack([xs, ys], axis=1), pw, ph, sigma=1.5
                    )
                    t = np.clip(hm * 255.0, 0, 255).astype(np.uint8)
                    payload = t.tobytes()
                    max_abs = float(hm.max())
                    nonzero = int((t > 0).sum())
                elif kind == "sdf":
                    t = raster.sdf_unnormalized(label)
                    payload = t.tobytes()
                    max_abs = float(np.abs(t).max())
                    nonzero = int((t != 0).sum())
                elif kind == "centerline":
                    t = raster.centerline_weight_unnormalized(label).astype(np.float32)
                    payload = t.tobytes()
                    max_abs = float(t.max())
                    nonzero = int((t > 0).sum())
                else:
                    raise ValueError(kind)
                rows.append(
                    (
                        int(r["image_id"]),
                        int(r["tile_x"]),
                        int(r["tile_y"]),
                        payload,
                        max_abs,
                        nonzero,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "tile_x", "tile_y", "target", "max_abs", "nonzero"],
            )

    return tiles.mapInPandas(_targets, TARGET_SCHEMA)


def sdf_normalized(tiles: DataFrame, params: TilingParams) -> DataFrame:
    """X11 two-pass: per-tile raw SDF + partial max -> per-image global max
    (tiny aggregate, broadcast back) -> normalized tiles.

    This is the reference's image-wide normalization (build_targets.py:357:
    sdf /= max(|sdf|, 1)) expressed as agg + broadcast equi-join — the only
    shuffle is over the few-rows-per-image max table."""
    raw = compute_tile_targets(tiles, params, kind="sdf")
    gmax = raw.groupBy("image_id").agg(F.max("max_abs").alias("global_max"))
    joined = raw.join(F.broadcast(gmax), "image_id")
    pw, ph = params.patch_w, params.patch_h

    def _norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                sdf = np.frombuffer(bytes(r["target"]), dtype=np.float32).reshape(ph, pw)
                out = raster.sdf_normalize(sdf, float(r["global_max"]))
                rows.append(
                    (
                        int(r["image_id"]),
                        int(r["tile_x"]),
                        int(r["tile_y"]),
                        out.tobytes(),
                        float(np.abs(out).max()),
                        int((out != 0).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "tile_x", "tile_y", "target", "max_abs", "nonzero"],
            )

    return joined.mapInPandas(_norm, TARGET_SCHEMA)


IMAGE_TILE_SCHEMA = (
    "image_id long, tile_x long, tile_y long, split string, bands binary, "
    "n_bands int, b_sum0 double, b_sum_sq0 double, b_sum1 double, b_sum_sq1 double, "
    "b_sum2 double, b_sum_sq2 double, n_px long"
)


def synth_band_value(band: int, gx, gy):
    """Deterministic per-pixel band value (uint8) from global pixel coords —
    the synthetic stand-in for the reference's raster payload. numpy arrays
    in, numpy array out."""
    import numpy as np

    return ((gx * (3 + band) + gy * (7 + band) + band * 31) % 256).astype(np.uint8)


def materialize_image_tiles(
    kept_tiles: DataFrame, params: TilingParams, n_bands: int = 3
) -> DataFrame:
    """The image-patch analog (reference tiler.py:806-823): materialize the
    CHW band payload ONLY for tiles that already passed the label filter —
    the reference's late-materialization order (label window first, filter,
    only then the wider image read, tiler.py:799-817) expressed as plan
    topology: this stage consumes filter_patches(...).filter('keep') output.

    Emits per-band sum / sum-of-squares so running band statistics (A4)
    aggregate WITHOUT re-reading payloads (partial agg rides the write).
    """
    import numpy as np

    pw, ph = params.patch_w, params.patch_h

    def _mat(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                tx, ty = int(r["tile_x"]), int(r["tile_y"])
                gx = np.add.outer(np.zeros(ph, dtype=np.int64), np.arange(pw)) + tx
                gy = np.add.outer(np.arange(ph, dtype=np.int64), np.zeros(pw, dtype=np.int64)) + ty
                bands = np.stack(
                    [synth_band_value(b, gx, gy) for b in range(n_bands)]
                )  # CHW
                sums = [float(bands[b].astype(np.float64).sum()) for b in range(n_bands)]
                sqs = [
                    float((bands[b].astype(np.float64) ** 2).sum()) for b in range(n_bands)
                ]
                while len(sums) < 3:
                    sums.append(0.0)
                    sqs.append(0.0)
                rows.append(
                    (
                        int(r["image_id"]), tx, ty, r["split"], bands.tobytes(), n_bands,
                        sums[0], sqs[0], sums[1], sqs[1], sums[2], sqs[2], pw * ph,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "tile_x", "tile_y", "split", "bands", "n_bands",
                    "b_sum0", "b_sum_sq0", "b_sum1", "b_sum_sq1", "b_sum2", "b_sum_sq2", "n_px",
                ],
            )

    return kept_tiles.select("image_id", "tile_x", "tile_y", "split").mapInPandas(
        _mat, IMAGE_TILE_SCHEMA
    )


def band_normalization_stats(image_tiles: DataFrame, n_bands: int = 3) -> DataFrame:
    """A4 over trn patches ONLY (reference accumulates running band stats
    for training patches, tiling_manifest.py:443-486): partial sums carried
    on the tile rows -> single final aggregate -> mean/std per band."""
    trn = image_tiles.filter(F.col("split") == "trn")
    aggs = [F.sum("n_px").alias("n"), F.count(F.lit(1)).alias("patch_count")]
    for b in range(n_bands):
        aggs += [
            F.sum(f"b_sum{b}").alias(f"s1_{b}"),
            F.sum(f"b_sum_sq{b}").alias(f"s2_{b}"),
        ]
    agg = trn.agg(*aggs)
    cols = [F.col("n"), F.col("patch_count")]
    for b in range(n_bands):
        mean = F.col(f"s1_{b}") / F.col("n")
        var = F.greatest(F.col(f"s2_{b}") / F.col("n") - mean * mean, F.lit(0.0))
        cols += [
            F.round(mean, 6).alias(f"mean_band{b}"),
            F.round(F.sqrt(var), 6).alias(f"std_band{b}"),
        ]
    return agg.select(*cols)

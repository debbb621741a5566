"""Synthetic vector label layer (the reference's GeoDataFrame analog).

The reference loads vector labels from GPKG into a GeoDataFrame
(reference io.py:76-120). With no external data allowed, the engine
synthesizes a deterministic label layer from a driver-provided table:
each supplier row becomes one axis-aligned box feature (rectangles are
the oracle-checkable subset of polygons — point-in-box is pure SQL).
Classes follow the reference's default class set
(reference tiler.py:166-172: fore/hydro/road/building).

General (non-rectangular) polygons are exercised by the numpy STRtree
path in operators/spatial_join.py, verified BOTH by a pytest brute-force
oracle AND by the q39 driver-contract query, whose DuckDB oracle
re-expresses the ray cast in pure SQL over a flat edge table
(label_polygon_edges) — an independent implementation, not a replay.

Every formula is portable arithmetic on the portable hash, identical in
Spark / DuckDB / numpy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geotiff_tiler_spark.functions.hashing import portable_hash64

CLASSES = ("fore", "hydro", "road", "building")
# box geometry knobs (degrees)
MAX_W = 8.0
MAX_H = 6.0
MIN_WH = 0.5


def label_boxes(supplier: DataFrame, key_col: str = "s_suppkey") -> DataFrame:
    """One box feature per supplier row.

    Columns: feature_id, class, xmin, ymin, xmax, ymax (lon/lat degrees).
    Center from hash('bx:'|key) / hash('by:'|key); width/height from
    hash('bw:'|key) / hash('bh:'|key) in [MIN_WH, MIN_WH+MAX_W/H).

    CONTRACT: feature_id is UNIQUE (key_col is the supplier primary key,
    one output row per input row — no explode). point_in_box_join relies
    on this to skip output dedup; test_spatial.test_label_boxes_unique
    asserts it so a future source change fails loudly there, not as a
    silent q23 parity break.
    """
    key = F.col(key_col).cast("string")
    u = lambda tag: (
        portable_hash64(F.concat(F.lit(tag + ":"), key)) % F.lit(1 << 32)
    ).cast("double") / F.lit(float(1 << 32))
    cx = u("bx") * F.lit(360.0) - F.lit(180.0)
    cy = u("by") * F.lit(180.0) - F.lit(90.0)
    w = u("bw") * F.lit(MAX_W) + F.lit(MIN_WH)
    h = u("bh") * F.lit(MAX_H) + F.lit(MIN_WH)
    cls_idx = (portable_hash64(F.concat(F.lit("bc:"), key)) % F.lit(4)).cast("int")
    cls = (
        F.when(cls_idx == 0, CLASSES[0])
        .when(cls_idx == 1, CLASSES[1])
        .when(cls_idx == 2, CLASSES[2])
        .otherwise(CLASSES[3])
    )
    return supplier.select(
        F.col(key_col).cast("bigint").alias("feature_id"),
        cls.alias("class"),
        (cx - w / 2).alias("xmin"),
        (cy - h / 2).alias("ymin"),
        (cx + w / 2).alias("xmax"),
        (cy + h / 2).alias("ymax"),
    )


def label_boxes_sql(key_expr: str = "s_suppkey", table: str = "supplier") -> str:
    """DuckDB CTE body producing the identical box table."""

    def u(tag: str) -> str:
        return (
            f"((('0x' || substr(md5('{tag}:' || {key_expr}::VARCHAR), 1, 15))::BIGINT"
            f" % 4294967296)::DOUBLE / 4294967296.0)"
        )

    cx = f"({u('bx')} * 360.0 - 180.0)"
    cy = f"({u('by')} * 180.0 - 90.0)"
    w = f"({u('bw')} * {MAX_W} + {MIN_WH})"
    h = f"({u('bh')} * {MAX_H} + {MIN_WH})"
    cls_idx = f"(('0x' || substr(md5('bc:' || {key_expr}::VARCHAR), 1, 15))::BIGINT % 4)"
    cls = (
        f"CASE {cls_idx} WHEN 0 THEN '{CLASSES[0]}' WHEN 1 THEN '{CLASSES[1]}' "
        f"WHEN 2 THEN '{CLASSES[2]}' ELSE '{CLASSES[3]}' END"
    )
    return f"""
SELECT CAST({key_expr} AS BIGINT) AS feature_id,
       {cls} AS class,
       {cx} - {w} / 2 AS xmin,
       {cy} - {h} / 2 AS ymin,
       {cx} + {w} / 2 AS xmax,
       {cy} + {h} / 2 AS ymax
FROM {table}
"""


def repair_vector_layer(df: DataFrame, wkb_col: str = "wkb") -> DataFrame:
    """F2 full repair at vector-layer load (reference io.py:89-104):
    make_valid() every geometry (self-intersecting rings decomposed into
    their simple lobes, holes re-attached), then DROP rows that remain
    invalid or come out empty — the reference's repair-then-filter
    semantics as a mapInPandas stage (Arrow-batched; the per-geometry
    numpy kernel is strtree.make_valid_polygons). Bounding-box columns,
    when present, are recomputed from the repaired geometry."""
    import pandas as pd

    from geotiff_tiler_spark.operators import strtree as st

    schema = df.schema
    has_bbox = all(c in df.columns for c in ("xmin", "ymin", "xmax", "ymax"))

    def _repair(batches):
        for pdf in batches:
            keep_rows = []
            for _, row in pdf.iterrows():
                raw = row[wkb_col]
                if raw is None:
                    continue
                fixed = st.make_valid_wkb(bytes(raw))
                if fixed is None:
                    continue  # unrepairable/empty -> filtered, like the reference
                row = row.copy()
                row[wkb_col] = bytearray(fixed)
                if has_bbox:
                    bx = st.polygon_bbox(st.parse_wkb(fixed))
                    row["xmin"], row["ymin"], row["xmax"], row["ymax"] = (
                        float(bx[0]), float(bx[1]), float(bx[2]), float(bx[3]),
                    )
                keep_rows.append(row)
            yield (
                pd.DataFrame(keep_rows, columns=pdf.columns)
                if keep_rows
                else pdf.iloc[0:0]
            )

    return df.mapInPandas(_repair, schema)


def label_polygon_geoms(n: int = 60, seed: int = 42):
    """Pure-Python generator for the deterministic polygon layer: list of
    (feature_id, class, polys) where polys = list of polygons, each a list
    of OPEN rings ((k,2) float64). Shared by the Spark loader
    (label_polygons) and the q39 oracle's edge-table generator, so both
    engines see bit-identical coordinates."""
    import numpy as np

    from geotiff_tiler_spark.operators import strtree as st

    rng = np.random.default_rng(seed)
    out = []
    for fid in range(n):
        cx = float(rng.uniform(-170, 170))
        cy = float(rng.uniform(-80, 80))
        w = float(rng.uniform(1.0, MAX_W))
        h = float(rng.uniform(1.0, MAX_H))
        kind = fid % 4
        if kind == 0:  # triangle
            polys = [[np.array([[cx - w / 2, cy - h / 2], [cx + w / 2, cy - h / 2], [cx, cy + h / 2]])]]
        elif kind == 1:  # L-shape
            polys = [[np.array(
                [
                    [cx - w / 2, cy - h / 2],
                    [cx + w / 2, cy - h / 2],
                    [cx + w / 2, cy],
                    [cx, cy],
                    [cx, cy + h / 2],
                    [cx - w / 2, cy + h / 2],
                ]
            )]]
        elif kind == 2:  # donut: outer box + inner hole
            outer = np.array(
                [[cx - w / 2, cy - h / 2], [cx + w / 2, cy - h / 2], [cx + w / 2, cy + h / 2], [cx - w / 2, cy + h / 2]]
            )
            hole = np.array(
                [[cx - w / 4, cy - h / 4], [cx + w / 4, cy - h / 4], [cx + w / 4, cy + h / 4], [cx - w / 4, cy + h / 4]]
            )
            polys = [[outer, hole]]
        else:  # multipolygon: two disjoint triangles
            t1 = np.array([[cx - w / 2, cy - h / 2], [cx - w / 6, cy - h / 2], [cx - w / 3, cy + h / 2]])
            t2 = np.array([[cx + w / 6, cy - h / 2], [cx + w / 2, cy - h / 2], [cx + w / 3, cy + h / 2]])
            polys = [[t1], [t2]]
        out.append((fid, CLASSES[fid % 4], polys))
    return out


def label_polygon_edges(n: int = 60, seed: int = 42):
    """Flat edge table of the polygon layer: rows
    (feature_id, class, poly_idx, x1, y1, x2, y2) over CLOSED rings —
    exactly the point pairs the numpy ray-cast kernel walks after the WKB
    roundtrip (strtree.points_in_rings pairs r[:-1] with r[1:] on the
    closed ring). Used to build the q39 pure-SQL oracle."""
    rows = []
    for fid, cls, polys in label_polygon_geoms(n, seed):
        for pi, rings in enumerate(polys):
            for r in rings:
                k = len(r)
                for i in range(k):
                    x1, y1 = float(r[i][0]), float(r[i][1])
                    x2, y2 = float(r[(i + 1) % k][0]), float(r[(i + 1) % k][1])
                    rows.append((fid, cls, pi, x1, y1, x2, y2))
    return rows


def label_polygons(spark, n: int = 60, seed: int = 42, repair: bool = True):
    """Deterministic non-rectangular polygons for the general PIP path.

    Mix of triangles, L-shapes, donuts (polygon with hole), and 2-part
    multipolygons, sized like the boxes above. Columns:
    (feature_id, class, wkb, xmin, ymin, xmax, ymax).

    The layer routes through `repair_vector_layer` on load (F2 wiring:
    every polygon entering a spatial join is make_valid-repaired and
    invalid/empty rows are dropped, like the reference's load stage —
    round-2 ADVICE; for this already-valid synthetic layer the repair is
    a verified no-op). Pass repair=False to inspect the raw layer.
    """
    from geotiff_tiler_spark.operators import strtree as st

    rows = []
    for fid, cls, polys in label_polygon_geoms(n, seed):
        if len(polys) == 1:
            wkb = st.wkb_polygon(polys[0])
        else:
            wkb = st.wkb_multipolygon(polys)
        bx = st.polygon_bbox(st.parse_wkb(bytes(wkb)))
        rows.append(
            (fid, cls, bytearray(wkb), float(bx[0]), float(bx[1]), float(bx[2]), float(bx[3]))
        )
    df = spark.createDataFrame(
        rows,
        "feature_id long, class string, wkb binary, xmin double, ymin double, xmax double, ymax double",
    )
    return repair_vector_layer(df) if repair else df

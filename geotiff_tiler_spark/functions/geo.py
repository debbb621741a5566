"""Geocoding + hierarchical cell index (H3/S2-style), pure Spark expressions.

The reference engine anchors everything on a CRS-aligned pixel grid
(reference geotiff_tiler/tiler.py:779-848); our web-scale analog anchors on a
hierarchical lat/lon cell grid. A cell at resolution ``r`` divides the world
into 2^r x 2^r axis-aligned boxes; a cell id packs (res, ix, iy) into one
BIGINT so joins on cells are plain equi-joins (Catalyst hash join — the
filter stage of every spatial filter/refine join, reference
vector.py:36-62's STRtree candidate query).

Design goals:
- Every function is a JVM-side Column expression (whole-stage codegen,
  no Python) — the "vectorized, no per-row Python" requirement.
- Every formula is reproducible verbatim in DuckDB SQL (the oracle) and
  in numpy (unit tests): only +,-,*,/,floor,least,greatest,% on doubles
  and bigints.

Cell id layout (all arithmetic, no bit ops, identical across engines):

    cell_id = res * 2^54 + ix * 2^27 + iy      (res <= 27, ix/iy < 2^27)

Parent navigation is integer division by powers of two; k-ring neighbors
are |dx|<=k, |dy|<=k offsets — the kNN cell-ring expansion (north_rule)
builds on these.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from geotiff_tiler_spark.functions.hashing import portable_hash64

RES_MULT = 1 << 54  # res field multiplier in the packed cell id
IX_MULT = 1 << 27  # ix field multiplier
U32 = float(1 << 32)  # geocoder hash space


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# Deterministic synthetic geocoder
# ---------------------------------------------------------------------------
# The north_star pipeline geocodes pages from their text. With no external
# gazetteer permitted, the test-fixture geocoder is a deterministic map
# text -> (lon, lat) built on the portable md5 hash: uniform over the globe,
# identical in Spark / DuckDB / numpy. Real deployments swap in
# `sources.pages.geocode_mentions` (regex mention extraction + broadcast
# gazetteer join) — same downstream contract: two double columns.


def geo_lon(text_col) -> Column:
    """Deterministic longitude in [-180, 180) from a text column."""
    u = portable_hash64(_c(text_col), pos=1) % F.lit(1 << 32).cast("bigint")
    return u.cast("double") / F.lit(U32) * F.lit(360.0) - F.lit(180.0)


def geo_lat(text_col) -> Column:
    """Deterministic latitude in [-90, 90) from a text column."""
    v = portable_hash64(_c(text_col), pos=17) % F.lit(1 << 32).cast("bigint")
    return v.cast("double") / F.lit(U32) * F.lit(180.0) - F.lit(90.0)


def geo_lon_sql(expr: str) -> str:
    """DuckDB SQL equivalent of `geo_lon`."""
    return (
        f"((('0x' || substr(md5({expr}), 1, 15))::BIGINT % 4294967296)"
        f"::DOUBLE / 4294967296.0 * 360.0 - 180.0)"
    )


def geo_lat_sql(expr: str) -> str:
    """DuckDB SQL equivalent of `geo_lat`."""
    return (
        f"((('0x' || substr(md5({expr}), 17, 15))::BIGINT % 4294967296)"
        f"::DOUBLE / 4294967296.0 * 180.0 - 90.0)"
    )


# ---------------------------------------------------------------------------
# Cell index
# ---------------------------------------------------------------------------


def cell_ix(lon_col, res: int) -> Column:
    """Cell x index at resolution res: floor((lon+180)/360 * 2^res), clamped."""
    n = 1 << res
    raw = F.floor((_c(lon_col) + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("bigint")


def cell_iy(lat_col, res: int) -> Column:
    """Cell y index at resolution res: floor((lat+90)/180 * 2^res), clamped."""
    n = 1 << res
    raw = F.floor((_c(lat_col) + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n)))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("bigint")


def pack_cell(ix_col, iy_col, res: int) -> Column:
    """Pack (res, ix, iy) into one BIGINT cell id."""
    return (
        F.lit(res).cast("bigint") * F.lit(RES_MULT)
        + _c(ix_col) * F.lit(IX_MULT)
        + _c(iy_col)
    ).cast("bigint")


def cell_id(lon_col, lat_col, res: int) -> Column:
    """lon/lat -> packed cell id at resolution res."""
    return pack_cell(cell_ix(lon_col, res), cell_iy(lat_col, res), res)


def unpack_ix(cell_col) -> Column:
    return ((_c(cell_col) % F.lit(RES_MULT)) / F.lit(IX_MULT)).cast("bigint")


def unpack_iy(cell_col) -> Column:
    return (_c(cell_col) % F.lit(IX_MULT)).cast("bigint")


def unpack_res(cell_col) -> Column:
    return (_c(cell_col) / F.lit(RES_MULT)).cast("bigint")


def parent_cell(cell_col, from_res: int, to_res: int) -> Column:
    """Coarsen a cell id from from_res to to_res (to_res <= from_res)."""
    if to_res > from_res:
        raise ValueError("to_res must be <= from_res")
    shift = 1 << (from_res - to_res)
    ix = (unpack_ix(cell_col) / F.lit(shift)).cast("bigint")
    iy = (unpack_iy(cell_col) / F.lit(shift)).cast("bigint")
    return pack_cell(ix, iy, to_res)


# --- DuckDB SQL text equivalents (oracle single-source constants) ----------


def cell_ix_sql(lon_expr: str, res: int) -> str:
    n = 1 << res
    return (
        f"LEAST(GREATEST(CAST(floor(({lon_expr} + 180.0) / 360.0 * {float(n)}) "
        f"AS BIGINT), 0), {n - 1})"
    )


def cell_iy_sql(lat_expr: str, res: int) -> str:
    n = 1 << res
    return (
        f"LEAST(GREATEST(CAST(floor(({lat_expr} + 90.0) / 180.0 * {float(n)}) "
        f"AS BIGINT), 0), {n - 1})"
    )


def pack_cell_sql(ix_expr: str, iy_expr: str, res: int) -> str:
    return f"(CAST({res} AS BIGINT) * {RES_MULT} + ({ix_expr}) * {IX_MULT} + ({iy_expr}))"


def cell_id_sql(lon_expr: str, lat_expr: str, res: int) -> str:
    return pack_cell_sql(cell_ix_sql(lon_expr, res), cell_iy_sql(lat_expr, res), res)


# ---------------------------------------------------------------------------
# In-cell pixel coordinates (the raster analog)
# ---------------------------------------------------------------------------
# An "image" is one cell at image_res rasterized to width x height pixels.
# A point's pixel is its fractional position within the cell scaled to the
# pixel grid — mirrors the reference's affine world->pixel transform
# (reference build_targets.py:22-29: px=(x-c)/a, py=(y-f)/e).


def pixel_x(lon_col, res: int, width: int) -> Column:
    n = 1 << res
    fx = (_c(lon_col) + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))
    frac = fx - F.floor(fx)
    raw = F.floor(frac * F.lit(float(width)))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(width - 1)).cast("bigint")


def pixel_y(lat_col, res: int, height: int) -> Column:
    n = 1 << res
    fy = (_c(lat_col) + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n))
    frac = fy - F.floor(fy)
    raw = F.floor(frac * F.lit(float(height)))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(height - 1)).cast("bigint")


def pixel_x_sql(lon_expr: str, res: int, width: int) -> str:
    n = 1 << res
    fx = f"(({lon_expr} + 180.0) / 360.0 * {float(n)})"
    frac = f"({fx} - floor({fx}))"
    return (
        f"LEAST(GREATEST(CAST(floor({frac} * {float(width)}) AS BIGINT), 0), {width - 1})"
    )


def pixel_y_sql(lat_expr: str, res: int, height: int) -> str:
    n = 1 << res
    fy = f"(({lat_expr} + 90.0) / 180.0 * {float(n)})"
    frac = f"({fy} - floor({fy}))"
    return (
        f"LEAST(GREATEST(CAST(floor({frac} * {float(height)}) AS BIGINT), 0), {height - 1})"
    )

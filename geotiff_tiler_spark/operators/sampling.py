"""Deterministic stratified quota sampling for training-data mixes.

The canonical data-mixing operator: cap each stratum (language, source
domain, quality bucket, ...) at a fixed quota, choosing rows by a seeded
shuffle that both engines — and any re-run — reproduce byte-for-byte.
The reference's split/sampling tier (tiler.py split assignment,
SURVEY.md §2.6 W7 seeded sampling, W9 limits) picks rows by hash order
for the same reason: resumable pipelines cannot use ``rand()``.

Order key: lowercase-hex md5 of the decimal id string
(``sample_key`` / ``sample_key_sql`` — the single source of truth for
both engines). md5 is uniform on distinct ids, so "first `quota` rows
by key" is a uniform sample without replacement per stratum.

100-TB shape: the naive form — one ``row_number`` window per stratum —
sorts an entire stratum in ONE task; per-language caps over 1e12 docs
make that a scale-killer (the q42 class of failure). This module
instead rides :func:`skew.bounded_topk`: a partial top-`quota` per
(stratum, id-hash bucket) with bounded partitions, then a final
top-`quota` over the <= n_buckets * quota survivors. Output is
bit-identical to the single window (each id sits in exactly one
bucket, and a row in the global top-k is necessarily in its bucket's
top-k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geotiff_tiler_spark.operators import skew


def sample_key(id_col) -> Column:
    """Cross-engine-deterministic uniform order key: md5 hex of the
    decimal id string. Sorting by it is a seeded shuffle."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(c.cast("string"))


def sample_key_sql(expr: str) -> str:
    """DuckDB twin of :func:`sample_key` (md5 -> lowercase hex in both)."""
    return f"md5(CAST({expr} AS VARCHAR))"


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    id_col: str,
    quota: int,
    n_buckets: int = 64,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep min(quota, |stratum|) rows per stratum, deterministically.

    Rows are ranked within each stratum by (md5(id), id) — a total
    order, so ties are impossible — and rows with rank <= quota are
    kept. ``rank_col`` (bigint, 1-based) is retained in the output:
    re-running with a larger quota extends the sample monotonically
    (rank <= q' is a superset of rank <= q), which is what an iterative
    mix-tuning loop needs.

    Scale: two bounded window stages via skew.bounded_topk — no task
    ever sorts more than ~|stratum|/n_buckets rows, independent of how
    few or how hot the strata are."""
    keyed = df.withColumn("_sk", sample_key(id_col))
    out = skew.bounded_topk(
        keyed,
        part_cols=list(strata),
        order_cols=[F.col("_sk").asc(), F.col(id_col).asc()],
        k=quota,
        bucket_from=id_col,
        n_buckets=n_buckets,
        rank_col=rank_col,
    )
    return out.drop("_sk")

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


# --- deterministic mixture resampling ----------------------------------------

# 13 md5 hex digits = 52 bits; dividing by 2^52 is an exact power-of-two
# scale, so the key is uniform on [0, 1) with no rounding asymmetry.
UNIT_DENOM = float(1 << 52)


def unit_interval_key(id_col) -> Column:
    """Deterministic uniform [0,1) key per id — the Bernoulli coin both
    engines (and any re-run) flip identically: first 13 md5 hex digits
    of the decimal id string, scaled by 2^-52."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 13), 16, 10)
    return h.cast("bigint") / F.lit(UNIT_DENOM)


def unit_interval_key_sql(expr: str) -> str:
    """DuckDB twin of :func:`unit_interval_key`."""
    return (
        f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 13))::BIGINT"
        f" / {1 << 52}.0)"
    )


def mixture_resample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weights: dict[str, int],
    materialize: bool = True,
) -> DataFrame:
    """Resample the corpus to TARGET mixture proportions, deterministically.

    The other half of the data-mixing problem: `stratified_sample` caps
    strata at an absolute quota; this op reshapes the corpus so stratum
    `s` contributes share w_s / sum(w) of the output — the language-
    rebalancing step of a multilingual training mix. The largest output
    satisfying every target exactly is T = min_s floor(n_s * sum(w) / w_s),
    giving per-stratum keep rate r_s = T * w_s / (sum(w) * n_s) <= 1; a row
    is kept iff its :func:`unit_interval_key` < r_s (seeded Bernoulli —
    expectation exactly T * w_s / sum(w), and both engines keep the
    identical row set). Strata absent from `weights` are dropped.

    100-TB shape: the corpus is NEVER shuffled — one tiny partial+final
    count per stratum, a |strata|-row rate table broadcast back, and a
    map-side filter. All arithmetic is integer or single IEEE divisions
    of exact integers (n * sum(w) < 2^52 holds to ~10^12 rows per
    stratum), so the kept set is stable across engines and re-runs.

    Returns the kept rows with `_rate` and `_n_s` attached (callers
    aggregate as needed)."""
    wsum = sum(weights.values())
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    caps = (
        df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("_n_s"))
        .withColumn("_w", wmap[F.col(stratum_col)])
        .filter(F.col("_w").isNotNull())
        .withColumn("_cap", F.floor((F.col("_n_s") * F.lit(wsum)) / F.col("_w")))
    )
    if materialize:
        # caps fans out to the global-min agg AND the rate projection;
        # un-materialized, each branch re-derives it and the corpus count
        # scan runs twice (three in-plan scans next to the final join).
        # The frame is |strata| rows — lazy localCheckpoint pins the plan
        # at the documented two corpus passes (count + filter).
        caps = caps.localCheckpoint(eager=False)
    t = caps.agg(F.min("_cap").alias("_T"))
    rates = caps.crossJoin(F.broadcast(t)).select(
        stratum_col,
        "_n_s",
        (
            (F.col("_T") * F.col("_w")).cast("double")
            / (F.col("_n_s") * F.lit(wsum)).cast("double")
        ).alias("_rate"),
    )
    return df.join(F.broadcast(rates), stratum_col).filter(
        unit_interval_key(id_col) < F.col("_rate")
    )


def mixture_resample_ctes(
    stratum_expr: str, id_expr: str, weights: dict[str, int], table: str
) -> str:
    """DuckDB twin CTE block for :func:`mixture_resample` — emits a
    `kept` CTE (all `table` columns + rate + n_s) from the SAME cap /
    rate / unit-key formulas, so the kept row set is engine-identical."""
    wsum = sum(weights.values())
    vals = ", ".join(f"('{s}', {w})" for s, w in sorted(weights.items()))
    key = unit_interval_key_sql(f"d.{id_expr}")
    return f"""
counts AS (
  SELECT {stratum_expr} AS s, COUNT(*) AS n_s FROM {table} GROUP BY 1
),
caps AS (
  SELECT s, n_s, w, CAST(floor((n_s * {wsum}) / w) AS BIGINT) AS cap
  FROM counts JOIN (VALUES {vals}) AS wt(s, w) USING (s)
),
t AS (SELECT MIN(cap) AS t_total FROM caps),
rates AS (
  SELECT s, n_s,
         CAST(cap_t.t_total * w AS DOUBLE) / CAST(n_s * {wsum} AS DOUBLE) AS rate
  FROM caps, t AS cap_t
),
kept AS (
  SELECT d.*, r.rate AS _rate, r.n_s AS _n_s
  FROM {table} d JOIN rates r ON d.{stratum_expr} = r.s
  WHERE {key} < r.rate
)"""

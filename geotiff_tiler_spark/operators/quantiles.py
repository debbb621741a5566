"""Exact grouped quantiles over bounded integer domains, histogram-style.

Corpus-quality reporting needs order statistics (median / p90 / p99 of
doc length, token count, score buckets) — but Spark's exact
``percentile`` aggregate buffers EVERY value of a group in one task,
and approx_percentile is not oracle-checkable. For integer-valued
metrics with a bounded domain (lengths, counts, 0-100 scores) there is
a shape that is both exact and 100-TB-safe: aggregate a histogram —
counts per (group, value), at most |group| x |domain| rows regardless
of input size — then read each quantile off the cumulative counts.

Definition (pinned, interpolation-free, pure integer): the q-quantile
for q = num/den is the SMALLEST value whose running count reaches
ceil(n * num / den) — the "lower" / type-1 quantile. The target rank is
computed as floor((n*num + den - 1) / den), integer-exact in double for
n*num < 2^53 (~9e13 rows per group with p99) — far past any per-group
cardinality this engine targets; both engines evaluate the identical
formula (shared via :func:`quantiles_select_sql`).

Scale shape: one partial+final hash aggregate (map-side combined) down
to histogram size, then two window passes over bounded partitions
(<= |domain| rows each), then a final tiny aggregate. No task ever
holds more than the domain's distinct values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# (output column, numerator, denominator)
DEFAULT_QUANTILES: tuple[tuple[str, int, int], ...] = (
    ("p50", 1, 2),
    ("p90", 9, 10),
    ("p99", 99, 100),
)


def _target(n_col, num: int, den: int):
    """ceil(n * num / den) as floor((n*num + den - 1) / den), bigint."""
    return F.floor((n_col * F.lit(num) + F.lit(den - 1)) / F.lit(den))


def grouped_exact_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: tuple[tuple[str, int, int], ...] = DEFAULT_QUANTILES,
) -> DataFrame:
    """Exact type-1 quantiles of integer `value_col` per group.

    Output: group_cols + n_rows (bigint) + one bigint column per
    requested quantile."""
    hist = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("_cnt"))
    w_cum = Window.partitionBy(*group_cols).orderBy(F.col(value_col).asc())
    w_all = Window.partitionBy(*group_cols)
    c = hist.withColumn("_cum", F.sum("_cnt").over(w_cum)).withColumn(
        "_n", F.sum("_cnt").over(w_all)
    )
    aggs = [F.max("_n").alias("n_rows")]
    for name, num, den in quantiles:
        hit = F.when(F.col("_cum") >= _target(F.col("_n"), num, den), F.col(value_col))
        aggs.append(F.min(hit).alias(name))
    return c.groupBy(*group_cols).agg(*aggs)


def quantiles_select_sql(
    value_expr: str = "v",
    n_expr: str = "n",
    cum_expr: str = "cum",
    quantiles: tuple[tuple[str, int, int], ...] = DEFAULT_QUANTILES,
) -> str:
    """The per-quantile SELECT fragments of the DuckDB twin — generated
    from the SAME (num, den) specs and target formula as the Spark side,
    to be wrapped in the histogram + cumulative-window CTE by the caller:

        WITH h AS (SELECT <group>, <val> AS v, COUNT(*) AS cnt ... GROUP BY ...),
        c AS (SELECT *, SUM(cnt) OVER (PARTITION BY <group> ORDER BY v) AS cum,
                        SUM(cnt) OVER (PARTITION BY <group>) AS n FROM h)
        SELECT <group>, CAST(MAX(n) AS BIGINT) AS n_rows, {this} FROM c GROUP BY <group>
    """
    parts = []
    for name, num, den in quantiles:
        target = f"CAST(floor(({n_expr}*{num} + {den - 1}) / {den}) AS BIGINT)"
        parts.append(
            f"MIN(CASE WHEN {cum_expr} >= {target} THEN {value_expr} END) AS {name}"
        )
    return ",\n       ".join(parts)


def robust_outlier_gate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    cut: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """Robust per-group outlier gate: flag rows where
    |value - median| > cut * MAD (median absolute deviation) — the
    classic heavy-tail-safe filter for corpus metrics (doc length, token
    count), where mean/stddev gates are dragged by the very outliers
    they should catch.

    ONE corpus pass: the input collapses to a per-(group, value)
    histogram (at most |group| x |domain| rows), and everything else —
    median, the deviation histogram (counts re-keyed by |v - med|, no
    second scan), MAD, and the outlier tally itself (n_out = the
    histogram mass where dev > cut * MAD) — is derived from that bounded
    frame. The earlier formulation composed grouped_exact_quantiles
    twice over the RAW rows and re-joined the corpus for the flag: four
    corpus scans in the physical plan. The histogram fans out to three
    consumers, so `materialize=True` lazily localCheckpoints it. The
    flag is a pure integer comparison (`dev > cut * mad`, no float).
    Output per group: n_rows, med, mad, n_out, out_frac (round 9) —
    value-identical to the row-level formulation (the histogram is a
    lossless regrouping of the same integers).
    """
    hist = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("_cnt"))
    if materialize:
        hist = hist.localCheckpoint(eager=False)
    w_cum = Window.partitionBy(*group_cols).orderBy(F.col(value_col).asc())
    w_all = Window.partitionBy(*group_cols)
    c = hist.withColumn("_cum", F.sum("_cnt").over(w_cum)).withColumn(
        "_n", F.sum("_cnt").over(w_all)
    )
    med_hit = F.when(F.col("_cum") >= _target(F.col("_n"), 1, 2), F.col(value_col))
    med = c.groupBy(*group_cols).agg(F.min(med_hit).alias("med"))
    devh = (
        hist.join(F.broadcast(med), group_cols)
        .withColumn("_dev", F.abs(F.col(value_col) - F.col("med")))
        .groupBy(*group_cols, "med", "_dev")
        .agg(F.sum("_cnt").alias("_cnt"))
    )
    dc = devh.withColumn(
        "_cum",
        F.sum("_cnt").over(
            Window.partitionBy(*group_cols).orderBy(F.col("_dev").asc())
        ),
    ).withColumn("_n", F.sum("_cnt").over(w_all))
    mad_hit = F.when(F.col("_cum") >= _target(F.col("_n"), 1, 2), F.col("_dev"))
    stats = dc.groupBy(*group_cols).agg(
        F.max("med").alias("med"),
        F.min(mad_hit).alias("mad"),
        F.sum("_cnt").cast("bigint").alias("n_rows"),
    )
    tally = (
        devh.join(F.broadcast(stats.select(*group_cols, "mad")), group_cols)
        .withColumn(
            "_out",
            F.when(F.col("_dev") > F.lit(cut) * F.col("mad"), F.col("_cnt")).otherwise(
                F.lit(0)
            ),
        )
        .groupBy(*group_cols)
        .agg(F.sum("_out").cast("bigint").alias("n_out"))
    )
    return stats.join(tally, group_cols).select(
        *group_cols,
        "n_rows",
        "med",
        "mad",
        "n_out",
        F.round(F.col("n_out").cast("double") / F.col("n_rows"), 9).alias("out_frac"),
    )


def robust_gate_sql(
    group_expr: str, value_expr: str, table: str, cut: int = 3
) -> str:
    """DuckDB twin of :func:`robust_outlier_gate` — the same histogram +
    cumulative-count median formula (via :func:`quantiles_select_sql`)
    applied twice, then the same integer flag."""
    med_sel = quantiles_select_sql(quantiles=(("med", 1, 2),))
    mad_sel = quantiles_select_sql(quantiles=(("mad", 1, 2),))
    return f"""
WITH h1 AS (
  SELECT {group_expr} AS g, {value_expr} AS v, COUNT(*) AS cnt
  FROM {table} GROUP BY 1, 2
),
c1 AS (
  SELECT *, SUM(cnt) OVER (PARTITION BY g ORDER BY v) AS cum,
         SUM(cnt) OVER (PARTITION BY g) AS n
  FROM h1
),
med AS (SELECT g, {med_sel} FROM c1 GROUP BY g),
dev AS (
  SELECT d.{group_expr} AS g, abs(d.{value_expr} - m.med) AS v, m.med
  FROM {table} d JOIN med m ON d.{group_expr} = m.g
),
h2 AS (SELECT g, v, COUNT(*) AS cnt FROM dev GROUP BY 1, 2),
c2 AS (
  SELECT *, SUM(cnt) OVER (PARTITION BY g ORDER BY v) AS cum,
         SUM(cnt) OVER (PARTITION BY g) AS n
  FROM h2
),
mad AS (SELECT g, {mad_sel} FROM c2 GROUP BY g)
SELECT dev.g AS {group_expr},
       COUNT(*) AS n_rows,
       MAX(dev.med) AS med,
       MAX(mad.mad) AS mad,
       CAST(SUM(CASE WHEN dev.v > {cut} * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
       round(SUM(CASE WHEN dev.v > {cut} * mad.mad THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 9) AS out_frac
FROM dev JOIN mad ON dev.g = mad.g
GROUP BY dev.g
"""

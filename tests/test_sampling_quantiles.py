"""Stratified quota sampling + exact histogram quantiles + JSON extraction.

Each operator is checked three ways where it matters: contract output
(quota / definition respected), bit-parity of the scale-safe plan with
the naive single-task formulation, and an independent pure-Python
recomputation of the definition.
"""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geotiff_tiler_spark.functions import jsonpath as J
from geotiff_tiler_spark.operators import quantiles, sampling

SF_DIR = "/root/testdata/sf0.001"


# --- stratified sampling ----------------------------------------------------


def _plain_window_sample(docs, quota):
    """The naive one-window-per-stratum form the bounded plan must match."""
    w = Window.partitionBy("lang", "source").orderBy(
        sampling.sample_key("doc_id").asc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= quota)
        .select("lang", "source", "rank", "doc_id")
    )


def test_stratified_sample_matches_plain_window(spark, docs):
    got = sorted(
        map(
            tuple,
            sampling.stratified_sample(docs, ["lang", "source"], "doc_id", 3)
            .select("lang", "source", "rank", "doc_id")
            .collect(),
        )
    )
    want = sorted(map(tuple, _plain_window_sample(docs, 3).collect()))
    assert got == want and len(got) > 0


def test_stratified_sample_quota_and_determinism(spark, docs):
    out = sampling.stratified_sample(docs, ["lang", "source"], "doc_id", 2)
    per = out.groupBy("lang", "source").count().collect()
    assert per and all(r["count"] <= 2 for r in per)
    # deterministic: a re-run returns the identical sample
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in sampling.stratified_sample(docs, ["lang", "source"], "doc_id", 2).collect()
    )
    assert a == b


def test_stratified_sample_monotone_in_quota(spark, docs):
    """rank <= q' extends rank <= q: growing the quota only ADDS rows."""
    small = {
        r["doc_id"]
        for r in sampling.stratified_sample(docs, ["lang"], "doc_id", 2).collect()
    }
    big = {
        r["doc_id"]
        for r in sampling.stratified_sample(docs, ["lang"], "doc_id", 5).collect()
    }
    assert small < big


# --- exact histogram quantiles ---------------------------------------------


def _type1_quantile(sorted_vals, num, den):
    """Independent definition: smallest value at running rank ceil(n*num/den)."""
    n = len(sorted_vals)
    target = -(-(n * num) // den)  # ceil
    return sorted_vals[target - 1]


def test_grouped_quantiles_match_python(spark, docs):
    out = {
        r["lang"]: r
        for r in quantiles.grouped_exact_quantiles(docs, ["lang"], "n_chars").collect()
    }
    rows = docs.select("lang", "n_chars").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])
    assert set(out) == set(by_lang)
    for lang, vals in by_lang.items():
        vals.sort()
        got = out[lang]
        assert got["n_rows"] == len(vals)
        for name, num, den in quantiles.DEFAULT_QUANTILES:
            assert got[name] == _type1_quantile(vals, num, den), (lang, name)


def test_quantiles_single_row_group(spark):
    df = spark.createDataFrame([("a", 7)], ["g", "v"])
    row = quantiles.grouped_exact_quantiles(df, ["g"], "v").collect()[0]
    assert (row["n_rows"], row["p50"], row["p99"]) == (1, 7, 7)


def test_quantiles_bounded_plan(spark, docs):
    """The plan aggregates to histogram size BEFORE any window: the
    HashAggregate on (group, value) must sit below the Window, so no
    task ever sorts more than the domain's distinct values."""
    df = quantiles.grouped_exact_quantiles(docs, ["lang"], "n_chars")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert plan.index("Window") < plan.rindex("HashAggregate"), plan
    # the first (deepest-printed) aggregate below the window keys on value
    below = plan[plan.index("Window"):]
    assert "n_chars" in below


# --- JSON extraction --------------------------------------------------------


def test_json_bigint_matches_python(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(200)
    got = ev.select("props", J.json_bigint("props", "$.k").alias("k")).collect()
    assert got
    for r in got:
        want = json.loads(r["props"]).get("k")
        assert r["k"] == want


def test_json_bigint_null_contract(spark):
    df = spark.createDataFrame(
        [('{"k": 5}',), ('{"j": 1}',), ("not json",), (None,), ('{"k": "x"}',)],
        ["props"],
    )
    vals = [r["k"] for r in df.select(J.json_bigint("props", "$.k").alias("k")).collect()]
    assert vals == [5, None, None, None, None]

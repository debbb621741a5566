"""Deterministic synthesis of the north-rule input table + text extraction.

input_hint shape: (url string, warc_ts timestamp, html binary, text string,
lang string). Synthesized entirely with JVM expressions over spark.range —
no data files, no Python, linear scan speed — so the scale benchmark can
generate millions of pages per second and stay data-bound.

Determinism contract:
- every column is a pure function of `doc_id` (xxhash64 with fixed seeds);
- `extract_text(html)` is byte-identical to the `text` column for every
  url — the per-row invariant the north rule pins (verified in
  tests/test_pages.py and by a golden md5-of-all-texts check).

Skew knobs (for the skew-handling story): domain popularity is
Zipf-shaped via u^4 scaling, so a handful of domains carry most pages —
the "popular domains" hot-key source the north rule names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = [
    "the", "a", "of", "to", "in", "is", "data", "spark", "table", "query",
    "join", "scan", "merge", "batch", "stream", "window", "agg", "row",
    "column", "value", "key", "hash", "sort", "filter", "group", "order",
    "line", "part", "customer", "fast", "slow", "big", "small", "vector",
    "et", "de", "und", "das", "el", "una", "le", "la",
]
N_DOMAINS = 1000
LANGS = ["en", "fr", "de", "es"]
BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def synth_pages(spark: SparkSession, n: int, min_tokens: int = 24, var_tokens: int = 40) -> DataFrame:
    """n deterministic pages. Exact duplicates: doc_id % 17 == 16 clones the
    text of doc_id-1; near-duplicates: doc_id % 31 == 30 appends one token."""
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    base = F.when(
        (F.col("doc_id") % 17 == 16) & (F.col("doc_id") > 0), F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    n_tok = (F.xxhash64(base, F.lit("ntok")) % var_tokens + var_tokens) % var_tokens + min_tokens
    vocab = F.array([F.lit(w) for w in VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda j: F.element_at(
            vocab, (F.pmod(F.xxhash64(base, j, F.lit("w")), F.lit(len(VOCAB))) + 1).cast("int")
        ),
    )
    text = F.array_join(words, " ")
    text = F.when(
        F.col("doc_id") % 31 == 30, F.concat(text, F.lit(" "), F.lit("extra"))
    ).otherwise(text)
    # Zipf-ish domain popularity: u^4 concentrates mass on low domain ids
    u = (F.pmod(F.xxhash64(F.col("doc_id"), F.lit("dom")), F.lit(1 << 20))).cast(
        "double"
    ) / F.lit(float(1 << 20))
    domain_id = F.floor(u * u * u * u * N_DOMAINS).cast("bigint")
    url = F.concat(
        F.lit("https://d"),
        domain_id.cast("string"),
        F.lit(".example.com/p/"),
        F.col("doc_id").cast("string"),
    )
    warc_ts = F.timestamp_seconds(
        F.lit(BASE_EPOCH) + F.pmod(F.xxhash64(F.col("doc_id"), F.lit("ts")), F.lit(31536000))
    )
    lang = F.element_at(
        F.array([F.lit(x) for x in LANGS]),
        (F.pmod(F.xxhash64(F.col("doc_id"), F.lit("lang")), F.lit(4)) + 1).cast("int"),
    )
    html = F.concat(
        F.lit("<html><head><title>doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body><p>"),
        text,
        F.lit("</p></body></html>"),
    ).cast("binary")
    return df.select(
        "doc_id",
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def synth_malformed_pages(spark: SparkSession, n_valid: int, n_bad: int) -> DataFrame:
    """`n_bad` deterministic INVALID pages appended after the valid id
    range (doc_id in [n_valid, n_valid + n_bad)), cycling the three S7
    failure modes — empty text, unknown lang, timestamp out of range — so
    the quarantine path runs under load without disturbing the valid
    rows' ids or contents (scale-workload parity keys stay comparable).
    """
    df = spark.range(n_valid, n_valid + n_bad).withColumnRenamed("id", "doc_id")
    mode = F.pmod(F.col("doc_id"), F.lit(3))
    text = F.when(mode == 0, F.lit("")).otherwise(
        F.concat(F.lit("malformed page "), F.col("doc_id").cast("string"))
    )
    lang = F.when(mode == 1, F.lit("xx")).otherwise(F.lit("en"))
    warc_ts = F.when(
        mode == 2, F.lit("1970-01-02 00:00:00").cast("timestamp")
    ).otherwise(F.timestamp_seconds(F.lit(BASE_EPOCH)))
    html = F.concat(
        F.lit("<html><body><p>"), text, F.lit("</p></body></html>")
    ).cast("binary")
    url = F.concat(F.lit("https://bad.example.com/p/"), F.col("doc_id").cast("string"))
    return df.select(
        "doc_id",
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def extract_text(html_col) -> "F.Column":
    """Byte-stable text extraction from the html binary column.

    Deterministic by construction: single regexp capture of the first
    <p>...</p> block, no entity decoding, no normalization — the per-url
    byte-identical invariant (BASELINE.json input_hint). JVM regexp, no UDF.
    """
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    return F.regexp_extract(c.cast("string"), r"<p>(.*?)</p>", 1)

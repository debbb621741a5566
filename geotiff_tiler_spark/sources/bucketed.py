"""Bucketed corpus tables: the write-once, shuffle-many-times artifact.

Several hot paths document their 100-TB production shape as "write the
corpus bucketed by the hot key, query many times" (similarity.
ivf_build_index — bucket by ivf_cluster; exact/greedy dedup — bucket by
the text digest). This module makes that path concrete with plain public
Spark bucketing (``DataFrameWriter.bucketBy``), and test_bucketed.py
asserts the plans it promises.

Why it matters at 100 TB: a table bucketed by key ``k`` into ``n``
buckets reads back with ``outputPartitioning = HashPartitioning(k, n)``.
Every downstream ``groupBy(k)``, self-join on ``k``, and equi-join whose
other side is small enough to shuffle runs with NO Exchange on the corpus
side — the single biggest per-query cost (re-hashing ~100 TB for every
dedup sweep or ANN probe batch) is paid once at ingest instead of once
per query. This composes with the partition-pruned written-IVF-index path
(similarity.ivf_write_index + test_written_ivf_index_scan_is_
partition_pruned): partitioning prunes WHICH bytes are read, bucketing
removes the shuffle on the bytes that are.

Sizing rule: pick ``n_buckets`` so corpus_bytes / n_buckets lands in the
128–512 MB range (one healthy task per bucket). Buckets are per-file
WITHIN each write task, so an unpartitioned writer with T tasks emits up
to T x n files; ``write_bucketed`` repartitions by the bucket key first
so each task owns whole buckets and the file count stays ~n_buckets.

Reference parity note: the reference engine has no bucketed storage (it
is single-node; rasterio/GDAL reads, reference io.py) — this is part of
the Spark-native scale tier, like operators/skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed (and bucket-sorted) by
    ``key``.

    ``path`` makes it an external table (tests point this at a tmp dir);
    omit it for a managed table under spark.sql.warehouse.dir. ``sort``
    additionally orders rows by ``key`` within each bucket file — with
    one file per bucket Spark's scan reports the sort order and
    sort-merge joins skip the per-task Sort.
    """
    writer = (
        df.repartition(n_buckets, key)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata.

    Must go through the catalog (``spark.table``): a plain
    ``spark.read.parquet(path)`` of the same files loses the bucket spec
    and reintroduces the shuffle the table exists to avoid.
    """
    return spark.table(table)

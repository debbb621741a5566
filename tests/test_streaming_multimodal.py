"""Streaming ingest (availableNow, file source) + multimodal plumbing."""

import os

import pytest
from pyspark.sql import functions as F

from geotiff_tiler_spark.multimodal import binary as mm
from geotiff_tiler_spark.operators.tiling import TilingParams
from geotiff_tiler_spark.plans.manifest import Manifest
from geotiff_tiler_spark.sources import pages
from geotiff_tiler_spark.streaming import ingest

P = TilingParams(label_threshold=None)


def test_windowed_cell_counts_stream(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream1"))
    src = f"{base}/src"
    pages.synth_pages(spark, 300).write.parquet(src)
    stream = ingest.read_pages_stream(spark, src)
    assert stream.isStreaming
    agg = ingest.windowed_cell_counts(stream, P, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("cellcounts")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{base}/ckpt")
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM cellcounts")
    # append mode emits only watermark-closed windows; with availableNow the
    # final watermark closes all but the trailing window(s)
    batch = ingest.windowed_cell_counts(
        spark.read.parquet(src), P, window="1 hour", watermark="2 hours"
    )
    assert got.count() > 0
    # every emitted row must match the batch computation exactly
    j = got.join(
        batch.withColumnRenamed("n_pages", "n_batch"),
        ["win_start", "win_end", "image_id"],
        "left",
    )
    assert j.filter((F.col("n_batch").isNull()) | (F.col("n_pages") != F.col("n_batch"))).count() == 0


def test_foreach_batch_idempotent(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream2"))
    src = f"{base}/src"
    pages.synth_pages(spark, 200).write.parquet(src)
    out_dir, mf_dir = f"{base}/out", f"{base}/mf"
    fn = ingest.foreach_batch_tiler(P, out_dir, mf_dir)

    batch = spark.read.parquet(src)
    fn(batch, 0)
    m = Manifest(spark, mf_dir)
    n1 = m.completed_patches().count()
    assert n1 > 0
    # replayed micro-batch (same data, e.g. after a failure) is a no-op
    fn(batch, 0)
    assert m.completed_patches().count() == n1
    tiles = spark.read.parquet(f"{out_dir}/tiles")
    assert tiles.count() == n1  # no duplicate rows in the sink either


def test_multimodal_features(spark):
    media = mm.synth_media(spark, 30)
    rows = media.collect()
    assert {r.kind for r in rows} == {"image", "audio", "video"}
    assert all(len(bytes(r.payload)) >= 1024 for r in rows)
    feats = mm.extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r.feat) == mm.FEAT_DIM
        hist = r.feat[8:16]
        assert abs(sum(hist) - 1.0) < 1e-5  # normalized histogram
    # determinism
    feats2 = mm.extract_features(mm.synth_media(spark, 30)).collect()
    assert sorted((r.media_id, tuple(r.feat)) for r in feats2) == sorted(
        (r.media_id, tuple(r.feat)) for r in feats
    )


def test_multimodal_frame_sample(spark):
    media = mm.synth_media(spark, 30)
    frames = mm.frame_sample(media, every=8)
    rows = frames.collect()
    assert rows and all(r.frame_idx % 8 == 0 and r.frame_idx < r.n_frames for r in rows)


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image_real(b"", {})


def test_stateful_image_stats(spark, tmp_path_factory):
    import numpy as np

    base = str(tmp_path_factory.mktemp("stream3"))
    src = f"{base}/src"
    pg = pages.synth_pages(spark, 400)
    pg.write.parquet(src)
    stream = ingest.read_pages_stream(spark, src)
    agg = ingest.stateful_image_stats(stream, P)
    q = (
        agg.writeStream.format("memory")
        .queryName("imgstats")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{base}/ckpt")
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.image_id: (r.n, r.mean_px, r.std_px)
        for r in spark.sql(
            "SELECT * FROM imgstats"
        ).collect()
    }
    assert got
    # oracle: batch computation of the same running stats
    from geotiff_tiler_spark.operators.tiling import doc_points

    pts = doc_points(spark.read.parquet(src), P).select("image_id", "px").toPandas()
    for image_id, grp in pts.groupby("image_id"):
        px = grp["px"].to_numpy(dtype=float)
        n, mean = len(px), px.mean()
        std = float(np.sqrt(max((px * px).mean() - mean * mean, 0.0)))
        assert got[image_id][0] == n
        assert abs(got[image_id][1] - round(mean, 6)) < 1e-9
        assert abs(got[image_id][2] - round(std, 6)) < 1e-9


def test_streaming_exact_dedup(spark, tmp_path_factory):
    """First-seen-wins on the text digest with watermark-bounded state:
    the synthetic pages table clones text at doc_id % 17 == 16, so the
    streaming output must keep exactly one row per distinct text (all
    events share one micro-batch here, well inside the horizon)."""
    base = str(tmp_path_factory.mktemp("stream3"))
    src = f"{base}/src"
    pages.synth_pages(spark, 400).write.parquet(src)
    stream = ingest.read_pages_stream(spark, src)
    dd = ingest.streaming_exact_dedup(stream, watermark="2 hours")
    q = (
        dd.writeStream.format("memory")
        .queryName("dedupstream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{base}/ckpt")
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedupstream")
    n_distinct = (
        spark.read.parquet(src).select(F.md5("text")).distinct().count()
    )
    assert got.count() == n_distinct
    # one row per digest, and schema passes through unchanged
    assert got.select(F.md5("text")).distinct().count() == n_distinct
    assert set(got.columns) == set(spark.read.parquet(src).columns)

"""The data-bound scale workload used for the N vs 4N scaling evidence.

The correctness suite at sf0.1 is dominated by fixed per-stage overheads
(hundreds of ms per stage on sub-MB inputs), which makes strong-scaling
measurements meaningless. This job synthesizes the north-rule pages table
at millions of rows (sources/pages.synth_pages — pure JVM codegen, no I/O)
and runs the engine's load-bearing operators end-to-end:

  1. extract_text from html (the per-url invariant path)
  2. geocode + cell/pixel encode + stride-grid tiling + F1 filter + split
  3. point-in-box spatial join against a synthesized label layer
  4. MinHash + LSH candidate pairs on a 1/8 subset
  5. exact dedup groups

Throughput metric = (tiles + join output rows) / sec — the BASELINE.json
metric shape. All stages are shuffle-light: the tiling aggregate and the
dedup aggregates are partial+final hash aggs; the spatial join is a cell
equi-join; minhash is explode + hash agg.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from geotiff_tiler_spark.operators import dedup, spatial_join, tiling
from geotiff_tiler_spark.operators.tiling import TilingParams
from geotiff_tiler_spark.sources import labels, pages

SCALE_PARAMS = TilingParams(
    image_res=6,  # 4096 x 4096 potential cells -> thousands of images
    width=448,
    height=448,
    patch_w=112,
    patch_h=112,
    stride=None,
    discard_empty=True,
    label_threshold=None,
    grid_size=4,
    val_ratio=0.2,
)


def run_scale_workload(
    spark: SparkSession,
    n_pages: int,
    n_boxes: int = 20000,
    n_malformed: int | None = None,
) -> dict:
    t_gen0 = time.time()
    if n_malformed is None:
        n_malformed = max(n_pages // 1000, 3)
    pg = pages.synth_pages(spark, n_pages).unionByName(
        pages.synth_malformed_pages(spark, n_pages, n_malformed)
    )
    # S7 validation under load: malformed rows (appended AFTER the valid id
    # range, so the valid rows — and the parity keys — are untouched) are
    # quarantined as data before any downstream stage sees them
    from geotiff_tiler_spark.sources import checks

    validated = checks.validate_pages(
        pg.withColumn("text", pages.extract_text("html"))
    )
    valid, quarantine = checks.split_quarantine(validated)
    n_quarantined = quarantine.count()
    assert n_quarantined == n_malformed, (n_quarantined, n_malformed)
    docs = valid.select("doc_id", "text", "lang").persist()
    docs.count()  # materialize: stands in for the one storage scan of the
    # input table (downstream subtrees would otherwise re-run the generator)
    t0 = time.time()
    sec_gen = round(t0 - t_gen0, 2)

    # tiling pipeline (geocode runs md5 over extracted text — data-bound)
    pts = tiling.doc_points(docs, SCALE_PARAMS)
    tiles = tiling.kept_tiles(pts, SCALE_PARAMS)
    split = tiling.assign_split(tiles, SCALE_PARAMS, validation_cells=None)
    n_tiles = split.count()
    t_tiles = time.time()

    # spatial join: synthesized label boxes over a range table
    sup = spark.range(n_boxes).withColumnRenamed("id", "s_suppkey")
    boxes = labels.label_boxes(sup)
    hits = spatial_join.point_in_box_join(
        pts.select("doc_id", "lon", "lat"), boxes, SCALE_PARAMS.image_res
    )
    n_hits = hits.count()
    t_join = time.time()

    # dedup ladder on a contiguous subset (keeps the synthetic (id, id-1)
    # duplicate pairs intact; a modulo sample would separate them)
    sub = docs.filter(F.col("doc_id") < n_pages // 8)
    sigs = dedup.minhash_signature(sub)
    pairs = dedup.lsh_candidate_pairs(dedup.lsh_buckets(sigs))
    n_pairs = pairs.count()
    t_lsh = time.time()
    n_groups = dedup.exact_dedup_groups(docs).count()
    t_dedup = time.time()

    docs.unpersist()
    total = t_dedup - t0
    out_rows = n_tiles + n_hits + n_pairs
    return {
        "sec_gen": sec_gen,
        "n_pages": n_pages,
        "quarantined": n_quarantined,
        "tiles": n_tiles,
        "join_rows": n_hits,
        "lsh_pairs": n_pairs,
        "dedup_groups": n_groups,
        "sec_tiling": round(t_tiles - t0, 2),
        "sec_join": round(t_join - t_tiles, 2),
        "sec_dedup": round(t_dedup - t_join, 2),
        "sec_dedup_lsh": round(t_lsh - t_join, 2),
        "sec_dedup_exact": round(t_dedup - t_lsh, 2),
        "sec_total": round(total, 2),
        "tiles_join_rows_per_sec": round(out_rows / total, 1),
    }


def synth_embeddings(spark: SparkSession, n: int, dim: int | None = None):
    """n deterministic embedding rows (vec_id, embedding: array<double> in
    [-1, 1)) — pure JVM codegen, no I/O; the embedding analog of
    synth_pages for ≥1 M-row similarity stages."""
    from geotiff_tiler_spark.operators.similarity import EMB_DIM

    dim = dim or EMB_DIM
    df = spark.range(n).withColumnRenamed("id", "vec_id")
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            F.pmod(F.xxhash64(F.col("vec_id"), j, F.lit("emb")), F.lit(1 << 20))
        ).cast("double")
        / F.lit(float(1 << 19))
        - F.lit(1.0),
    )
    return df.select("vec_id", emb.alias("embedding"))


def _warm_session(spark, warm_rows: int = 50_000) -> None:
    """Untimed JVM/worker warmup for the similarity stage runners — the
    exact analog of ``bench.run_headline``'s warmup queries, scaled to the
    operators these stages exercise. A COLD local session pays one-time
    costs that are NOT the operator's: Janino compilation + JIT of the
    wide flat-expression codegen methods, the spawn + numpy import of all
    32 Python UDF workers, and — dominant on this VM, where fresh pages
    first-touch at ~70 MB/s — the first commit of JVM heap/Arrow/shuffle
    memory. Profiled at 1M rows: the identical topk plan runs 26-50 s on
    first execution and ~10 s on the next, same session, same data, steal
    < 2% throughout. A long-running cluster executor (the thing the 100-TB
    number predicts) is always warm, so the stage runners warm up on a
    small slice (5% of the corpus, full operator chain: UDF assign +
    probes join + cosine + window) and start the clock after."""
    from geotiff_tiler_spark.operators import similarity

    wemb = synth_embeddings(spark, warm_rows)
    wcent = similarity.train_ivf_centroids(
        wemb, n_clusters=96, sample=2048
    )  # >64 lists: same Arrow-UDF branch as the measured stage
    similarity.ivf_topk(
        wemb, k=5, query_mod=warm_rows // 50, n_clusters=96, nprobe=2,
        n=warm_rows, centroids=wcent,
    ).count()


def _warm_session_pq(spark, warm_rows: int = 50_000) -> None:
    """PQ twin of _warm_session: same one-time costs, exercised through
    the PQ operators (codebook train + the mapInArrow corpus scan +
    bounded final window) on a 5% slice, untimed."""
    from geotiff_tiler_spark.operators import similarity

    wemb = synth_embeddings(spark, warm_rows)
    wbooks = similarity.pq_train_codebooks(wemb, sample=2048)
    similarity.pq_topk(
        wemb, k=5, query_mod=warm_rows // 50, books=wbooks
    ).count()


def run_ivf_stage(
    spark: SparkSession,
    n_rows: int = 1_000_000,
    query_mod: int = 1000,
    persist: bool = False,
    warm: bool = True,
) -> dict:
    """Measured number for the >64-list IVF branch (round-3 VERDICT task 6):
    at n_rows >= 1 M the adaptive list count is 4*sqrt(n) = 4000 > 64, so
    ivf_assign and the query probes take the broadcast-numpy Arrow-UDF
    path (similarity.py IVF_EXPR_MAX_LISTS). Returns timings + counts.

    Two timed phases (round-4 VERDICT 'What's wrong #1' fixes):
      train — driver k-means on the bounded 32k sample;
      topk  — ONE fused corpus pass (assignment UDF + norm in a single
              projection — the asNondeterministic marker stops Catalyst
              re-evaluating the UDF below the join's isnotnull filter)
              feeding the probe join (probes force-broadcast: the corpus
              never moves) + flat-expression cosine + per-query window.
    One-time session warmup (JIT, worker spawn, heap first-touch) runs
    UNTIMED on a 50k slice first — see _warm_session; run_headline does
    the same for the sf0.1 suite.

    The index is deliberately NOT persisted/written here: on this VM
    caching 1M deserialized array rows costs 120-160 s to materialize and
    the cache READ of wide array rows is slower than regenerating the
    pure-codegen generator (profiled: the one-pass index build reads
    0.8 s unpersisted vs 1.6 s from cache), so persist defaults to
    False — kept as an A/B knob. At 100 TB the index IS written
    (similarity.ivf_write_index: cluster-partitioned parquet, probe scans
    dynamic-partition-pruned); local-mode storage would measure the VM's
    allocator, not the operator."""
    from geotiff_tiler_spark.operators import similarity

    emb = synth_embeddings(spark, n_rows)
    if persist:
        emb = emb.persist()
        emb.count()  # materialize: stage times the IVF work, not the generator
    if warm:
        _warm_session(spark)
    t0 = time.time()
    nlist = similarity.adaptive_ivf_clusters(n_rows)
    cent = similarity.train_ivf_centroids(emb, n_clusters=nlist)
    t_train = time.time()
    index = similarity.ivf_build_index(emb, cent)
    topk = similarity.ivf_topk(
        emb, k=5, query_mod=query_mod, n_clusters=nlist, nprobe=2, n=n_rows,
        centroids=cent, index=index,
    )
    n_out = topk.count()
    t1 = time.time()
    sec = round(t1 - t0, 2)
    if persist:
        emb.unpersist()
    return {
        "n_rows": n_rows,
        "nlist": nlist,
        "udf_path": nlist > 64,
        "topk_rows": n_out,
        "sec_train": round(t_train - t0, 2),
        "sec_topk": round(t1 - t_train, 2),
        "sec": sec,
        "rows_per_sec": round(n_rows / sec, 1) if sec > 0 else None,
        "persist": persist,
        "warm": warm,
    }


def run_pq_stage(
    spark: SparkSession,
    n_rows: int = 1_000_000,
    query_mod: int = 1000,
    persist: bool = False,
    warm: bool = True,
) -> dict:
    """Measured number for the PQ (product-quantization) ANN path at the
    same 1M-row scale as run_ivf_stage — the compressed-corpus
    alternative: the corpus never materializes a float index at all; one
    mapInPandas pass encodes each partition to 8-byte codes and emits the
    exact per-partition (adc, id)-lexicographic top-k per query.

    Two timed phases, mirroring the IVF stage:
      train — per-subspace k-means codebooks on the bounded sorted sample
              (m=8 subspaces x ksub=16 centroids x 8 dims: ~100x less
              driver arithmetic than IVF's 4000-list k-means);
      topk  — the single corpus pass + the bounded final window
              (n_partitions x k rows per query).
    One-time session warmup (JIT, worker spawn, heap first-touch) runs
    UNTIMED on a 50k slice first — see _warm_session_pq; persist defaults
    to False for the same measured reason as run_ivf_stage (cache READ of
    wide array rows loses to regenerating the pure-codegen synth)."""
    from geotiff_tiler_spark.operators import similarity

    emb = synth_embeddings(spark, n_rows)
    if persist:
        emb = emb.persist()
        emb.count()  # materialize: stage times the PQ work, not the generator
    if warm:
        _warm_session_pq(spark)
    t0 = time.time()
    books = similarity.pq_train_codebooks(emb)
    t_train = time.time()
    topk = similarity.pq_topk(emb, k=5, query_mod=query_mod, books=books)
    n_out = topk.count()
    t1 = time.time()
    sec = round(t1 - t0, 2)
    if persist:
        emb.unpersist()
    return {
        "n_rows": n_rows,
        "m": similarity.PQ_M,
        "ksub": similarity.PQ_KSUB,
        "topk_rows": n_out,
        "sec_train": round(t_train - t0, 2),
        "sec_topk": round(t1 - t_train, 2),
        "sec": sec,
        "rows_per_sec": round(n_rows / sec, 1) if sec > 0 else None,
        "persist": persist,
        "warm": warm,
    }


def _warm_session_ivfpq(spark, warm_rows: int = 50_000, nlist: int = 4000) -> None:
    """IVF-PQ twin of _warm_session: exercises both Arrow-UDF paths the
    measured stage uses (fused assign+pack projection, probe UDF, ADC
    UDF) plus the probe join and the bounded window, on a 5% slice,
    untimed — same one-time JIT/worker-spawn/heap-first-touch rationale.

    Warms at the PRODUCTION list count: _nearest_centroids caches its
    (chunk, nlist) scratch per (nlist, dtype) key, so a 96-list warmup
    leaves every worker's 4000-wide block to first-touch INSIDE the
    measured window (~32 MB/worker at ~70 MB/s on this VM). The warm
    centroids are seeded noise — assignment quality is irrelevant to
    buffer/JIT warmup — while the codebooks are really trained (cheap)."""
    import numpy as np

    from geotiff_tiler_spark.operators import similarity

    wemb = synth_embeddings(spark, warm_rows)
    wcent = np.random.RandomState(0).randn(nlist, similarity.EMB_DIM)
    wbooks = similarity.pq_train_codebooks(wemb, sample=2048)
    similarity.ivfpq_topk(
        wemb, k=5, query_mod=warm_rows // 50, n_clusters=nlist, nprobe=2,
        n=warm_rows, centroids=wcent, books=wbooks,
    ).count()


def run_ivfpq_stage(
    spark: SparkSession,
    n_rows: int = 1_000_000,
    query_mod: int = 1000,
    warm: bool = True,
) -> dict:
    """Measured number for the composed IVF-PQ path at the same 1M-row
    scale as run_ivf_stage / run_pq_stage — the shape that holds at
    10^12 rows: IVF prunes the corpus to nprobe/nlist per query AND the
    probe join's corpus side is 8-byte codes instead of 64-double
    vectors, so the one corpus pass (assign + encode in a single
    projection) is the only place a float vector ever exists.

    Two timed phases, mirroring the component stages:
      train — the 4000-list coarse k-means plus the m=8 x ksub=16
              codebooks, both on the shared bounded sorted sample;
      topk  — the fused assign+encode corpus pass feeding the
              force-broadcast probe join, the candidates-only ADC
              projection, and the bounded per-query window.
    Same untimed session warmup and no-persist reasoning as the
    component stages (_warm_session_ivfpq / run_ivf_stage docstring)."""
    from geotiff_tiler_spark.operators import similarity

    emb = synth_embeddings(spark, n_rows)
    nlist = similarity.adaptive_ivf_clusters(n_rows)
    if warm:
        _warm_session_ivfpq(spark, nlist=nlist)
    t0 = time.time()
    cent = similarity.train_ivf_centroids(emb, n_clusters=nlist)
    books = similarity.pq_train_codebooks(emb)
    t_train = time.time()
    topk = similarity.ivfpq_topk(
        emb, k=5, query_mod=query_mod, n_clusters=nlist, nprobe=2, n=n_rows,
        centroids=cent, books=books,
    )
    n_out = topk.count()
    t1 = time.time()
    sec = round(t1 - t0, 2)
    return {
        "n_rows": n_rows,
        "nlist": nlist,
        "m": similarity.PQ_M,
        "ksub": similarity.PQ_KSUB,
        "topk_rows": n_out,
        "sec_train": round(t_train - t0, 2),
        "sec_topk": round(t1 - t_train, 2),
        "sec": sec,
        "rows_per_sec": round(n_rows / sec, 1) if sec > 0 else None,
        "warm": warm,
    }


def synth_crawl(spark: SparkSession, n_pages: int):
    """n_pages deterministic crawl rows in the documents-table shape the
    URL tier consumes (doc_id, text, lang, source, n_chars) — pure JVM
    codegen from range(), no I/O; text is a short per-row hash string so
    md5-digest work in revisit_churn is data-bound but not text-volume-
    bound (the URL tier's cost is per-ROW, not per-byte)."""
    return spark.range(n_pages).selectExpr(
        "id AS doc_id",
        "CAST(xxhash64(id, 7) AS STRING) AS text",
        "'en' AS lang",
        "'web' AS source",
    ).withColumn("n_chars", F.length("text").cast("long"))


def run_urlgraph_stage(
    spark: SparkSession, n_pages: int = 8_000_000, warm: bool = True
) -> dict:
    """Measured throughput for the URL/graph curation tier (q66-q70) at
    the scale-workload page count. Four phases, each a full corpus pass
    over pure-codegen input (so the numbers are the operators' own):

      url      canonicalization + per-host dup stats (q66 shape)
      snap     latest-snapshot struct-max collapse (q67)
      graph    host-edge collapse + 4-iteration integer PageRank (q69)
      churn    top-2 collect_list revisit/churn rollup (q70)

    Two more phases (q71 page cap, q72 reciprocity) are timed
    SEPARATELY and excluded from `sec`/`pages_per_sec`, so samples
    recorded before they existed stay pool-comparable with new ones
    (same rule that keeps the N-vs-4N pool honest).

    DELIBERATELY SEPARATE from run_scale_workload: the N-vs-4N scaling
    gate's sample pool asserts output parity across pooled commits, so
    its timed path stays frozen; this stage gets its own sampler
    (tools/bench_urlgraph_sample.py -> BENCH/urlgraph_samples.jsonl)."""
    from geotiff_tiler_spark.functions import url as U
    from geotiff_tiler_spark.operators import crawl, graph

    if warm:
        # one-time session costs (JIT of the wide canonicalization
        # codegen, heap first-touch — see _warm_session) on a 5% slice,
        # untimed: 8M cold 43.6 s vs warm 9.6 s on identical plans
        run_urlgraph_stage(spark, max(n_pages // 20, 6000), warm=False)
    docs = synth_crawl(spark, n_pages)
    t0 = time.time()
    n_hosts = crawl.url_host_stats(docs).count()
    t_url = time.time()
    kept = crawl.latest_snapshot(docs)
    n_kept = kept.count()
    t_snap = time.time()
    edges = crawl.distinct_host_edges(
        crawl.latest_snapshot(docs).select("kept_doc")
    )
    universe = (
        edges.selectExpr("src AS h").union(edges.selectExpr("dst AS h"))
        .distinct()
    )
    pr = graph.pagerank_nano(edges, universe, U.N_URL_HOSTS, 4)
    pr_mass = pr.agg(F.sum("pr")).collect()[0][0]
    t_graph = time.time()
    n_churn = crawl.revisit_churn(docs).count()
    t_churn = time.time()
    total = t_churn - t0
    # post-total phases (see docstring): q71 cap + q72 reciprocity
    cap = crawl.host_page_cap(kept, 2).agg(F.sum("n_kept")).collect()[0][0]
    t_cap = time.time()
    recip = (
        crawl.host_reciprocity(crawl.latest_snapshot(docs).select("kept_doc"))
        .agg(F.sum("n_recip")).collect()[0][0]
    )
    t_recip = time.time()
    return {
        "n_pages": n_pages,
        "hosts": n_hosts,
        "kept_pages": n_kept,
        "pr_mass_nano": pr_mass,
        "churn_hosts": n_churn,
        "sec_url": round(t_url - t0, 2),
        "sec_snapshot": round(t_snap - t_url, 2),
        "sec_graph_pr": round(t_graph - t_snap, 2),
        "sec_churn": round(t_churn - t_graph, 2),
        "sec_cap": round(t_cap - t_churn, 2),
        "sec_recip": round(t_recip - t_cap, 2),
        "cap_kept": cap,
        "recip_total": recip,
        "sec": round(total, 2),
        # every phase is one full corpus pass (graph's collapse included)
        "pages_per_sec": round(4 * n_pages / total, 1) if total > 0 else None,
        "warm": warm,
    }

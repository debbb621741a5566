"""Physical-plan assertions: the optimizations SURVEY §4 promises must
actually appear in the executed plans (pushdown, pruning, broadcast,
whole-stage codegen, partition pruning on the output layout)."""

from pyspark.sql import functions as F

from geotiff_tiler_spark.operators.tiling import TilingParams, doc_points

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = docs.filter(F.col("doc_id") > 100).select("doc_id", "lang")
    plan = _plan(q)
    assert "PushedFilters" in plan and "GreaterThan(doc_id,100)" in plan


def test_column_pruning_reaches_parquet_scan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = docs.select("doc_id")
    plan = _plan(q)
    # ReadSchema must NOT include the wide text column
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "text" not in read_schema[0]


def test_geocode_stage_fuses_into_codegen(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pts = doc_points(docs, TilingParams())
    plan = _plan(pts)
    # executedPlan().toString() marks whole-stage-codegen spans with "*(n)"
    assert plan.lstrip().startswith("*(")
    # no shuffle: the geocode/cell/pixel stage must be narrow
    assert "Exchange" not in plan


def test_small_dim_join_broadcasts(spark):
    import __spark_entry__ as e

    q = e.q19_top_customers(spark, SF)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan


def test_antijoin_resume_is_join_not_collect(spark):
    from geotiff_tiler_spark.plans.manifest import Manifest

    import tempfile

    m = Manifest(spark, tempfile.mkdtemp(prefix="mfplan-"))
    tiles = spark.createDataFrame(
        [(1, 0, 0)], "image_id long, tile_x long, tile_y long"
    )
    pending = m.filter_pending(tiles)
    assert "LeftAnti" in _optimized(pending)


def test_split_partition_pruning_on_output(spark, docs, tmp_path_factory):
    from geotiff_tiler_spark.operators import tiling
    from geotiff_tiler_spark.plans.pipeline import create_tiles

    base = str(tmp_path_factory.mktemp("prune"))
    p = TilingParams(label_threshold=None)
    create_tiles(spark, docs, p, f"{base}/out", f"{base}/mf")
    out = spark.read.parquet(f"{base}/out/tiles").filter(F.col("split") == "val")
    plan = _plan(out)
    # manifest-as-index read path (reference visualization.py:43-58) ->
    # partition pruning: the split filter must become a PartitionFilters
    # entry on the scan, not a post-scan Filter
    assert "PartitionFilters" in plan and "split" in plan.split("PartitionFilters", 1)[1][:200]


def test_lsh_self_join_reuses_exchange(spark):
    from geotiff_tiler_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = dedup.minhash_signature(docs)
    pairs = dedup.lsh_candidate_pairs(dedup.lsh_buckets(sigs))
    pairs.count()  # AQE finalizes the plan only after execution
    plan = _plan(pairs)
    # two acceptable physical strategies for the bucket self-join:
    # - big data: shuffle join with the signature exchange REUSED on both sides
    # - small data (AQE decision): broadcast one side (recompute is cheaper
    #   than a shuffle at this size)
    assert "ReusedExchange" in plan or "BroadcastHashJoin" in plan


def test_point_in_box_join_broadcasts_small_side(spark):
    import __spark_entry__ as e

    q = e.q23_point_in_box(spark, SF)
    q.count()  # let AQE finalize
    plan = _plan(q)
    # the exploded label-box side is small -> AQE should broadcast it
    assert "BroadcastHashJoin" in plan or "BroadcastQueryStage" in plan


def test_jaccard_refine_semi_join_prunes_before_explode(spark):
    """Round-3 VERDICT item 1: the refine stage's shingle explode must sit
    ABOVE a left-semi prune of the corpus against the candidate-pair ids —
    never explode the whole corpus to verify a sliver of it."""
    from geotiff_tiler_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = dedup.minhash_signature(docs)
    pairs = dedup.lsh_candidate_pairs(dedup.lsh_buckets(sigs))
    refined = dedup.ngram_jaccard_pairs(docs, pairs, materialize=False)
    plan = _optimized(refined)
    assert "LeftSemi" in plan
    # the semi join must appear below (after, in tree order) at least one
    # Generate (explode) — i.e., some explode consumes the pruned side
    gen_idx = plan.find("Generate explode")
    semi_idx = plan.find("LeftSemi")
    assert gen_idx != -1 and semi_idx != -1 and semi_idx > gen_idx


def test_point_in_box_join_has_no_dedup_shuffle(spark):
    """Round-4: a (point, box) pair meets in at most one cell row, so the
    join output needs no distinct — the plan must contain NO aggregate
    above the join (the old output-sized dedup shuffle held the scale
    workload's join stage to 1.26x scaling at 8->32 cores)."""
    from geotiff_tiler_spark.operators.spatial_join import point_in_box_join
    from geotiff_tiler_spark.sources.labels import label_boxes

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pts = doc_points(docs, TilingParams()).select("doc_id", "lon", "lat")
    sup = spark.range(50).withColumnRenamed("id", "s_suppkey")
    hits = point_in_box_join(pts, label_boxes(sup), res=4)
    plan = _optimized(hits)
    assert "Join" in plan
    assert "Aggregate" not in plan and "Deduplicate" not in plan


def test_bounded_topk_has_no_single_partition_window(spark):
    """Round-4 VERDICT item 2: q42's top-k must never window by `lang`
    alone (cardinality 4 -> one task sorts the whole per-language
    vocabulary slice at scale). The two-stage plan windows by
    (lang, _bk) first; assert every window partition spec includes the
    bucket column, and that output matches the single-window form."""
    import __spark_entry__ as e

    q = e.q42_top_bigrams(spark, SF)
    plan = _optimized(q)
    # two Window nodes: partial (lang, _bk) and final over <=bk*10 rows
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    # the widest (partial) spec must carry the bucket column
    assert any("_bk" in s for s in specs), specs

    # output parity vs the plain single-window formulation
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from geotiff_tiler_spark.functions import text as T

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    grams = docs.select("lang", F.explode(T.shingles("text", 2)).alias("bigram"))
    cnt = grams.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram").asc())
    want = sorted(
        map(
            tuple,
            cnt.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= 10)
            .select("lang", "rank", "bigram", "n")
            .collect(),
        )
    )
    got = sorted(map(tuple, q.collect()))
    assert got == want


def test_ivf_topk_broadcasts_probes_and_evals_assign_once(spark):
    """Round-4 VERDICT item 1: the IVF probe join must broadcast the
    (queries x nprobe) probes side — never the corpus — and the corpus
    assignment UDF must appear in the plan exactly ONCE (the isnotnull
    join-key filter used to re-evaluate it below the projection)."""
    from geotiff_tiler_spark.operators import similarity
    from geotiff_tiler_spark.plans.scale_job import synth_embeddings

    emb = synth_embeddings(spark, 5000)
    cent = similarity.train_ivf_centroids(emb, n_clusters=128)
    index = similarity.ivf_build_index(emb, cent)
    tk = similarity.ivf_topk(
        emb, k=5, query_mod=100, n_clusters=128, nprobe=2, n=5000,
        centroids=cent, index=index,
    )
    plan = _plan(tk)
    assert plan.count("ArrowEvalPython [_assign") == 1, plan
    # BuildLeft = the probes side (left input of the join) is broadcast
    assert "BroadcastHashJoin" in plan and "BuildLeft" in plan, plan


def test_pq_topk_final_window_input_is_bounded(spark):
    """q44's final window must rank ONLY the mapInArrow partial top-k
    output (n_partitions x k rows per query) — the plan's window sits
    directly above the Python scan stage, and no corpus-sized join or
    explode feeds it."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    from geotiff_tiler_spark.operators import similarity

    tk = similarity.pq_topk(emb, k=3, query_mod=40)
    plan = _plan(tk)
    # one Python corpus pass (Arrow-native, no pandas conversion), no
    # join anywhere in the query
    assert plan.count("MapInArrow") == 1, plan
    assert "Join" not in plan, plan
    # the window ranks the Python stage's bounded output (an exchange on
    # query_id between them is fine - it moves partitions x k rows)
    assert "RunningWindowFunction" in plan or "Window" in plan, plan


def test_ivfpq_topk_plan_shape(spark):
    """The composed IVF-PQ plan must show: ONE fused corpus UDF
    (assign + pack in a single ArrowEvalPython — the embedding crosses
    Arrow once), the probes side broadcast (BuildLeft), the ADC UDF
    consuming only (query_id, pq_code) — no q_vec column above the join —
    and a partial WindowGroupLimit below the final window's exchange."""
    from geotiff_tiler_spark.operators import similarity
    from geotiff_tiler_spark.plans.scale_job import synth_embeddings

    emb = synth_embeddings(spark, 5000)
    cent = similarity.train_ivf_centroids(emb, n_clusters=128)
    books = similarity.pq_train_codebooks(emb)
    tk = similarity.ivfpq_topk(
        emb, k=5, query_mod=100, n_clusters=128, nprobe=2, n=5000,
        centroids=cent, books=books,
    )
    plan = _plan(tk)
    assert plan.count("ArrowEvalPython [_both") == 1, plan
    assert "BroadcastHashJoin" in plan and "BuildLeft" in plan, plan
    # the ADC projection reads the 16-byte candidate row, never the vector
    assert plan.count("ArrowEvalPython [_adc") == 1, plan
    adc_seg = plan[plan.index("ArrowEvalPython [_adc"):]
    assert "q_vec" not in adc_seg.split("\n")[0], plan
    assert "WindowGroupLimit" in plan, plan


def test_duplicate_clusters_rounds_are_bounded_joins(spark):
    """q45's propagation round is one equi-join + partial/final min agg on
    the EDGE-sized frame; lineage is cut by lazy localCheckpoint so the
    per-round plan never re-derives prior rounds (no exponential plan
    growth across rounds)."""
    from geotiff_tiler_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    out = dedup.duplicate_clusters(pairs, max_rounds=3)
    plan = _optimized(out)
    # the returned frame's lineage starts at the checkpointed labels scan,
    # not at the original pairs: no Union-of-rounds pyramid in the plan
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan, plan
    assert plan.count("Join") <= 1, plan


def test_written_ivf_index_scan_is_partition_pruned(spark, tmp_path_factory):
    """The 100-TB written-index path: the probe join against a
    cluster-partitioned index table must (a) return exactly the in-memory
    index's results, and (b) carry a dynamic-partition-pruning filter on
    the index scan — the corpus read is nprobe/nlist of the table, not a
    full scan."""
    from geotiff_tiler_spark.operators import similarity
    from geotiff_tiler_spark.plans.scale_job import synth_embeddings

    emb = synth_embeddings(spark, 5000)
    cent = similarity.train_ivf_centroids(emb, n_clusters=128)
    path = str(tmp_path_factory.mktemp("ivfidx") / "index")
    similarity.ivf_write_index(similarity.ivf_build_index(emb, cent), path)

    table = similarity.ivf_read_index(spark, path)
    tk = similarity.ivf_topk(
        emb, k=5, query_mod=100, n_clusters=128, nprobe=2, n=5000,
        centroids=cent, index=table,
    )
    plan = _plan(tk)
    assert "dynamicpruning" in plan.lower(), plan
    mem = similarity.ivf_topk(
        emb, k=5, query_mod=100, n_clusters=128, nprobe=2, n=5000,
        centroids=cent, index=similarity.ivf_build_index(emb, cent),
    )
    assert sorted(map(tuple, tk.collect())) == sorted(map(tuple, mem.collect()))


def test_written_ivfpq_index_scan_is_partition_pruned(spark, tmp_path_factory):
    """The written IVF-PQ index (24-byte rows, cluster-partitioned) must
    (a) reproduce the in-memory index's results exactly and (b) carry a
    dynamic-partition-pruning filter on its scan — a probe reads
    nprobe/nlist of the table."""
    from geotiff_tiler_spark.operators import similarity
    from geotiff_tiler_spark.plans.scale_job import synth_embeddings

    emb = synth_embeddings(spark, 5000)
    cent = similarity.train_ivf_centroids(emb, n_clusters=128)
    books = similarity.pq_train_codebooks(emb)
    path = str(tmp_path_factory.mktemp("ivfpqidx") / "index")
    similarity.ivfpq_write_index(
        similarity.ivfpq_build_index(emb, cent, books), path
    )

    table = similarity.ivfpq_read_index(spark, path)
    tk = similarity.ivfpq_topk(
        emb, k=5, query_mod=100, n_clusters=128, nprobe=2, n=5000,
        centroids=cent, books=books, index=table,
    )
    plan = _plan(tk)
    assert "dynamicpruning" in plan.lower(), plan
    mem = similarity.ivfpq_topk(
        emb, k=5, query_mod=100, n_clusters=128, nprobe=2, n=5000,
        centroids=cent, books=books,
    )
    assert sorted(map(tuple, tk.collect())) == sorted(map(tuple, mem.collect()))


def test_lsh_greedy_keep_has_no_join(spark):
    """q50's scale contract: greedy LSH keep is O(corpus x bands) — one
    window shuffle by (band, bucket) + one agg by doc — and must never
    materialize candidate pairs: NO join of any kind in the plan (the
    pairwise chain q11/q45 is the O(sum bucket^2) alternative)."""
    from geotiff_tiler_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(dedup.lsh_greedy_keep(docs))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    # the bucket-min is a window, the all-bands-won is a hash aggregate
    assert "Window" in plan and "HashAggregate" in plan


def test_source_jsd_scans_corpus_once(spark):
    """q65's scale contract: the ONLY corpus-sized pass is the first
    explode+aggregate into per-(source, token) counts. The count table
    fans out to three consumers (totals, vocab, grid join) and the
    zero-filled grid feeds BOTH sides of the pair self-join — without
    materialization Catalyst re-derives each branch and the plan scans
    the corpus six times. With materialize=True both bounded
    intermediates are localCheckpointed: exactly one parquet scan of
    documents may remain anywhere in the plan."""
    from geotiff_tiler_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(dedup.source_jsd(docs))
    assert plan.count("documents.parquet") <= 1, plan
    # and the unmaterialized form really is the six-scan trap (guards the
    # assertion above against a future Catalyst change making it vacuous)
    plan_raw = _plan(dedup.source_jsd(docs, materialize=False))
    assert plan_raw.count("documents.parquet") > 1


def test_bounded_fanout_aggregates_are_materialized(spark):
    """Round-5 scan audit: ops whose bounded aggregate fans out to
    several consumers must localCheckpoint it — otherwise Catalyst
    re-derives every branch and the corpus is scanned 3-6x (no static
    exchange reuse across plan branches). Pin the in-plan parquet scan
    count of each fixed op; the one corpus pass hidden inside the
    checkpoint lineage is not in-plan, so the bound is consumers-only.
    Corpus-sized intermediates (q51/q55 gram rows) follow the opposite
    fused-recompute rule and are NOT expected here."""
    from geotiff_tiler_spark.operators import dedup, quantiles, rank, sampling

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bounds = [
        ("unigram_nll", rank.unigram_nll(docs), 1),  # the join pass
        (
            "bigram_lift",
            rank.bigram_lift_topk(docs, ["lang"]),
            1,  # the bigram-explode pass (token pass is checkpointed)
        ),
        (
            "robust_outlier_gate",
            quantiles.robust_outlier_gate(docs, ["lang"], "n_chars"),
            0,  # everything derives from the checkpointed histogram
        ),
        (
            "mixture_resample",
            sampling.mixture_resample(
                docs, "lang", "doc_id", {"en": 3, "zh": 1, "de": 1, "fr": 1, "es": 1}
            ),
            1,  # the final filter pass (count pass is checkpointed)
        ),
        ("source_jsd", dedup.source_jsd(docs), 1),
    ]
    for name, df, max_scans in bounds:
        plan = _plan(df)
        n = plan.count("documents.parquet")
        assert n <= max_scans, (name, n, max_scans)

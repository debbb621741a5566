"""Web-crawl curation operators over the URL layer (functions/url.py).

The Common-Crawl-style ladder BELOW content dedup, as reusable
DataFrame operators (the q66-q70 contract queries are thin wrappers):

  url_host_stats     canonicalization + per-host re-crawl statistics
  latest_snapshot    keep the newest crawl per canonical URL
  page_link_edges /  host-level link graph from the kept snapshots
    host_graph
  revisit_churn      WARC-revisit semantics: latest vs previous snapshot
  host_page_cap      per-host page cap, newest-first (domain balancing)
  host_reciprocity   mutual-link rate per host (spam-ring signal)
  host_triangles     triangle count + clustering coefficient per host

Scale shapes (the load-bearing claims, each plan-asserted or measured
in plans/scale_job.run_urlgraph_stage):
  - canonicalization is pure codegen'd string expressions — zero UDF,
    zero shuffle before any aggregate;
  - latest_snapshot is ONE struct-max partial+final aggregate (map-side
    combine; SortAggregate because struct max is not hash-aggregable,
    but still partial+final — never a window sort over a hot URL's
    history);
  - the page-level edge stream (N_OUT_LINKS x corpus) collapses by
    (src, dst) in one map-side-combined agg; degrees / contrib joins /
    PageRank run on the graph-sized table only;
  - revisit_churn's top-2 per canonical is one partial+final
    collect_list aggregate whose buffer is bounded by snapshots-per-URL
    (crawl cadence), never corpus-shaped.

Every scalar formula lives in functions/url.py as a shared ``*_sql``
helper so the DuckDB oracles run the identical expressions; argmax /
top-2 / graph aggregation STRUCTURE is deliberately NOT shared — the
oracles use independent window / unrolled-CTE formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import url as U


def url_host_stats(docs: DataFrame) -> DataFrame:
    """q66: canonical-URL collapse + per-host dup statistics."""
    canon = U.canonical_url_sql(U.raw_url_sql("doc_id"))
    d = docs.select(
        "doc_id",
        F.expr(canon).alias("canonical"),
        F.expr(U.host_sql(canon)).alias("host"),
    )
    agg = d.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("canonical").alias("n_canonical"),
        F.min("doc_id").alias("min_doc"),
    )
    return agg.select(
        "host",
        "n_pages",
        "n_canonical",
        F.expr(U.dup_rate_sql()).alias("dup_rate"),
        "min_doc",
    )


def latest_snapshot(docs: DataFrame) -> DataFrame:
    """q67: one struct-max aggregate keeps the newest (warc_ts, doc_id)
    crawl per canonical URL."""
    canon = U.canonical_url_sql(U.raw_url_sql("doc_id"))
    d = docs.select(
        "doc_id",
        F.expr(canon).alias("canonical"),
        F.expr(U.warc_ts_sql("doc_id")).alias("warc_ts"),
    )
    kept = d.groupBy("canonical").agg(
        F.max(F.struct(F.col("warc_ts"), F.col("doc_id"))).alias("_w"),
        F.count(F.lit(1)).alias("n_snapshots"),
    )
    return kept.select(
        "canonical",
        F.expr(U.host_sql("canonical")).alias("host"),
        F.col("_w.doc_id").alias("kept_doc"),
        F.col("_w.warc_ts").alias("kept_ts"),
        "n_snapshots",
    )


def page_link_edges(kept: DataFrame, id_col: str = "kept_doc") -> DataFrame:
    """Page-level (src, dst) host link rows (with multiplicity) from a
    frame of kept page ids."""
    targets = F.array(
        *[F.expr(U.link_target_sql(id_col, j))
          for j in range(1, U.N_OUT_LINKS + 1)]
    )
    return kept.select(
        F.expr(U._dom_sql(id_col)).alias("src"),
        F.explode(targets).alias("dst"),
    )


def distinct_host_edges(kept: DataFrame, id_col: str = "kept_doc") -> DataFrame:
    """DISTINCT (src, dst) host edges — the PageRank input."""
    return (
        page_link_edges(kept, id_col)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_w"))
        .select("src", "dst")
    )


def host_graph(kept: DataFrame, id_col: str = "kept_doc") -> DataFrame:
    """q68: per-host out/in degree, link volume, and closed-form
    1-iteration nano-unit PageRank."""
    host_edges = (
        page_link_edges(kept, id_col)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
        .localCheckpoint(eager=False)  # fans out to out_deg + contrib join
    )
    out_deg = (
        host_edges.groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("out_deg"),
            F.sum("weight").alias("links_out"),
        )
        .localCheckpoint(eager=False)  # fans out to contrib join + final
    )
    contrib = U.intdiv_sql("1000000000", f"{U.N_URL_HOSTS} * out_deg")
    in_agg = (
        host_edges.join(out_deg, "src")
        .groupBy("dst")
        .agg(
            F.count(F.lit(1)).alias("in_deg"),
            F.sum(F.expr(contrib)).alias("contrib_sum"),
        )
    )
    base = U.intdiv_sql("15000000000", f"100 * {U.N_URL_HOSTS}")
    joined = out_deg.withColumnRenamed("src", "h").join(
        in_agg.withColumnRenamed("dst", "h"), "h", "full_outer"
    )
    return joined.select(
        F.expr(U.host_name_sql("h")).alias("host"),
        F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        F.coalesce("links_out", F.lit(0)).alias("links_out"),
        (
            F.expr(base)
            + F.expr(U.intdiv_sql("85 * COALESCE(contrib_sum, 0)", "100"))
        ).alias("pr1_nano"),
    )


def host_page_cap(kept: DataFrame, k: int, n_buckets: int = 64) -> DataFrame:
    """q71: per-host page cap (domain balancing — the C4/RefinedWeb-style
    curation step that stops a handful of giant hosts from dominating the
    training mix): keep at most `k` pages per host, newest first
    ((kept_ts, kept_doc) DESC — a total order), and report per-host
    candidate/kept counts plus the kept-set checksum.

    Scale shape: the selection is skew.bounded_topk — partial top-k per
    (host, hash-bucket of kept_doc) then final top-k over <= n_buckets*k
    survivors per host — so a hot host (the reference's hot-cell skew
    case at the URL layer: a 1e9-page domain at 100 TB) NEVER sorts its
    whole page set on one task; every window partition is bounded.
    `kept` (the q67 latest-snapshot frame) fans out to the candidate
    count AND the cap, so it rides the localCheckpoint fan-out rule.
    Output is host-sized."""
    from . import skew

    kept = kept.select("host", "kept_doc", "kept_ts").localCheckpoint(
        eager=False
    )
    cand = kept.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    capped = skew.bounded_topk(
        kept,
        part_cols=["host"],
        order_cols=[F.desc("kept_ts"), F.desc("kept_doc")],
        k=k,
        bucket_from="kept_doc",
        n_buckets=n_buckets,
    )
    kept_agg = capped.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("kept_doc").alias("kept_doc_sum"),
        F.max("kept_ts").alias("newest_ts"),
    )
    return cand.join(kept_agg, "host").select(
        "host", "n_candidates", "n_kept", "kept_doc_sum", "newest_ts"
    )


def host_reciprocity(kept: DataFrame, id_col: str = "kept_doc") -> DataFrame:
    """q72: reciprocal-link features per host (link-spam / ring
    detection rung of the webgraph tier): for each host, its distinct
    out-neighbor count and how many of those neighbors link BACK —
    mutual-link rate is a classic spam-farm signal.

    Scale shape: the corpus collapses to the DISTINCT host-edge table
    first (one map-side-combined agg absorbs the 3x-corpus link
    stream); reciprocity is then ONE graph-sized self-join of that
    table against its own reversal on (src, dst) — both sides are the
    same materialized frame (localCheckpoint fan-out rule: consumed by
    the reversal, the join probe, and the degree agg), so the corpus is
    touched exactly once and everything else is graph-sized. Edge rows
    are distinct, so the equi-join emits each mutual pair once — no
    output dedup (the q23 no-op-distinct lesson)."""
    e = distinct_host_edges(kept, id_col).localCheckpoint(eager=False)
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    recip = e.join(rev, ["src", "dst"]).groupBy("src").agg(
        F.count(F.lit(1)).alias("n_recip")
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    joined = out_deg.join(recip, "src", "left")
    return joined.select(
        F.expr(U.host_name_sql("src")).alias("host"),
        "out_deg",
        F.coalesce("n_recip", F.lit(0)).alias("n_recip"),
        F.expr(
            U.round_ratio_sql("COALESCE(n_recip, 0)", "out_deg")
        ).alias("recip_rate"),
    )


def clustering_sql(tri_col: str = "tri_cnt", deg_col: str = "deg") -> str:
    """Local clustering coefficient 2T / (d*(d-1)) — the SAME expression
    string runs as Spark F.expr and in the DuckDB oracle (cross-engine
    formula rule); exact integer inputs, one rounded division."""
    return (
        f"CASE WHEN {deg_col} >= 2 THEN "
        + U.round_ratio_sql(f"2 * {tri_col}", f"{deg_col} * ({deg_col} - 1)")
        + " ELSE 0.0 END"
    )


def host_triangles(kept: DataFrame, id_col: str = "kept_doc") -> DataFrame:
    """q73: triangle count + local clustering coefficient per host over
    the UNDIRECTED host graph — the link-farm / tightly-knit-community
    signal (a spam ring shows near-clique clustering).

    Scale shape — the textbook distributed triangle count, degree-
    ordered: every undirected edge is oriented from its lower
    (degree, id) endpoint to the higher one, wedges are enumerated by
    joining the oriented edge list with itself on the SOURCE vertex
    (so each wedge materializes at its minimum-order vertex, whose
    oriented out-degree is O(sqrt(m)) on any graph — the node-
    iterator++ bound; a hot host's wedge fan-out is bounded by
    orientation, not by its raw degree), and closed wedges are found
    with ONE left-semi equi-join back against the oriented edges.
    Each triangle is counted exactly once, then exploded to its three
    vertices for the per-host rollup. All joins are graph-sized; the
    corpus is touched once by the edge collapse. The undirected edge
    table and the oriented table each fan out to >1 consumer, so both
    ride the localCheckpoint rule.

    The ORDERING is an implementation device only — the triangle SET
    is orientation-invariant — so the DuckDB oracle counts the same
    triangles from plain id-ordering (a < b < c three-way join), an
    independent formulation; only the clustering_sql string is
    shared."""
    e = distinct_host_edges(kept, id_col)
    und = (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)  # fans out: degrees + orientation
    )
    vdeg = (
        und.select(F.explode(F.array("a", "b")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)  # fans out: 2 orient joins + final
    )
    # orient low (deg, id) -> high (deg, id); total order, deterministic
    o = (
        und.join(vdeg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a")
        .join(vdeg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            F.when(
                F.struct("da", "a") < F.struct("db", "b"),
                F.struct(
                    F.col("a").alias("lo"), F.col("b").alias("hi"),
                    F.col("da").alias("dlo"), F.col("db").alias("dhi"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("b").alias("lo"), F.col("a").alias("hi"),
                    F.col("db").alias("dlo"), F.col("da").alias("dhi"),
                )
            )
            .alias("s")
        )
        .select("s.lo", "s.hi", "s.dhi")
        .localCheckpoint(eager=False)  # fans out: wedge join x2 + semi
    )
    wedges = (
        o.select(F.col("lo").alias("x"), F.col("hi").alias("y"), F.col("dhi").alias("dy"))
        .join(
            o.select(F.col("lo").alias("x"), F.col("hi").alias("z"), F.col("dhi").alias("dz")),
            "x",
        )
        .filter(F.struct("dy", "y") < F.struct("dz", "z"))
    )
    # closing edge y->z exists in oriented form iff (y, z) adjacent,
    # because (deg,id)-order of y precedes z within the wedge
    tri = wedges.join(
        o.select(F.col("lo").alias("y"), F.col("hi").alias("z")),
        ["y", "z"],
        "left_semi",
    )
    tcnt = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("tri_cnt"))
    )
    out = vdeg.join(tcnt, "v", "left").select(
        "v", "deg", F.coalesce("tri_cnt", F.lit(0)).alias("tri_cnt")
    )
    return out.select(
        F.expr(U.host_name_sql("v")).alias("host"),
        "deg",
        "tri_cnt",
        F.expr(clustering_sql()).alias("clustering"),
    )


def revisit_churn(docs: DataFrame) -> DataFrame:
    """q70: latest-vs-previous snapshot comparison per canonical URL
    (digest equality + |delta n_chars|), rolled up per host."""
    canon = U.canonical_url_sql(U.raw_url_sql("doc_id"))
    snap = docs.select(
        F.expr(canon).alias("canonical"),
        F.struct(
            F.expr(U.warc_ts_sql("doc_id")).alias("warc_ts"),
            F.col("doc_id").alias("doc_id"),
            F.md5(F.col("text")).alias("digest"),
            F.col("n_chars").alias("n_chars"),
        ).alias("s"),
    )
    top2 = snap.groupBy("canonical").agg(
        F.slice(F.sort_array(F.collect_list("s"), asc=False), 1, 2).alias("t"),
        F.count(F.lit(1)).alias("n_snapshots"),
    )
    per_page = top2.select(
        F.expr(U.host_sql("canonical")).alias("host"),
        F.col("t")[0].alias("latest"),
        F.try_element_at(F.col("t"), F.lit(2)).alias("prev"),
    )
    return (
        per_page.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(
                F.when(F.col("prev").isNotNull(), 1).otherwise(0)
            ).alias("n_with_history"),
            F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("prev.digest") != F.col("latest.digest")),
                    1,
                ).otherwise(0)
            ).alias("n_changed"),
            F.sum(
                F.when(
                    F.col("prev").isNotNull(),
                    F.abs(F.col("latest.n_chars") - F.col("prev.n_chars")),
                ).otherwise(0)
            ).alias("sum_abs_delta"),
            F.max(
                F.when(
                    F.col("prev").isNotNull(),
                    F.abs(F.col("latest.n_chars") - F.col("prev.n_chars")),
                ).otherwise(0)
            ).alias("max_abs_delta"),
        )
    )

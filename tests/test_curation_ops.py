"""Segment dedup + mixture resampling + robust outlier gate.

Each operator gets an independent pure-Python recomputation of its
definition (the strongest oracle available in-process), plus the plan
property that makes it scale-safe where one exists.
"""

import hashlib
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from geotiff_tiler_spark.operators import dedup, quantiles, sampling

SF_DIR = "/root/testdata/sf0.001"


# --- segment dedup -----------------------------------------------------------


def _py_segments(text, w):
    toks = text.split()
    return [" ".join(toks[i : i + w]) for i in range(0, len(toks), w)]


def _py_segment_dedup(rows, w):
    """Pure-Python recomputation: occurrence-count dictionary over ALL
    segment occurrences, drop count>1, rebuild in order."""
    occ = []
    for doc_id, text in rows:
        for idx, seg in enumerate(_py_segments(text, w)):
            occ.append((doc_id, idx, seg))
    counts = {}
    for _, _, seg in occ:
        counts[seg] = counts.get(seg, 0) + 1
    out = {}
    for doc_id, text in rows:
        segs = _py_segments(text, w)
        if not segs:
            continue
        kept = [s for s in segs if counts[s] == 1]
        clean = " ".join(kept)
        out[doc_id] = (
            len(segs),
            len(kept),
            round(len(kept) / len(segs), 9),
            hashlib.md5(clean.encode()).hexdigest(),
        )
    return out


def test_segment_dedup_hand_case(spark):
    # w=2 segments; "a b" is boilerplate (3 occurrences across docs 1/2/3),
    # doc 4 is all-boilerplate, doc 5 is a single short (partial) segment.
    rows = [
        (1, "a b c d"),
        (2, "a b x y"),
        (3, "p q a b"),
        (4, "a b"),
        (5, "z"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_seg"], r["n_kept"], r["kept_frac"], r["clean_md5"])
        for r in dedup.segment_dedup(df, w=2).collect()
    }
    want = _py_segment_dedup(rows, 2)
    assert got == want
    # the edit is real: doc 1 keeps only "c d"
    assert got[1][1] == 1
    assert got[1][3] == hashlib.md5(b"c d").hexdigest()
    # all-boilerplate doc survives with empty reconstruction
    assert got[4][1] == 0 and got[4][3] == hashlib.md5(b"").hexdigest()


def test_segment_dedup_tokenizer_not_inlined_into_lambda(spark, docs):
    """The tokenizer (regex split) must stay in its own projection —
    inlined into the per-segment lambda it would re-run once PER SEGMENT
    (the shingles() lesson, text.py:63). In the optimized plan the
    segment-building transform must reference the `_t` attribute, not a
    nested split()."""
    plan = (
        dedup.segment_dedup(docs)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    lines = plan.split("\n")
    seg_lines = [l for l in lines if "array_join" in l]
    assert seg_lines, plan
    for l in seg_lines:
        assert "split(" not in l, l
    assert any("split(" in l for l in lines), plan


def test_segment_dedup_duckdb_parity(spark, docs):
    got = sorted(map(tuple, dedup.segment_dedup(docs).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(dedup.segment_dedup_sql()).fetchall()))
    assert got == want and len(got) > 0


# --- mixture resampling -------------------------------------------------------


def _py_unit_key(doc_id):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16) / float(1 << 52)


def _py_mixture_resample(rows, weights):
    """Pure-Python recomputation of the cap/rate/Bernoulli-key formulas."""
    wsum = sum(weights.values())
    counts = {}
    for _, lang in rows:
        counts[lang] = counts.get(lang, 0) + 1
    caps = {
        s: math.floor((counts[s] * wsum) / w)
        for s, w in weights.items()
        if s in counts
    }
    t = min(caps.values())
    rates = {s: (t * weights[s]) / float(counts[s] * wsum) for s in caps}
    return {
        doc_id
        for doc_id, lang in rows
        if lang in rates and _py_unit_key(doc_id) < rates[lang]
    }


def test_mixture_resample_python_oracle(spark, docs):
    weights = {"en": 4, "zh": 2, "de": 1, "fr": 1, "es": 1}
    kept = sampling.mixture_resample(docs, "lang", "doc_id", weights)
    got = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    rows = [(r["doc_id"], r["lang"]) for r in docs.select("doc_id", "lang").collect()]
    want = sorted(_py_mixture_resample(rows, weights))
    assert got == want and len(got) > 0


def test_mixture_resample_rate_bounds_and_shares(spark, docs):
    weights = {"en": 1, "zh": 1, "de": 1, "fr": 1, "es": 1}
    kept = sampling.mixture_resample(docs, "lang", "doc_id", weights)
    rates = {
        r["lang"]: r["_rate"]
        for r in kept.select("lang", "_rate").distinct().collect()
    }
    assert rates and all(0.0 < v <= 1.0 for v in rates.values())
    # uniform weights: every stratum downsampled toward the smallest, so
    # the smallest stratum keeps (close to) everything: its rate is the max
    n_s = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    smallest = min(n_s, key=lambda s: n_s[s])
    assert rates[smallest] == max(rates.values())


def test_mixture_resample_unknown_stratum_dropped(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "xx") for i in range(20)], ["doc_id", "lang"]
    )
    kept = sampling.mixture_resample(df, "lang", "doc_id", {"en": 1})
    langs = {r["lang"] for r in kept.select("lang").distinct().collect()}
    assert langs == {"en"}


# --- robust outlier gate ------------------------------------------------------


def _py_median(vals):
    """Type-1 (lower) median: smallest value whose rank reaches ceil(n/2)."""
    s = sorted(vals)
    return s[math.ceil(len(s) / 2) - 1]


def test_robust_gate_python_oracle(spark, docs):
    got = {
        r["lang"]: (r["n_rows"], r["med"], r["mad"], r["n_out"], r["out_frac"])
        for r in quantiles.robust_outlier_gate(docs, ["lang"], "n_chars").collect()
    }
    by_lang = {}
    for r in docs.select("lang", "n_chars").collect():
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])
    for lang, vals in by_lang.items():
        med = _py_median(vals)
        mad = _py_median([abs(v - med) for v in vals])
        n_out = sum(1 for v in vals if abs(v - med) > 3 * mad)
        want = (len(vals), med, mad, n_out, round(n_out / len(vals), 9))
        assert got[lang] == want, (lang, got[lang], want)
    assert set(got) == set(by_lang)


def test_robust_gate_flags_injected_outlier(spark):
    rows = [(i, "en", 100 + (i % 5)) for i in range(40)] + [(99, "en", 10_000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
    out = quantiles.robust_outlier_gate(df, ["lang"], "n_chars").collect()[0]
    assert out["n_out"] == 1 and out["n_rows"] == 41


# --- source overlap matrix ----------------------------------------------------


def _py_shingle_hashes(text, k=3):
    toks = text.split()
    segs = {" ".join(toks[i : i + k]) for i in range(max(len(toks) - k + 1, 0))}
    return {int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in segs}


def test_source_overlap_python_oracle(spark, docs):
    got = {
        (r["s1"], r["s2"]): (r["n_a"], r["n_b"], r["n_inter"], r["jaccard"])
        for r in dedup.source_overlap_matrix(docs).collect()
    }
    by_src = {}
    for r in docs.select("source", "text").collect():
        by_src.setdefault(r["source"], set()).update(_py_shingle_hashes(r["text"]))
    want = {}
    for s1 in by_src:
        for s2 in by_src:
            if s1 < s2:
                inter = len(by_src[s1] & by_src[s2])
                if inter:
                    want[(s1, s2)] = (
                        len(by_src[s1]),
                        len(by_src[s2]),
                        inter,
                        round(inter / len(by_src[s1] | by_src[s2]), 9),
                    )
    assert got == want and len(got) > 0


def test_source_overlap_lazy_plan_matches(spark, docs):
    a = sorted(map(tuple, dedup.source_overlap_matrix(docs, materialize=False).collect()))
    b = sorted(map(tuple, dedup.source_overlap_matrix(docs).collect()))
    assert a == b


# --- vocabulary coverage --------------------------------------------------------


def test_vocab_coverage_python_oracle(spark, docs):
    from geotiff_tiler_spark.operators import rank

    k = 5
    got = {
        r["lang"]: (r["n_types"], r["n_tokens"], r["covered"], r["coverage"])
        for r in rank.vocab_coverage(docs, ["lang"], top_k=k).collect()
    }
    counts = {}
    for r in docs.select("lang", "text").collect():
        c = counts.setdefault(r["lang"], {})
        for t in r["text"].split():
            c[t] = c.get(t, 0) + 1
    for lang, c in counts.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        covered = sum(v for _, v in top)
        total = sum(c.values())
        want = (len(c), total, covered, round(covered / total, 9))
        assert got[lang] == want, (lang, got[lang], want)
    assert set(got) == set(counts)


def test_mixture_resample_rates_join_is_broadcast(spark, docs):
    """The corpus-side filter must see the rate table as a broadcast —
    a shuffled join here would move the whole corpus by stratum at scale."""
    kept = sampling.mixture_resample(
        docs, "lang", "doc_id", {"en": 4, "zh": 2, "de": 1, "fr": 1, "es": 1}
    )
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_source_overlap_ubiquitous_gram_cap(spark):
    """max_sources_per_gram drops grams carried by more than m sources
    BEFORE the self-join (the quadratic-residue guard): the shared
    boilerplate gram stops contributing to n_inter; set sizes stay exact."""
    boiler = "the same old header"  # one 3-shingle window per doc... per source
    rows = []
    for i, src in enumerate(["s1", "s2", "s3", "s4"]):
        rows.append((i, src, boiler + f" unique{i} tail{i} x{i}"))
    # s1/s2 additionally share a private gram chain
    rows.append((10, "s1", "alpha beta gamma delta"))
    rows.append((11, "s2", "alpha beta gamma delta"))
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    full = {
        (r["s1"], r["s2"]): r["n_inter"]
        for r in dedup.source_overlap_matrix(df).collect()
    }
    capped = {
        (r["s1"], r["s2"]): r["n_inter"]
        for r in dedup.source_overlap_matrix(df, max_sources_per_gram=3).collect()
    }
    # boilerplate grams span all 4 sources -> excluded everywhere at cap 3;
    # the private s1/s2 chain (2 sources) survives
    assert ("s1", "s2") in capped
    assert capped[("s1", "s2")] < full[("s1", "s2")]
    assert capped[("s1", "s2")] == 2  # 'alpha beta gamma', 'beta gamma delta'
    for pair in full:
        if pair != ("s1", "s2"):
            assert pair not in capped  # only boilerplate connected them


def test_source_overlap_capped_sql_twin_and_contract_bite(spark, docs):
    """q60's oracle (source_overlap_sql with the cap) must match the Spark
    capped matrix row-for-row on the contract corpus, AND the cap must
    actually bite there — if a regenerated corpus ever stops carrying
    grams spread over >4 sources, q60 silently degenerates into q58 and
    this fails loudly instead."""
    cap = 4
    sp = {
        (r["s1"], r["s2"]): (r["n_a"], r["n_b"], r["n_inter"], r["jaccard"])
        for r in dedup.source_overlap_matrix(docs, max_sources_per_gram=cap).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    du = {
        (s1, s2): (na, nb, ni, j)
        for s1, s2, na, nb, ni, j in con.execute(
            dedup.source_overlap_sql(max_sources_per_gram=cap)
        ).fetchall()
    }
    assert sp == du
    full_inter = sum(
        r["n_inter"] for r in dedup.source_overlap_matrix(docs).collect()
    )
    assert sum(v[2] for v in sp.values()) < full_inter


def test_source_novelty_python_oracle_and_invariant(spark, docs):
    """Independent recomputation of first-carrier novelty, plus the
    structural invariant: every distinct gram is novel to exactly one
    source, so sum(n_novel) == |distinct grams|."""
    out = {
        r["src"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in dedup.source_novelty(docs).collect()
    }
    rows = docs.select("source", "text").collect()
    per_src: dict[str, set] = {}
    for r in rows:
        toks = [t for t in r["text"].strip().split() if t]
        grams = {
            " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))
        }
        per_src.setdefault(r["source"], set()).update(grams)
    all_grams: dict[str, str] = {}
    for src in sorted(per_src):
        for g in per_src[src]:
            all_grams.setdefault(g, src)
    expect = {}
    for src, grams in per_src.items():
        novel = sum(1 for g in grams if all_grams[g] == src)
        expect[src] = (len(grams), novel, round(novel / len(grams), 9))
    assert out == expect
    assert sum(v[1] for v in out.values()) == len(all_grams)


# --- containment refine (q64) -------------------------------------------------


def test_containment_catches_excerpt_jaccard_misses(spark):
    """A short doc fully contained in a long one: containment = 1.0 while
    Jaccard is small — the asymmetric-dup case the operator exists for."""
    long_words = " ".join(f"w{i}" for i in range(60))
    excerpt = " ".join(f"w{i}" for i in range(10, 16))  # 6 tokens -> 4 shingles
    unrelated = " ".join(f"z{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, long_words), (2, excerpt), (3, unrelated)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "doc_a long, doc_b long"
    )
    out = {
        (r.doc_a, r.doc_b): r
        for r in dedup.containment_pairs(docs, pairs, materialize=False).collect()
    }
    assert (1, 2) in out and (1, 3) not in out
    r = out[(1, 2)]
    assert r.containment == 1.0 and r.inter == r.n_b
    # the same pair's Jaccard is far below any dedup threshold
    j = {
        (x.doc_a, x.doc_b): x.jaccard
        for x in dedup.ngram_jaccard_pairs(docs, pairs, materialize=False).collect()
    }
    assert j[(1, 2)] < 0.1


def test_containment_expr_matches_duckdb(spark):
    """Shared-formula rule: the same expression string evaluates
    identically on a literal row in both engines."""
    expr = dedup.containment_expr_sql()
    row = spark.sql(f"SELECT {expr} AS c FROM VALUES (3, 4, 10) AS t(inter, n_a, n_b)").collect()
    duck = duckdb.connect().execute(
        f"SELECT {expr} AS c FROM (SELECT 3 AS inter, 4 AS n_a, 10 AS n_b)"
    ).fetchone()
    assert row[0].c == duck[0] == 0.75


# --- source JSD (q65) ----------------------------------------------------------


def _py_jsd_nano(rows):
    """Pure-Python recomputation of source_jsd's exact nano-nat integer
    definition (term-rounded, order-free)."""
    from collections import Counter, defaultdict

    cnt, tot = defaultdict(Counter), Counter()
    for src, text in rows:
        toks = text.split()
        cnt[src].update(toks)
        tot[src] += len(toks)
    vocab = set()
    for c in cnt.values():
        vocab |= set(c)
    out = {}
    srcs = sorted(cnt)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            s, ncommon = 0, 0
            for tok in vocab:
                ca, cb = cnt[sa][tok], cnt[sb][tok]
                p, q = ca / tot[sa], cb / tot[sb]
                term = 0.0
                if ca > 0:
                    term += p * math.log(2.0 * p / (p + q))
                if cb > 0:
                    term += q * math.log(2.0 * q / (p + q))
                s += int(_round_half_even(term * 500000000.0))
                if ca > 0 and cb > 0:
                    ncommon += 1
            out[(sa, sb)] = (ncommon, round(s / 1e9, 9))
    return out


def _round_half_even(x):
    # Spark/DuckDB round() is half-away-from-zero on doubles
    import decimal

    return int(
        decimal.Decimal(x).quantize(decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP)
    )


def test_source_jsd_identical_and_disjoint(spark):
    """Identical distributions -> exactly 0; disjoint vocabularies ->
    ln 2 (the JSD upper bound) within per-token rounding."""
    docs = spark.createDataFrame(
        [
            (1, "a b c a", "s1"),
            (2, "a b c a", "s2"),
            (3, "x y z x", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r.s1, r.s2): r.jsd
        for r in dedup.source_jsd(docs, source_col="source").collect()
    }
    assert out[("s1", "s2")] == 0.0
    assert abs(out[("s1", "s3")] - math.log(2)) < 1e-6
    assert abs(out[("s2", "s3")] - math.log(2)) < 1e-6


def test_source_jsd_python_oracle(spark, docs):
    """Exact match (integer nano-nat definition) vs an independent pure-
    Python recomputation on real sf0.001 documents."""
    rows = [(r.source, r.text) for r in docs.select("source", "text").collect()]
    expect = _py_jsd_nano(rows)
    got = {
        (r.s1, r.s2): (r.n_common, r.jsd)
        for r in dedup.source_jsd(docs).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == expect[k], (k, got[k], expect[k])


def test_source_jsd_symmetric_bounds(spark, docs):
    """JSD is within [0, ln 2] everywhere on real data."""
    for r in dedup.source_jsd(docs).collect():
        assert -1e-9 <= r.jsd <= math.log(2) + 1e-9


def test_source_jsd_totals_grid_is_broadcast(spark, docs):
    """The vocab x sources grid must come from a BROADCAST of the tiny
    per-source totals (one row per source) — never a shuffle of the
    vocabulary side. Inspected on the unmaterialized plan: with
    materialize=True the grid join is executed inside the localCheckpoint
    lineage and the outer plan only shows the checkpointed scan (the
    single-corpus-scan shape is asserted in test_plans)."""
    plan = (
        dedup.source_jsd(docs, materialize=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# q66: URL canonicalization + per-host re-crawl stats (functions/url.py)
# ---------------------------------------------------------------------------

def test_url_six_variants_collapse(spark):
    """Each group of six doc_ids is six raw forms of ONE page: case mess,
    :443, www., utm+trailing-slash, fragment all canonicalize away."""
    from geotiff_tiler_spark.functions import url as U

    df = spark.range(12).withColumnRenamed("id", "doc_id")
    raw = U.raw_url_sql("doc_id")
    out = df.select(
        "doc_id",
        F.expr(raw).alias("raw"),
        F.expr(U.canonical_url_sql(raw)).alias("canon"),
    ).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.doc_id // 6, set()).add(r.canon)
        assert r.canon.startswith("https://d") and "example.com/p/" in r.canon
    assert all(len(v) == 1 for v in by_group.values()), by_group
    # six distinct raw forms per group (nothing accidentally pre-canonical)
    raws = {r.doc_id // 6: set() for r in out}
    for r in out:
        raws[r.doc_id // 6].add(r.raw)
    assert all(len(v) == 6 for v in raws.values())
    # spot-check the exact canonical string for group 0
    g0 = next(r.canon for r in out if r.doc_id == 0)
    assert g0 == "https://d7.example.com/p/0"


def test_url_host_stats_values(spark):
    """On 6*k consecutive ids every host has dup_rate 5/6 and the host
    comes from the group id, not the row id."""
    import __spark_entry__ as e
    from geotiff_tiler_spark.functions import url as U

    df = spark.range(60).withColumnRenamed("id", "doc_id")
    canon = U.canonical_url_sql(U.raw_url_sql("doc_id"))
    d = df.select(
        "doc_id",
        F.expr(canon).alias("canonical"),
        F.expr(U.host_sql(canon)).alias("host"),
    )
    agg = d.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("canonical").alias("n_canonical"),
    ).collect()
    assert sum(r.n_pages for r in agg) == 60
    for r in agg:
        assert r.n_pages == 6 * r.n_canonical, r


# ---------------------------------------------------------------------------
# q67: latest-snapshot re-crawl collapse (url.warc_ts_sql + struct-max agg)
# ---------------------------------------------------------------------------

def _py_warc_ts(doc_id: int) -> int:
    return 1690000000 + (doc_id * 40503 + 13) % 86400


def test_latest_snapshot_winner_parity(spark, tmp_path):
    """Struct-max winner per canonical group equals the pure-Python
    argmax over (warc_ts, doc_id) — and is NOT simply max(doc_id)."""
    import __spark_entry__ as e

    n = 120
    df = spark.range(n).withColumnRenamed("id", "doc_id").selectExpr(
        "doc_id", "'x' AS text", "'en' AS lang", "'s' AS source",
        "1 AS n_chars",
    )
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(path)
    out = {r.kept_doc: r for r in e.q67_latest_snapshot(spark, str(tmp_path)).collect()}
    winners = set()
    for g in range(0, n, 6):
        ids = range(g, g + 6)
        w = max(ids, key=lambda i: (_py_warc_ts(i), i))
        winners.add(w)
        assert w in out, (g, sorted(out))
        assert out[w].n_snapshots == 6
        assert out[w].kept_ts == _py_warc_ts(w)
    assert set(out) == winners
    # non-degenerate: at least one group's winner is not its max doc_id
    assert any(w % 6 != 5 for w in winners), winners


def test_latest_snapshot_plan_has_no_window(spark, docs):
    """The argmax must stay a partial+final aggregate (map-side combine):
    a Window here would sort every hot URL's history on one task."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    plan = (
        e.q67_latest_snapshot(spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan or "SortAggregate" in plan


# ---------------------------------------------------------------------------
# q68: host link graph (degrees + integer-exact 1-iteration PageRank)
# ---------------------------------------------------------------------------

def test_host_graph_pure_python_parity(spark, tmp_path):
    """Degrees, link volume, and the nano-unit PageRank equal a from-
    scratch pure-Python computation of the same derivation."""
    import __spark_entry__ as e

    N, n = 23, 240
    df = spark.range(n).withColumnRenamed("id", "doc_id").selectExpr(
        "doc_id", "'x' AS text", "'en' AS lang", "'s' AS source",
        "1 AS n_chars",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    # pure-Python re-derivation
    edges = []  # page-level (src, dst) multi-edges
    for g in range(0, n, 6):
        src = (g * 131 + 7) % N
        for j in (1, 2, 3):
            dst = (src + 1 + (g * (17 + j) + j * j * 5) % (N - 1)) % N
            assert dst != src
            edges.append((src, dst))
    he = {}
    for s, d in edges:
        he[(s, d)] = he.get((s, d), 0) + 1
    out_deg = {}; links_out = {}; in_deg = {}; contrib_sum = {}
    for (s, d), w in he.items():
        out_deg[s] = out_deg.get(s, 0) + 1
        links_out[s] = links_out.get(s, 0) + w
    for (s, d), w in he.items():
        in_deg[d] = in_deg.get(d, 0) + 1
        contrib_sum[d] = contrib_sum.get(d, 0) + 10**9 // (N * out_deg[s])
    hosts = set(out_deg) | set(in_deg)
    expected = {
        f"d{h}.example.com": (
            out_deg.get(h, 0), in_deg.get(h, 0), links_out.get(h, 0),
            15 * 10**9 // (100 * N) + 85 * contrib_sum.get(h, 0) // 100,
        )
        for h in hosts
    }
    got = {
        r.host: (r.out_deg, r.in_deg, r.links_out, r.pr1_nano)
        for r in e.q68_host_graph(spark, str(tmp_path)).collect()
    }
    assert got == expected
    # PR mass sanity: total nano-mass stays within truncation slack of 1e9
    total = sum(v[3] for v in got.values())
    assert 10**9 - len(hosts) * (N + 100) < total <= 10**9


# ---------------------------------------------------------------------------
# q69: multi-iteration integer-exact PageRank (operators/graph.py)
# ---------------------------------------------------------------------------

def _py_pagerank(edges: set, hosts: set, n_hosts: int, n_iter: int) -> dict:
    """From-scratch reimplementation of the nano-unit spec."""
    out_deg = {}
    for s, d in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    pr = {h: 10**9 // n_hosts for h in hosts}
    base = 15 * 10**9 // (100 * n_hosts)
    for _ in range(n_iter):
        csum = {}
        for s, d in edges:
            csum[d] = csum.get(d, 0) + pr[s] // out_deg[s]
        pr = {h: base + 85 * csum.get(h, 0) // 100 for h in hosts}
    return pr


def _write_docs(spark, tmp_path, n):
    df = spark.range(n).withColumnRenamed("id", "doc_id").selectExpr(
        "doc_id", "'x' AS text", "'en' AS lang", "'s' AS source",
        "1 AS n_chars",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))


def _py_host_edges(n, N=23):
    edges = set()
    for g in range(0, n, 6):
        src = (g * 131 + 7) % N
        for j in (1, 2, 3):
            edges.add((src, (src + 1 + (g * (17 + j) + j * j * 5) % (N - 1)) % N))
    return edges


def test_pagerank_matches_python_and_q68_at_one_iter(spark, tmp_path):
    import __spark_entry__ as e
    from geotiff_tiler_spark.operators import graph

    n, N = 180, 23
    _write_docs(spark, tmp_path, n)
    sf = str(tmp_path)
    edges = _py_host_edges(n, N)
    hosts = {h for ed in edges for h in ed}

    # 4-iteration output vs the from-scratch Python spec
    exp4 = _py_pagerank(edges, hosts, N, 4)
    got4 = {r.host: r.pr_nano for r in e.q69_pagerank(spark, sf).collect()}
    assert got4 == {f"d{h}.example.com": v for h, v in exp4.items()}

    # floor-composition invariant: iteration 1 == q68's closed-form pr1
    sedges = e._host_edges(spark, sf)
    universe = (
        sedges.selectExpr("src AS h").union(sedges.selectExpr("dst AS h"))
        .distinct()
    )
    pr1 = {
        r.h: r.pr
        for r in graph.pagerank_nano(sedges, universe, N, 1).collect()
    }
    q68 = {r.host: r.pr1_nano for r in e.q68_host_graph(spark, sf).collect()}
    assert {f"d{h}.example.com": v for h, v in pr1.items()} == q68

    # mass conservation within truncation slack
    assert sum(got4.values()) <= 10**9
    assert sum(got4.values()) > 10**9 - len(hosts) * 200


# ---------------------------------------------------------------------------
# q70: re-crawl churn (latest vs previous snapshot per canonical URL)
# ---------------------------------------------------------------------------

def test_revisit_churn_detects_unchanged_and_deltas(spark, tmp_path):
    """Groups with identical text across snapshots count as revisits
    (n_changed excludes them); churn deltas match the pure-Python top-2."""
    import __spark_entry__ as e

    n, N = 72, 23
    # even groups: identical text (revisits); odd groups: per-doc text
    df = spark.range(n).withColumnRenamed("id", "doc_id").selectExpr(
        "doc_id",
        "CASE WHEN (doc_id - doc_id % 6) % 12 = 0 THEN 'same'"
        " ELSE 'txt-' || CAST(doc_id AS STRING) END AS text",
        "'en' AS lang", "'s' AS source",
        "CAST(10 + doc_id % 7 AS BIGINT) AS n_chars",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    # pure-Python expectation
    import hashlib
    per_host = {}
    for g in range(0, n, 6):
        host = f"d{(g * 131 + 7) % N}.example.com"
        snaps = sorted(
            range(g, g + 6), key=lambda i: (_py_warc_ts(i), i), reverse=True
        )
        latest, prev = snaps[0], snaps[1]
        text = lambda i: "same" if g % 12 == 0 else f"txt-{i}"
        changed = hashlib.md5(text(latest).encode()).hexdigest() != hashlib.md5(
            text(prev).encode()
        ).hexdigest()
        delta = abs((10 + latest % 7) - (10 + prev % 7))
        a = per_host.setdefault(host, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += 1
        a[2] += 1 if changed else 0
        a[3] += delta
        a[4] = max(a[4], delta)
    got = {
        r.host: [r.n_pages, r.n_with_history, r.n_changed,
                 r.sum_abs_delta, r.max_abs_delta]
        for r in e.q70_revisit_churn(spark, str(tmp_path)).collect()
    }
    assert got == per_host
    # the fixture really exercises both branches
    assert any(v[2] < v[1] for v in got.values())
    assert any(v[2] > 0 for v in got.values())


def test_crawl_tier_plan_shapes(spark):
    """q66: pure codegen'd expressions — no Python UDF, no window, and
    the COUNT(DISTINCT) runs as the two-phase (host, canonical)
    pre-aggregate (two aggregate layers below the final). q70: the top-2
    comes from aggregation alone — no Window, no self-Join anywhere."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    p66 = e.q66_url_host_stats(spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p66 and "EvalPython" not in p66
    assert p66.count("HashAggregate") >= 3, p66  # partial+final x two phases
    p70 = e.q70_revisit_churn(spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p70, p70
    assert "Join" not in p70, p70
    assert "ObjectHashAggregate" in p70 or "SortAggregate" in p70, p70


def test_urlgraph_stage_counts(spark):
    """The scale-stage runner computes the same structural invariants the
    contract queries pin: one kept page per 6-id group, the full host
    universe, and PR mass conserved within truncation slack."""
    from geotiff_tiler_spark.plans.scale_job import run_urlgraph_stage

    r = run_urlgraph_stage(spark, 6000, warm=False)
    assert r["kept_pages"] == 1000
    assert r["hosts"] == 23 and r["churn_hosts"] == 23
    assert 10**9 - 23 * 200 < r["pr_mass_nano"] <= 10**9
    # post-total q71/q72 phases: every host holds >= K candidates so the
    # cap keeps exactly 23*K pages; mutual edges come in pairs
    assert r["cap_kept"] == 23 * 2
    assert r["recip_total"] % 2 == 0 and r["recip_total"] > 0


# ---------------------------------------------------------------------------
# q71: per-host page cap (domain balancing via skew.bounded_topk)
# ---------------------------------------------------------------------------

def test_host_page_cap_python_parity(spark, tmp_path):
    """Cap semantics (newest-first, (ts, id) DESC total order) equal a
    pure-Python recompute of winner selection + per-host top-K."""
    import __spark_entry__ as e

    n, N, K = 420, 23, e.HOST_PAGE_CAP_K
    _write_docs(spark, tmp_path, n)
    # pure-Python: q67 winners, then per-host newest-first cap
    winners = []  # (host, kept_doc, kept_ts)
    for g in range(0, n, 6):
        w = max(range(g, g + 6), key=lambda i: (_py_warc_ts(i), i))
        winners.append(((g * 131 + 7) % N, w, _py_warc_ts(w)))
    by_host = {}
    for h, d, t in winners:
        by_host.setdefault(h, []).append((t, d))
    expected = {}
    for h, rows in by_host.items():
        top = sorted(rows, reverse=True)[:K]
        expected[f"d{h}.example.com"] = (
            len(rows), len(top), sum(d for _, d in top), top[0][0],
        )
    got = {
        r.host: (r.n_candidates, r.n_kept, r.kept_doc_sum, r.newest_ts)
        for r in e.q71_host_page_cap(spark, str(tmp_path)).collect()
    }
    assert got == expected
    # the cap must actually bite somewhere (fixture sanity)
    assert any(v[0] > v[1] for v in expected.values())


def test_host_page_cap_plan_has_bounded_windows_only(spark):
    """Both Window nodes must be bounded: the partial stage partitions by
    (host, _bk) — no window over a bare low-cardinality host key sorts
    an unbounded row set on one task."""
    import re
    import __spark_entry__ as e

    plan = (
        e.q71_host_page_cap(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # two Window nodes: the partial stage partitioned by (host, _bk) and
    # the final ranking over the <= buckets*K survivors per host; Spark 4
    # additionally inserts WindowGroupLimit (rank-limit pushdown), so
    # even the final sort sees top-K-per-key-filtered input map-side
    specs = re.findall(r"Window \[[^\n]*?windowspecdefinition\(([^)]*)\)", plan)
    assert len(specs) == 2, (specs, plan)
    assert any("_bk" in s for s in specs), specs
    assert "WindowGroupLimit" in plan, plan


# ---------------------------------------------------------------------------
# q72: reciprocal-link rate per host (edge-reversal self-join)
# ---------------------------------------------------------------------------

def test_host_reciprocity_python_parity(spark, tmp_path):
    """Reciprocity counts equal a pure-Python recompute over the same
    distinct host-edge derivation; global invariant: mutual edges come
    in pairs, so the n_recip total is even."""
    import __spark_entry__ as e

    n = 180
    _write_docs(spark, tmp_path, n)
    edges = _py_host_edges(n)
    expected = {}
    for s in {s for s, _ in edges}:
        outs = {d for x, d in edges if x == s}
        rec = {d for d in outs if (d, s) in edges}
        expected[f"d{s}.example.com"] = (
            len(outs), len(rec), round(len(rec) / len(outs), 9),
        )
    got = {
        r.host: (r.out_deg, r.n_recip, r.recip_rate)
        for r in e.q72_host_reciprocity(spark, str(tmp_path)).collect()
    }
    assert got == expected
    assert sum(v[1] for v in got.values()) % 2 == 0
    # fixture sanity: reciprocity discriminates (neither all-0 nor all-1)
    rates = {v[2] for v in got.values()}
    assert len(rates) > 1


# ---------------------------------------------------------------------------
# q73: triangle count + clustering coefficient (degree-ordered enumeration)
# ---------------------------------------------------------------------------

def test_host_triangles_python_parity(spark, tmp_path):
    """Degree-ordered distributed enumeration equals a from-scratch
    pure-Python undirected triangle count over the same derivation."""
    import __spark_entry__ as e

    n = 180
    _write_docs(spark, tmp_path, n)
    und = set()
    for s, d in _py_host_edges(n):
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri_cnt = {v: 0 for v in adj}
    for a, b in und:
        for c in adj[a] & adj[b]:  # each triangle found at all 3 edges
            tri_cnt[a] += 1        # -> per-vertex count x2; halve below
            tri_cnt[b] += 1
    expected = {}
    for v, nb in adj.items():
        t = tri_cnt[v] // 2
        d = len(nb)
        cc = round(2 * t / (d * (d - 1)), 9) if d >= 2 else 0.0
        expected[f"d{v}.example.com"] = (d, t, cc)
    got = {
        r.host: (r.deg, r.tri_cnt, r.clustering)
        for r in e.q73_host_triangles(spark, str(tmp_path)).collect()
    }
    assert got == expected
    # fixture sanity: clustering discriminates and the graph isn't a clique
    ccs = {v[2] for v in got.values()}
    assert len(ccs) > 1 and any(c < 1.0 for c in ccs)


def test_host_triangles_plan_no_cartesian(spark):
    """The wedge enumeration must stay an equi-join on the minimum-order
    vertex with the closing check a left-semi equi-join — never a
    cartesian/nested-loop product of the edge table with itself."""
    import __spark_entry__ as e

    plan = (
        e.q73_host_triangles(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan
    assert "LeftSemi" in plan, plan

"""BM25 + unigram-NLL quality proxy (operators/rank.py): semantics vs an
independent driver-side reference, partition invariance, and the plan
shapes the docstrings promise (no single-partition window in the BM25
top-k; broadcast stats)."""

import math

import pytest
from pyspark.sql import functions as F

from geotiff_tiler_spark.operators import rank

from conftest import SF_DIR


def _py_tokens(text):
    return [t for t in text.strip().split() if t]


@pytest.fixture(scope="module")
def doc_rows(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )


def test_bm25_matches_python_reference(spark, docs, doc_rows):
    out = {r.doc_id: (r.score, r.n_terms_hit) for r in rank.bm25_topk(docs, k=20).collect()}
    assert out, "bm25_topk returned nothing"
    toks = {r.doc_id: _py_tokens(r.text) for r in doc_rows}
    n_docs = len(toks)
    total = sum(len(t) for t in toks.values())
    avgdl = total / n_docs
    dfs = {
        t: sum(1 for tk in toks.values() if t in tk) for t in rank.BM25_TERMS
    }
    scores = {}
    for d, tk in toks.items():
        s = 0.0
        hit = 0
        for t in rank.BM25_TERMS:
            tf = tk.count(t)
            idf = round(math.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0), 9)
            s += idf * (tf * (rank.BM25_K1 + 1.0)) / (
                tf + rank.BM25_K1 * (1.0 - rank.BM25_B + rank.BM25_B * len(tk) / avgdl)
            )
            hit += tf > 0
        if hit:
            scores[d] = (round(s, 6), hit)
    expect = dict(
        sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    )
    assert out == expect


def test_bm25_zero_df_term_contributes_zero(spark):
    df = spark.createDataFrame(
        [(0, "table table hash"), (1, "sort merge window")], "doc_id long, text string"
    )
    with_ghost = rank.bm25_topk(df, terms=("table", "zzz_unseen")).collect()
    plain = rank.bm25_topk(df, terms=("table",)).collect()
    s_ghost = {r.doc_id: r.score for r in with_ghost}
    s_plain = {r.doc_id: r.score for r in plain}
    # doc 0 scored identically with and without the df=0 ghost term
    assert s_ghost[0] == s_plain[0]
    assert 1 not in s_ghost  # no query term -> filtered out


def test_bm25_plan_has_no_window_and_broadcasts_stats(docs):
    plan = rank.bm25_topk(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_unigram_nll_matches_python_reference(spark, docs, doc_rows):
    out = {r.doc_id: (r.n_tokens, r.nll) for r in rank.unigram_nll(docs).collect()}
    toks = {r.doc_id: _py_tokens(r.text) for r in doc_rows}
    cnt: dict[str, int] = {}
    for tk in toks.values():
        for t in tk:
            cnt[t] = cnt.get(t, 0) + 1
    total = sum(cnt.values())
    def _half_away(x: float) -> int:
        # HALF_UP away from zero, matching Spark round()/DuckDB round()
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    for d, tk in toks.items():
        if not tk:
            assert d not in out
            continue
        # exact nano-nat integer sum — the order-free aggregate the
        # operator uses; EXACT equality expected, no tolerance
        s = sum(_half_away(math.log(cnt[t] / total) * 1e9) for t in tk)
        nll = round(-float(s) / (len(tk) * 1e9), 6)
        got = out[d]
        assert got[0] == len(tk)
        assert got[1] == nll, (d, got, nll)


def test_unigram_nll_partition_invariant(spark, docs):
    a = rank.unigram_nll(docs).orderBy("doc_id").collect()
    b = rank.unigram_nll(docs.repartition(13)).orderBy("doc_id").collect()
    # the nano-nat integer aggregate makes nll EXACTLY partition-invariant
    assert [(r.doc_id, r.n_tokens, r.nll) for r in a] == [
        (r.doc_id, r.n_tokens, r.nll) for r in b
    ]


# --- bigram lift --------------------------------------------------------------


def test_bigram_lift_matches_python_reference(spark):
    """Exact lift recomputation: counts from scratch, IEEE order mirrored
    (c12*N as one multiply, c1*c2 as one multiply, one divide)."""
    rows = [
        (0, "en", "new york new york city hall"),
        (1, "en", "the city of new york is a city"),
        (2, "en", "york new haven city new york"),
        (3, "en", "hall of the city new york hall"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = {
        (r["lang"], r["bigram"]): (r["rank"], r["n"], r["c1"], r["c2"], r["lift"])
        for r in rank.bigram_lift_topk(df, ["lang"], k=5, min_count=2).collect()
    }
    toks = [t for _, _, tx in rows for t in tx.split()]
    n_tok = len(toks)
    uni = {}
    for t in toks:
        uni[t] = uni.get(t, 0) + 1
    bg = {}
    for _, _, tx in rows:
        ts = tx.split()
        for i in range(len(ts) - 1):
            k2 = f"{ts[i]} {ts[i+1]}"
            bg[k2] = bg.get(k2, 0) + 1
    scored = []
    for b, c12 in bg.items():
        if c12 < 2:
            continue
        w1, w2 = b.split(" ")
        lift = (float(c12) * float(n_tok)) / (float(uni[w1]) * float(uni[w2]))
        scored.append((b, c12, uni[w1], uni[w2], lift))
    scored.sort(key=lambda r: (-r[4], r[0]))
    expect = {
        ("en", b): (i + 1, c12, c1, c2, round(lift, 9))
        for i, (b, c12, c1, c2, lift) in enumerate(scored[:5])
    }
    assert out == expect
    # the collocation ('new york') must out-rank a merely frequent pair
    assert out[("en", "new york")][4] > 1.0


def test_bigram_lift_min_count_prunes_before_join(spark, docs):
    """Plan property: the hapax gate (n >= min_count) must sit BELOW the
    unigram joins — pruning the vocabulary-sized bigram side before any
    shuffle-or-broadcast join work."""
    out = rank.bigram_lift_topk(docs, ["lang"], k=3, min_count=5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    join_pos = plan.find("Join ")
    filt_pos = plan.find(">= 5)")
    assert join_pos != -1, plan
    # deeper in the tree = later in the string: the gate is below the join
    assert filt_pos > join_pos, plan

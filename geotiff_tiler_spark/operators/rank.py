"""Corpus-statistics ranking and quality ops for the webtext tier.

Beyond-reference LLM-data-pipeline operators (SURVEY §6): BM25 relevance
scoring against a fixed query-term set, and a CCNet-style unigram
negative-log-likelihood quality proxy (Wenzek et al., "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data", 2020 — the
filter-by-LM-perplexity idea with the LM replaced by corpus-self unigram
frequencies, which keeps the op closed over the input table and exactly
reproducible in SQL).

Cross-engine parity: every numeric formula is generated ONCE as a SQL
expression string (the `*_expr_sql` helpers) and evaluated by BOTH
engines — Spark via ``F.expr``, DuckDB verbatim in the oracle — so the
float-op trees are identical. `ln` is the one libm call (not required to
be correctly rounded by IEEE), so every ln() result is rounded to 9
decimals at the term level before anything sums it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geotiff_tiler_spark.functions import text as T

BM25_K1 = 1.2
BM25_B = 0.75
# fixed query-term set for the oracled q46 query (terms from the synthetic
# corpus vocabulary; a df=0 term contributes an exact 0 to every score)
BM25_TERMS = ("table", "hash", "window", "sort", "merge")


def avgdl_expr_sql() -> str:
    """Mean document length from exact-integer corpus stats — evaluated
    identically by both engines (bigint/bigint `/` is float division in
    Spark SQL and DuckDB alike, and both ints are exactly representable)."""
    return "(CAST(total_tokens AS DOUBLE) / n_docs)"


def bm25_idf_expr_sql(df_col: str, n_docs: str = "n_docs") -> str:
    """Robertson-Sparck-Jones +1 idf (always positive), ln rounded to 9."""
    return f"round(ln(({n_docs} - {df_col} + 0.5) / ({df_col} + 0.5) + 1.0), 9)"


def bm25_term_expr_sql(tf: str, dl: str, idf: str, k1: float = BM25_K1, b: float = BM25_B) -> str:
    """One term's BM25 contribution. tf=0 yields an exact 0.0 (the
    numerator is idf * 0 and the denominator is strictly positive), so the
    sum over the fixed term list needs no per-term CASE."""
    return (
        f"{idf} * ({tf} * {k1 + 1.0!r}) / "
        f"({tf} + {k1!r} * (1.0 - {b!r} + {b!r} * {dl} / {avgdl_expr_sql()}))"
    )


def bm25_score_expr_sql(terms=BM25_TERMS, k1: float = BM25_K1, b: float = BM25_B) -> str:
    """Whole-document score: the FIXED-ORDER left-associated sum of the
    per-term contributions (an expression, not an aggregate — no
    float-summation-order nondeterminism), rounded to 6."""
    parts = [
        bm25_term_expr_sql(f"tf_{i}", "dl", bm25_idf_expr_sql(f"df_{i}"), k1, b)
        for i in range(len(terms))
    ]
    return f"round({' + '.join(parts)}, 6)"


def bm25_topk(
    docs: DataFrame,
    terms=BM25_TERMS,
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 against a fixed query-term set.

    Scale shape — deliberately join-free and explode-free:
      * per-doc term frequencies come straight off the token ARRAY
        (`size(filter(tokens, = term))` per term — pure map, zero
        shuffle, no token-level row blow-up);
      * the corpus constants (n_docs, total_tokens, per-term document
        frequencies) are ONE 1-row aggregate, broadcast back via
        crossJoin — bytes, at any corpus size;
      * selection is orderBy+limit = TakeOrderedAndProject (per-partition
        top-k then a k-row driver merge), never a single-partition window.
    The corpus is scanned twice (stats pass + scoring pass), both passes
    column-pruned to the text column — the price of keeping the plan free
    of a doc-id shuffle join.

    Output: (doc_id, score, n_terms_hit), score desc / doc_id asc, <= k
    rows. Ordering compares the ROUNDED score, so the boundary is
    identical cross-engine.

    r6 per-doc pass (guide §4.2; scoring SQL unchanged): dl and the term
    frequencies come from ONE mapInArrow pass over (id, text) using the
    parity-pinned Python tokenizer (functions.text.py_tokens) instead of
    a tokenize + `terms` interpreted filter-HOF scans per document —
    both evaluations of per_doc (stats pass + scoring pass) ride the
    kernel. Counts are exact integers, so every downstream float is
    unchanged. Null-text docs emit dl=0/tf=0 rows — identical to the
    expression form under every consumer (count/sum/df aggregates agree,
    and the n_terms_hit>0 gate drops the row either way). sf1: the two
    interpreted passes cost ~3.9 s; the kernel ~0.8 s."""
    terms = tuple(terms)

    def _per_doc_scan(batches):
        import pyarrow as pa

        for rb in batches:
            ids = rb.column(0).to_pylist()
            txts = rb.column(1).to_pylist()
            dl: list[int] = []
            tf = [[] for _ in terms]
            for s in txts:
                toks = T.py_tokens(s)
                dl.append(len(toks))
                for i, t in enumerate(terms):
                    tf[i].append(toks.count(t))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(dl, pa.int64())]
                + [pa.array(c, pa.int64()) for c in tf],
                [id_col, "dl"] + [f"tf_{i}" for i in range(len(terms))],
            )

    schema = ", ".join(
        [f"{id_col} long", "dl long"] + [f"tf_{i} long" for i in range(len(terms))]
    )
    per_doc = docs.select(id_col, text_col).mapInArrow(_per_doc_scan, schema)

    stat_aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    ]
    for i in range(len(terms)):
        stat_aggs.append(
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
        )
    stats = per_doc.agg(*stat_aggs)

    hit = None
    for i in range(len(terms)):
        h = (F.col(f"tf_{i}") > 0).cast("bigint")
        hit = h if hit is None else hit + h
    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        .withColumn("score", F.expr(bm25_score_expr_sql(terms, k1, b)))
        .withColumn("n_terms_hit", hit)
        .filter(F.col("n_terms_hit") > 0)
        .select(id_col, "score", "n_terms_hit")
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def bm25_topk_sql(
    table: str = "documents",
    terms=BM25_TERMS,
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_expr: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of bm25_topk — same `*_expr_sql` formula strings over
    the same per-doc tf/dl columns."""
    toks = T.tokens_sql(text_expr)
    tf_cols = ", ".join(
        f"CAST(len(list_filter({toks}, x -> x = '{t}')) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(terms))
    )
    hits = " + ".join(
        f"CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END" for i in range(len(terms))
    )
    return f"""
WITH per_doc AS (
  SELECT {id_col},
         CAST(len({toks}) AS BIGINT) AS dl,
         {tf_cols}
  FROM {table}
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS total_tokens,
         {df_cols}
  FROM per_doc
)
SELECT {id_col},
       {bm25_score_expr_sql(terms, k1, b)} AS score,
       CAST({hits} AS BIGINT) AS n_terms_hit
FROM per_doc CROSS JOIN stats
WHERE {hits} > 0
ORDER BY score DESC, {id_col} ASC
LIMIT {k}
"""


def nll_lp_int_expr_sql() -> str:
    """Per-token unigram log-probability as an EXACT INTEGER in nano-nats:
    round(ln(count/total) * 1e9) cast to bigint. Summing doubles per doc is
    partition-order-dependent, and at sf1 scale 3 of 50,000 docs landed
    exactly on a 6th-decimal rounding boundary and diverged cross-engine;
    bigint sums are exact and order-free. The round() makes the double
    integral BEFORE the cast, so DuckDB's rounding cast and Spark's
    truncating cast agree. |ln p| < 40 -> |lp_int| < 4e10; a doc's sum
    stays far inside bigint."""
    return "CAST(round(ln(CAST(c AS DOUBLE) / total_tokens) * 1000000000.0) AS BIGINT)"


def nll_final_expr_sql(sum_col: str = "sum_lp", n_col: str = "n_tokens") -> str:
    """Mean nll in nats from the exact nano-nat sum: both divisions exact
    inputs -> correctly-rounded IEEE ops -> deterministic cross-engine."""
    return f"round(-CAST({sum_col} AS DOUBLE) / ({n_col} * 1000000000.0), 6)"


def unigram_nll(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
) -> DataFrame:
    """Per-document unigram negative log likelihood (quality proxy): the
    mean -ln p(token) under the corpus's own unigram distribution. High
    nll = tokens rare in this corpus = boilerplate-free but also
    gibberish-prone; low nll = repetitive/templated. The CCNet filter
    ranks on exactly this shape of score.

    Scale shape: one explode -> vocabulary aggregate (partial+final hash
    agg, map-side combined: corpus-token rows in, |vocab| rows out), then
    the token->logprob equi-join back (the honest corpus-wide shuffle; hot
    tokens — stopwords hit every document — are exactly the skew AQE's
    skew-join splitting handles, enabled in session.get_spark; at 100 TB
    the |head-vocab| rows that carry most of the mass would be broadcast
    and only the tail shuffled), and a per-doc aggregate. The corpus is
    scanned twice (vocab pass + join pass), both column-pruned.
    total_tokens is SUM(c) over the vocab counts — the same integer as a
    separate SUM(token_count) over docs, without the third corpus-wide
    re-tokenize pass that scan used to cost; and the count table fans out
    to that totals agg plus the logprob projection, so `materialize=True`
    lazily localCheckpoints it (vocabulary-sized) to keep the plan at the
    documented two corpus passes.

    Output: (doc_id, n_tokens, nll) for every doc with >= 1 token. The
    per-doc aggregation sums EXACT nano-nat integers (nll_lp_int_expr_sql)
    — float sums over shuffled rows are order-dependent, and the 6-decimal
    output is only deterministic because the sum is integral."""
    toks = docs.select(F.col(id_col), F.explode(T.tokens(text_col)).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    if materialize:
        cnt = cnt.localCheckpoint(eager=False)
    stats = cnt.agg(F.sum("c").cast("bigint").alias("total_tokens"))
    lp = cnt.crossJoin(F.broadcast(stats)).withColumn(
        "lp_int", F.expr(nll_lp_int_expr_sql())
    )
    joined = toks.join(lp.select("tok", "lp_int"), "tok")
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("lp_int").alias("sum_lp"),
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        F.expr(nll_final_expr_sql()).alias("nll"),
    )


def unigram_nll_sql(
    table: str = "documents", text_expr: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of unigram_nll — same lp/final formula strings."""
    toks = T.tokens_sql(text_expr)
    return f"""
WITH toks AS (
  SELECT {id_col}, t.tok AS tok FROM {table}, unnest({toks}) AS t(tok)
),
cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
stats AS (
  SELECT CAST(SUM(CAST(len({toks}) AS BIGINT)) AS BIGINT) AS total_tokens
  FROM {table}
),
lp AS (
  SELECT tok, {nll_lp_int_expr_sql()} AS lp_int FROM cnt CROSS JOIN stats
),
per_doc AS (
  SELECT {id_col},
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(lp.lp_int) AS BIGINT) AS sum_lp
  FROM toks JOIN lp USING (tok)
  GROUP BY {id_col}
)
SELECT {id_col}, n_tokens, {nll_final_expr_sql()} AS nll FROM per_doc
"""


# --- vocabulary coverage ------------------------------------------------------

VOCAB_TOP_K = 100


def vocab_coverage(
    docs: DataFrame,
    group_cols: list[str],
    text_col: str = "text",
    top_k: int = VOCAB_TOP_K,
) -> DataFrame:
    """Vocabulary coverage per group: what fraction of all token
    OCCURRENCES is covered by the group's `top_k` most frequent terms —
    the tokenizer-design / boilerplate-density statistic (a high top-100
    share means the corpus is dominated by few types; the number drives
    vocab-size choices and flags template-heavy sources).

    Scale shape: token occurrences collapse to (group, term) counts in
    one partial+final aggregate (vocabulary-sized, map-side combined);
    the top-k selection rides skew.bounded_topk — partial top-k per
    (group, term-hash bucket), final over the survivors — so no task
    ever sorts a group's whole vocabulary (the q42 lesson); totals and
    the covered sum are tiny final aggregates. Ties broken by term ASC
    (total order — both engines rank identically).

    Output per group: n_types (distinct terms), n_tokens (occurrences),
    covered (occurrences of the top-k terms), coverage (round 9)."""
    from geotiff_tiler_spark.functions import text as T
    from geotiff_tiler_spark.operators import skew

    occ = docs.select(
        *group_cols, F.explode(T.tokens(text_col)).alias("term")
    )
    tf = occ.groupBy(*group_cols, "term").agg(F.count(F.lit(1)).alias("cnt"))
    top = skew.bounded_topk(
        tf,
        part_cols=list(group_cols),
        order_cols=[F.col("cnt").desc(), F.col("term").asc()],
        k=top_k,
        bucket_from="term",
    )
    totals = tf.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("cnt").alias("n_tokens"),
    )
    covered = top.groupBy(*group_cols).agg(F.sum("cnt").alias("covered"))
    return totals.join(covered, list(group_cols)).select(
        *group_cols,
        F.col("n_types").cast("bigint").alias("n_types"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("covered").cast("bigint").alias("covered"),
        F.round(F.col("covered").cast("double") / F.col("n_tokens"), 9).alias(
            "coverage"
        ),
    )


def vocab_coverage_sql(
    group_expr: str,
    text_expr: str = "text",
    top_k: int = VOCAB_TOP_K,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`vocab_coverage` — same shared tokenizer and
    the plain ROW_NUMBER top-k (output-identical to the bounded form)."""
    from geotiff_tiler_spark.functions import text as T

    toks = T.tokens_sql(text_expr)
    return f"""
WITH occ AS (
  SELECT {group_expr} AS g, t.term FROM
    (SELECT {group_expr}, unnest({toks}) AS term FROM {table}) t({group_expr}, term)
),
tf AS (
  SELECT g, term, COUNT(*) AS cnt FROM occ GROUP BY 1, 2
),
ranked AS (
  SELECT g, cnt,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY cnt DESC, term ASC) AS rn
  FROM tf
),
totals AS (
  SELECT g, COUNT(*) AS n_types, SUM(cnt) AS n_tokens FROM tf GROUP BY g
),
cov AS (
  SELECT g, SUM(cnt) AS covered FROM ranked WHERE rn <= {top_k} GROUP BY g
)
SELECT t.g AS {group_expr},
       CAST(t.n_types AS BIGINT) AS n_types,
       CAST(t.n_tokens AS BIGINT) AS n_tokens,
       CAST(c.covered AS BIGINT) AS covered,
       round(c.covered::DOUBLE / t.n_tokens, 9) AS coverage
FROM totals t JOIN cov c ON t.g = c.g
"""


# --- bigram lift (collocation / boilerplate-template mining) -----------------

LIFT_MIN_COUNT = 5


def _lift_expr_sql(c12: str, c1: str, c2: str, n: str) -> str:
    """Shared lift formula: (c12/N) / ((c1/N)*(c2/N)) = c12*N / (c1*c2),
    evaluated as ONE double multiply + one double divide over exact
    bigint counts — both IEEE-correctly-rounded ops, so the double is
    BIT-IDENTICAL across engines (no libm call; PMI would be ln(lift),
    and ln is the one op the engines may round differently — the q47
    lesson — so the op ranks and reports the lift itself).
    Products are formed double-side (c12*N and c1*c2 can overflow int64
    at 100-TB corpus sizes; doubles lose no ordering information here
    because both engines compute the identical rounded values)."""
    return (
        f"(CAST({c12} AS DOUBLE) * CAST({n} AS DOUBLE))"
        f" / (CAST({c1} AS DOUBLE) * CAST({c2} AS DOUBLE))"
    )


def bigram_lift_topk(
    docs: DataFrame,
    group_cols: list[str],
    text_col: str = "text",
    k: int = 10,
    min_count: int = LIFT_MIN_COUNT,
    materialize: bool = True,
) -> DataFrame:
    """Top-k bigram collocations per group by LIFT — observed bigram
    frequency over the frequency expected if its two words were
    independent (PMI's exponential; the collocation-mining statistic
    that separates real phrases and boilerplate templates from chance
    co-occurrence, which raw counts — q42 — cannot).

    Scale shape: token occurrences and bigram occurrences each collapse
    to (group, term)-keyed counts in one partial+final map-side-combined
    aggregate (vocabulary-sized, never corpus-sized); the two unigram
    lookups are equi-joins keyed on (group, word) between
    vocabulary-sized sides (AQE broadcasts the contract-scale ones); the
    min_count gate prunes the hapax tail BEFORE the joins; and the final
    top-k rides skew.bounded_topk so no task sorts a group's whole
    vocabulary (the q42 lesson). Ranking ties broken by bigram ASC —
    total order, identical in both engines (lift doubles are
    bit-identical, see _lift_expr_sql).

    Output per group: rank, bigram, n (bigram count), c1, c2 (word
    counts), lift (round 9)."""
    from geotiff_tiler_spark.operators import skew

    occ = docs.select(*group_cols, F.explode(T.tokens(text_col)).alias("w"))
    uni = occ.groupBy(*group_cols, "w").agg(F.count(F.lit(1)).alias("c"))
    if materialize:
        # uni fans out to THREE consumers (totals, w1 join, w2 join);
        # without materialization each branch re-derives it from scratch
        # and the corpus token explode runs three times (plus the bigram
        # explode: four corpus passes in the physical plan). One lazy
        # localCheckpoint of the vocabulary-sized count table collapses
        # the plan to the documented two corpus-sized passes.
        uni = uni.localCheckpoint(eager=False)
    totals = uni.groupBy(*group_cols).agg(F.sum("c").alias("n_tok"))
    bg = docs.select(
        *group_cols, F.explode(T.shingles(text_col, 2)).alias("bigram")
    )
    cnt = (
        bg.groupBy(*group_cols, "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .withColumn("w2", F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)))
    )
    scored = (
        cnt.join(
            uni.select(*group_cols, F.col("w").alias("w1"), F.col("c").alias("c1")),
            [*group_cols, "w1"],
        )
        .join(
            uni.select(*group_cols, F.col("w").alias("w2"), F.col("c").alias("c2")),
            [*group_cols, "w2"],
        )
        .join(F.broadcast(totals), list(group_cols))
        .withColumn("_lift", F.expr(_lift_expr_sql("n", "c1", "c2", "n_tok")))
    )
    return skew.bounded_topk(
        scored,
        part_cols=list(group_cols),
        order_cols=[F.col("_lift").desc(), F.col("bigram").asc()],
        k=k,
        bucket_from="bigram",
    ).select(
        *group_cols,
        "rank",
        "bigram",
        F.col("n").cast("bigint").alias("n"),
        F.col("c1").cast("bigint").alias("c1"),
        F.col("c2").cast("bigint").alias("c2"),
        F.round("_lift", 9).alias("lift"),
    )


def bigram_lift_topk_sql(
    group_expr: str,
    text_expr: str = "text",
    k: int = 10,
    min_count: int = LIFT_MIN_COUNT,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`bigram_lift_topk` — same shared tokenizer /
    shingle / lift expressions, plain ROW_NUMBER top-k (output-identical
    to the bounded form)."""
    toks = T.tokens_sql(text_expr)
    sh2 = T.shingles_sql(text_expr, 2)
    lift = _lift_expr_sql("b.n", "u1.c", "u2.c", "t.n_tok")
    return f"""
WITH occ AS (
  SELECT {group_expr} AS g, t.w FROM
    (SELECT {group_expr}, unnest({toks}) AS w FROM {table}) t({group_expr}, w)
),
uni AS (
  SELECT g, w, COUNT(*) AS c FROM occ GROUP BY 1, 2
),
totals AS (
  SELECT g, SUM(c) AS n_tok FROM uni GROUP BY g
),
bg AS (
  SELECT g, bigram, COUNT(*) AS n FROM
    (SELECT {group_expr} AS g, unnest({sh2}) AS bigram FROM {table}) t(g, bigram)
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_count}
),
scored AS (
  SELECT b.g, b.bigram, b.n, u1.c AS c1, u2.c AS c2, {lift} AS lift_d
  FROM bg b
  JOIN uni u1 ON b.g = u1.g AND split_part(b.bigram, ' ', 1) = u1.w
  JOIN uni u2 ON b.g = u2.g AND split_part(b.bigram, ' ', 2) = u2.w
  JOIN totals t ON b.g = t.g
),
ranked AS (
  SELECT g, bigram, n, c1, c2, lift_d,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY lift_d DESC, bigram ASC) AS rn
  FROM scored
)
SELECT g AS {group_expr},
       CAST(rn AS BIGINT) AS rank,
       bigram,
       CAST(n AS BIGINT) AS n,
       CAST(c1 AS BIGINT) AS c1,
       CAST(c2 AS BIGINT) AS c2,
       round(lift_d, 9) AS lift
FROM ranked WHERE rn <= {k}
"""

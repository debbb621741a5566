"""Dedup sketches vs pure-Python oracles (independent implementations)."""

import hashlib

from pyspark.sql import functions as F

from geotiff_tiler_spark.operators import dedup


def py_tokens(text):
    return [t for t in text.strip().split() if t]


def py_shingles(text, k=3):
    toks = py_tokens(text)
    return [" ".join(toks[i : i + k]) for i in range(max(len(toks) - k + 1, 0))]


def py_base_hash(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % dedup.MINHASH_P


def py_minhash(text, i):
    a, b = dedup.PERM_CONSTS[i]
    hs = [py_base_hash(s) for s in py_shingles(text)]
    if not hs:
        return (a * dedup.EMPTY_BASE + b) % dedup.MINHASH_P
    return min((a * h + b) % dedup.MINHASH_P for h in hs)


def py_simhash(text, bits=32):
    toks = py_tokens(text)
    hs = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks]
    out = 0
    for b in range(bits):
        s = sum(1 if h & (1 << b) else -1 for h in hs)
        if s > 0:
            out |= 1 << b
    return out


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "one two",  # < k tokens -> empty shingle set
    "",
    "a a a a a a a a",
]


def test_minhash_matches_python(spark):
    df = spark.createDataFrame(list(enumerate(TEXTS)), ["doc_id", "text"])
    sigs = dedup.minhash_signature(df, num_hashes=4)
    for r in sigs.collect():
        for i in range(4):
            assert r[f"mh_{i}"] == py_minhash(TEXTS[r.doc_id], i), (r.doc_id, i)


def test_simhash_matches_python(spark):
    df = spark.createDataFrame(list(enumerate(TEXTS)), ["doc_id", "text"])
    got = {r.doc_id: r.simhash for r in dedup.simhash(df).collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == py_simhash(t), i


def test_lsh_finds_near_duplicates(spark):
    # long texts differing by one word have jaccard ~0.95 -> under the frozen
    # hash family at 4 bands x 4 rows a band collision is near-certain
    base = " ".join(f"w{i % 13} t{i % 7}" for i in range(30))
    near = base + " tail"
    far = " ".join(f"z{i}" for i in range(40))
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far), (3, base)], ["doc_id", "text"]
    )
    sigs = dedup.minhash_signature(df)
    pairs = dedup.lsh_candidate_pairs(dedup.lsh_buckets(sigs)).collect()
    pairset = {(r.doc_a, r.doc_b) for r in pairs}
    assert (0, 3) in pairset  # exact dup always collides
    assert (0, 1) in pairset  # near-dup collides under frozen constants
    assert (0, 2) not in pairset and (1, 2) not in pairset  # unrelated text


def test_ngram_jaccard_exact(spark):
    df = spark.createDataFrame(list(enumerate(TEXTS)), ["doc_id", "text"])
    pairs = spark.createDataFrame([(0, 1)], ["doc_a", "doc_b"])
    out = dedup.ngram_jaccard_pairs(df, pairs).collect()[0]
    a = set(py_shingles(TEXTS[0]))
    b = set(py_shingles(TEXTS[1]))
    want = len(a & b) / len(a | b)
    assert abs(out.jaccard - want) < 1e-12
    assert out.inter == len(a & b)


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z"), (3, "other text")], ["doc_id", "text"]
    )
    rows = {r.text_md5: (r.dup_cnt, r.canonical_doc) for r in dedup.exact_dedup_groups(df).collect()}
    assert sorted(rows.values()) == [(1, 3), (2, 1)]


def test_minhash_fold_matches_exploded_plan(spark):
    """The shuffle-free fold signature must be bit-identical to the
    round-1/2 explode+agg plan on real data, including empty-shingle docs
    (sentinel path)."""
    from pyspark.sql import functions as F

    from geotiff_tiler_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    # add an empty and a sub-k-token doc to force the sentinel branch
    extra = spark.createDataFrame(
        [(10**9, "", "en"), (10**9 + 1, "one two", "en")],
        "doc_id long, text string, lang string",
    )
    docs = docs.select("doc_id", "text", "lang").unionByName(extra)
    a = sorted(map(tuple, dedup.minhash_signature(docs).collect()))
    b = sorted(map(tuple, dedup._minhash_signature_exploded(docs).collect()))
    assert a == b


def test_repetition_metrics_edge_cases(spark):
    """top_cnt must equal max token multiplicity (fold == relational
    definition), with empty/null/uniform docs handled."""
    from geotiff_tiler_spark.functions import text as T

    df = spark.createDataFrame(
        [
            (1, "a b c a b a"),       # top=a(3), n=6, distinct=3
            (2, "x x x x"),           # uniform: top=4
            (3, "u v w x y z"),       # all unique: top=1, top_frac 1/6
            (4, ""),                  # empty
            (5, None),                # null
            (6, "  z   z  "),         # whitespace runs
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in T.repetition_metrics(df).collect()}
    assert (rows[1].n_tokens, rows[1].n_distinct, rows[1].top_cnt) == (6, 3, 3)
    assert rows[1].rep_flag  # top_frac 0.5 > 0.2
    assert (rows[2].top_cnt, rows[2].rep_flag) == (4, True)
    assert (rows[3].top_cnt, rows[3].rep_flag) == (1, False)
    assert (rows[4].n_tokens, rows[4].top_cnt, rows[4].dup_frac) == (0, 0, 0.0)
    assert rows[5].n_tokens in (0, None) or rows[5].top_cnt in (0, None)
    assert (rows[6].n_tokens, rows[6].top_cnt) == (2, 2)


def py_lsh_bucket(sig, band, rows_per_band=4):
    s = "_".join(
        str(sig[band * rows_per_band + r]) for r in range(rows_per_band)
    )
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_lsh_greedy_keep_matches_python(spark):
    """Greedy single-pass LSH keep vs a pure-Python fold: per (band,
    bucket) the min doc_id claims; kept iff all bands claimed. Mix of
    exact dups, near dups, uniques, and degenerate texts."""
    base = " ".join(f"w{i % 13} t{i % 7}" for i in range(30))
    texts = {
        0: base,
        1: base + " tail",       # near dup of 0
        2: base,                 # exact dup of 0: must be dropped
        3: " ".join(f"z{i}" for i in range(40)),  # unique
        4: "",                   # empty -> sentinel signature
        5: "",                   # second empty: collides with 4, dropped
        6: "one two",            # < k tokens -> sentinel too: dropped
    }
    df = spark.createDataFrame(sorted(texts.items()), ["doc_id", "text"])
    kept = {r.doc_id for r in dedup.lsh_greedy_keep(df).collect()}

    sigs = {
        d: [py_minhash(t, i) for i in range(dedup.NUM_HASHES)]
        for d, t in texts.items()
    }
    bucket_min = {}
    for d, sig in sigs.items():
        for b in range(dedup.BANDS):
            key = (b, py_lsh_bucket(sig, b, dedup.ROWS_PER_BAND))
            bucket_min[key] = min(bucket_min.get(key, d), d)
    kept_py = {
        d
        for d, sig in sigs.items()
        if all(
            bucket_min[(b, py_lsh_bucket(sig, b, dedup.ROWS_PER_BAND))] == d
            for b in range(dedup.BANDS)
        )
    }
    assert kept == kept_py
    assert 2 not in kept and 5 not in kept and 6 not in kept  # dup chains
    assert 0 in kept and 3 in kept


def test_dup_gram_stats_hand_case(spark):
    # k=3: docs 0 and 1 share exactly one 3-gram ("a b c"); doc 2's
    # repeated gram collapses under array_distinct (counted once, unique
    # corpus-wide); doc 3 is below k tokens and must be excluded.
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c x"), (2, "z z z z"), (3, "q r")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_grams, r.n_dup_grams, r.dup_frac)
        for r in dedup.dup_gram_stats(df, k=3).collect()
    }
    assert got == {0: (2, 1, 0.5), 1: (2, 1, 0.5), 2: (1, 0, 0.0)}


def test_dup_gram_stats_matches_duckdb(spark):
    import duckdb

    rows = [(i, t) for i, t in enumerate(TEXTS)] + [
        (90, TEXTS[0]),  # exact dup -> dup_frac 1.0 on both sides
        (91, ""),  # empty -> excluded on both sides
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_grams, r.n_dup_grams, r.dup_frac)
        for r in dedup.dup_gram_stats(df, k=3).collect()
    }
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(dedup.dup_gram_sql(k=3)).fetchall()
    }
    assert got == want
    assert got[90][2] == 1.0
    assert 91 not in got


def test_dup_gram_python_tokenizer_parity(spark):
    """r6 q51 rewrite: the Python tokenizer inside _gram_hash_rows must
    equal the JVM tokens() contract byte-for-byte, including Java-\\s-only
    whitespace (\\x0b yes, \\xa0/\\x85/\\x1c no) and trim-space-only."""
    from geotiff_tiler_spark.functions import text as T
    from geotiff_tiler_spark.operators import dedup

    adv = ["", " ", "a", " a b ", "a\tb\x0bc\fd\re\nf", "a\xa0b", "x \x1c y",
           "tab\t\t end ", " em g", "trailing \t", "\t lead", "a  b   c",
           None, "\x0b\x0b", "é ü ñ", "a\x85b"]
    rows = [(i, s) for i, s in enumerate(adv)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    jvm = {
        r.doc_id: (r.toks or [])
        for r in df.select("doc_id", T.tokens("text").alias("toks")).collect()
    }
    for i, s in rows:
        assert jvm.get(i, []) == dedup._py_tokens(s, " "), (i, repr(s))


def test_dup_gram_stats_arrow_matches_expr_form(spark):
    """r6 q51 rewrite: the mapInArrow gram kernel + reused-exchange plan
    must reproduce the retained expression form exactly (all columns,
    including the rounded dup_frac), on real data and on adversarial
    whitespace docs."""
    from geotiff_tiler_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = sorted(tuple(r) for r in dedup.dup_gram_stats(docs).collect())
    b = sorted(tuple(r) for r in dedup._dup_gram_stats_expr(docs).collect())
    assert a == b and len(a) > 0

    adv = ["a b c d e f g h a b c d e f g h", "a\tb\x0bc d e f g h i j",
           "", None, "one two", "x " * 20]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(adv)], "doc_id long, text string"
    )
    a = sorted(tuple(r) for r in dedup.dup_gram_stats(df, k=2).collect())
    b = sorted(tuple(r) for r in dedup._dup_gram_stats_expr(df, k=2).collect())
    assert a == b and len(a) > 0


def test_lsh_buckets_arrow_matches_expr(spark):
    """r6 banding kernel: lsh_buckets_arrow must equal
    lsh_buckets(minhash_signature(docs)) row-for-row, including the
    empty/short/null-text sentinel path."""
    from geotiff_tiler_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = sorted((r.doc_id, r.band, r.bucket) for r in dedup.lsh_buckets_arrow(docs).collect())
    b = sorted(
        (r.doc_id, r.band, r.bucket)
        for r in dedup.lsh_buckets(dedup.minhash_signature(docs)).collect()
    )
    assert a == b and len(a) > 0

    adv = [(1, None), (2, ""), (3, "one two"), (4, "one two three"),
           (5, "a b c d e f"), (6, "a  b\tc \x0b d"), (7, "x y z x y z x y z")]
    df = spark.createDataFrame(adv, "doc_id long, text string")
    a = sorted((r.doc_id, r.band, r.bucket) for r in dedup.lsh_buckets_arrow(df).collect())
    b = sorted(
        (r.doc_id, r.band, r.bucket)
        for r in dedup.lsh_buckets(dedup.minhash_signature(df)).collect()
    )
    assert a == b and len(a) == 7 * 4


def test_arrow_row_kernels_match_jvm_explode(spark):
    """r6: token_rows / gram_rows must equal the JVM
    select(cols, explode(tokens/shingles)) row-multiset exactly,
    including null/empty/short-text drop behavior."""
    from pyspark.sql import functions as F

    from geotiff_tiler_spark.functions import text as T

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = sorted((r.doc_id, r.tok) for r in T.token_rows(docs, ["doc_id"]).collect())
    b = sorted(
        (r.doc_id, r.tok)
        for r in docs.select("doc_id", F.explode(T.tokens("text")).alias("tok")).collect()
    )
    assert a == b and len(a) > 0
    a = sorted((r.lang, r.gram) for r in T.gram_rows(docs, ["lang"], k=2).collect())
    b = sorted(
        (r.lang, r.gram)
        for r in docs.select("lang", F.explode(T.shingles("text", 2)).alias("gram")).collect()
    )
    assert a == b and len(a) > 0

    adv = [(1, None, "s1"), (2, "", "s2"), (3, "one", "s1"), (4, " a\tb \x0b c ", "s2")]
    df = spark.createDataFrame(adv, "doc_id long, text string, source string")
    a = sorted((r.source, r.tok) for r in T.token_rows(df, ["source"]).collect())
    b = sorted(
        (r.source, r.tok)
        for r in df.select("source", F.explode(T.tokens("text")).alias("tok")).collect()
    )
    assert a == b
    a = sorted((r.doc_id, r.gram) for r in T.gram_rows(df, ["doc_id"], k=2).collect())
    b = sorted(
        (r.doc_id, r.gram)
        for r in df.select("doc_id", F.explode(T.shingles("text", 2)).alias("gram")).collect()
    )
    assert a == b

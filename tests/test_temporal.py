"""temporal.asof_join / temporal.interval_join vs brute-force python
references, including the tie and boundary cases the grid/window
formulations must get right."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from geotiff_tiler_spark.operators import temporal


def _brute_asof(left_rows, right_rows):
    """{left_tie: (carry...)} — latest right with (ord, tie) <= -ordered
    max among ord <= left.ord, per key; None when no prior right."""
    out = {}
    for lk, lord, ltie in left_rows:
        best = None
        for rk, rord, rtie, *carry in right_rows:
            if rk == lk and rord <= lord:
                cand = (rord, rtie, carry)
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
        out[ltie] = None if best is None else tuple(best[2])
    return out


def test_asof_join_matches_brute(spark):
    # ties: click at the exact ts of a view (match), two views sharing a
    # ts (largest id wins), click before any view (NULL), separate keys
    left = [  # (user, ord, id)
        (1, 100, 10),
        (1, 50, 11),   # before any view -> NULL carries
        (1, 200, 12),
        (2, 100, 20),
        (3, 999, 30),  # key with no right rows at all
    ]
    right = [  # (user, ord, id, val)
        (1, 100, 5, 1.5),   # exactly at left ord 100 -> matches (<=)
        (1, 100, 6, 2.5),   # same ord, larger id -> wins the tie
        (1, 150, 7, 3.5),
        (2, 90, 8, 4.5),
    ]
    l = spark.createDataFrame(left, "user_id long, ts long, lid long")
    r = spark.createDataFrame(right, "user_id long, ts long, lid long, val double")
    r = r.withColumn("rid", F.col("lid")).withColumn("rval", F.col("val")).drop("val")
    got = {
        row["lid"]: (row["rid"], row["rval"])
        for row in temporal.asof_join(
            l, r, keys=["user_id"], ord_col="ts", tie_col="lid",
            carry=["rid", "rval"], prefix="",
        ).collect()
    }
    want = _brute_asof(left, [(u, o, i, i, v) for (u, o, i, v) in right])
    assert set(got) == set(want)
    for lid, exp in want.items():
        if exp is None:
            assert got[lid] == (None, None), lid
        else:
            assert got[lid] == exp, lid


def test_asof_join_all_rows_kept(spark):
    # left row count is invariant (as-of never drops or duplicates lefts)
    left = [(1, i, i) for i in range(50)]
    right = [(1, i * 3, 1000 + i, float(i)) for i in range(20)]
    l = spark.createDataFrame(left, "user_id long, ts long, lid long")
    r = spark.createDataFrame(right, "user_id long, ts long, lid long, v double")
    out = temporal.asof_join(
        l, r, keys=["user_id"], ord_col="ts", tie_col="lid", carry=["v"], prefix=""
    )
    assert out.count() == len(left)
    assert sorted(row["lid"] for row in out.select("lid").collect()) == list(range(50))


def test_asof_join_null_ord_rows(spark):
    # SQL semantics: a NULL-ord right row satisfies no inequality, so its
    # carries must never surface (Spark's NULLS FIRST window sort would
    # otherwise leak them into every left row before the first real right
    # row); a NULL-ord left row matches no right row and carries NULL.
    left = [(1, None, 10), (1, 100, 11), (1, 300, 12)]
    right = [
        (1, None, 5, 111.0),  # must never be carried
        (1, 200, 6, 222.0),
    ]
    l = spark.createDataFrame(left, "user_id long, ts long, lid long")
    r = spark.createDataFrame(right, "user_id long, ts long, lid long, rval double")
    got = {
        row["lid"]: row["rval"]
        for row in temporal.asof_join(
            l, r, keys=["user_id"], ord_col="ts", tie_col="lid",
            carry=["rval"], prefix="",
        ).collect()
    }
    assert got == {10: None, 11: None, 12: 222.0}


def _brute_intervals(points, intervals):
    return sorted(
        (p[2], i[2])
        for p in points
        for i in intervals
        if p[0] == i[0] and i[3] <= p[1] <= i[4]
    )


def test_interval_join_matches_brute_across_boundaries(spark):
    W = 100
    # intervals deliberately straddle cell boundaries; points sit ON
    # boundaries (closed-interval semantics) and exactly at lo/hi
    points = [  # (key, ord, pid)
        (1, 0, 1), (1, 100, 2), (1, 199, 3), (1, 200, 4), (1, 250, 5),
        (2, 150, 6), (3, 500, 7),
    ]
    intervals = [  # (key, _, iid, lo, hi)
        (1, 0, 101, 50, 150),    # spans cells 0-1
        (1, 0, 102, 100, 200),   # both endpoints on boundaries
        (1, 0, 103, 190, 460),   # long interval: 3 cells
        (2, 0, 104, 150, 150),   # degenerate single-point interval
        (3, 0, 105, 501, 600),   # point at 500 just misses (lo exclusive? no: 500 < 501)
    ]
    p = spark.createDataFrame(
        [(k, o, i) for (k, o, i) in points], "key long, ord long, pid long"
    )
    iv = spark.createDataFrame(
        [(k, i, lo, hi) for (k, _, i, lo, hi) in intervals],
        "key long, iid long, lo long, hi long",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in temporal.interval_join(
            p, iv, keys=["key"], point_ord="ord", lo_col="lo", hi_col="hi",
            cell_width=W,
        ).collect()
    )
    assert got == _brute_intervals(points, intervals)
    # no-dedup invariant: pair multiplicity is exactly 1
    assert len(got) == len(set(got))


def test_asof_join_single_shuffle_plan(spark):
    # the whole point of the union+window formulation: ONE exchange (hash
    # by key), zero joins — never an inequality cross product
    l = spark.createDataFrame([(1, 5, 1)], "user_id long, ts long, lid long")
    r = spark.createDataFrame([(1, 3, 2, 1.0)], "user_id long, ts long, lid long, v double")
    plan = temporal.asof_join(
        l, r, keys=["user_id"], ord_col="ts", tie_col="lid", carry=["v"], prefix=""
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan and "CartesianProduct" not in plan, plan


def test_interval_join_no_dedup_needed_plan(spark):
    # the physical plan must contain no aggregate above the join other
    # than what the caller adds — the operator itself emits raw pairs
    p = spark.createDataFrame([(1, 5, 1)], "key long, ord long, pid long")
    iv = spark.createDataFrame([(1, 7, 0, 10)], "key long, iid long, lo long, hi long")
    plan = temporal.interval_join(
        p, iv, keys=["key"], point_ord="ord", lo_col="lo", hi_col="hi", cell_width=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "Deduplicate" not in plan and "Distinct" not in plan

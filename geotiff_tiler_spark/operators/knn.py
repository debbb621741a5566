"""Exact k-nearest-neighbor join via cell-ring expansion.

The north rule mandates kNN with cell-ring expansion + a sort-merge
fallback; the reference has no kNN, so the semantics are pinned here and
verified against a brute-force oracle:

- distance: squared planar Euclidean on (lon, lat) degrees (deterministic
  double arithmetic, identical in the DuckDB oracle);
- ties: broken by neighbor id ascending;
- self-pairs excluded;
- EXACT result (not approximate): ring expansion terminates for a query
  only when its current k-th candidate distance is <= the minimum possible
  distance to any unexplored cell.

Termination bound: after exploring Chebyshev rings 0..r around the query's
cell, every unexplored point lies in a cell with ring index >= r+1, hence
at planar distance >= r * min(cell_w, cell_h). If kth_dist^2 <=
(r * min_cell)^2 the answer can no longer change.

Scale shape: each round is one equi-join points->ring-cells (the ring is a
bounded explode of (2r+1)^2 - (2r-1)^2 = 8r cell offsets) + a per-query
top-k window. Rounds are driver-side iterations over DataFrames; at 100 TB
each round is fully distributed, and the number of rounds is data-density
bounded (max_ring caps it; the remainder falls back to the brute-force
sort-merge join on the few starved queries — e.g. queries in empty oceans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geotiff_tiler_spark.functions import geo


def _dist2():
    dx = F.col("q_lon") - F.col("n_lon")
    dy = F.col("q_lat") - F.col("n_lat")
    return dx * dx + dy * dy


def _topk(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def knn_bruteforce(queries: DataFrame, points: DataFrame, k: int) -> DataFrame:
    """Sort-merge/broadcast fallback: all-pairs + per-query top-k.

    queries: (query_id, q_lon, q_lat); points: (neighbor_id, n_lon, n_lat).
    The oracle-equivalent baseline, and the fallback for queries the ring
    expansion starves out.
    """
    cand = (
        F.broadcast(queries)
        .crossJoin(points)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("dist2", _dist2())
    )
    return _topk(cand, k).select("query_id", "rank", "neighbor_id", "dist2")


def knn_cell_ring(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    res: int | None = None,
    max_ring: int = 4,
    target_rows_per_cell: int = 2_000,
    checkpoint_eager: bool = True,
) -> DataFrame:
    """Exact kNN: iterative ring expansion, brute-force fallback for the rest.

    Each iteration r: join still-unresolved queries to points in cells at
    Chebyshev ring exactly r, accumulate, keep per-query top-k, resolve
    queries whose kth distance is within the ring-r guarantee. Queries
    still unresolved after max_ring go through `knn_bruteforce`.

    `res=None` derives the resolution from the point density
    (spatial_join.choose_res): the coarsest level whose hottest cell stays
    under `target_rows_per_cell`, so ring joins stay task-sized at any
    data scale instead of relying on a fixed res=4 (256 world cells).
    The result is EXACT for every res — only the join granularity moves.

    r6: the default target dropped 100_000 -> 2_000. A ring probe emits
    ~(2r+1)^2 * target candidate rows PER QUERY, so the old default made
    every query scan ~9e5 rows at r=1 — measured 53.8 s at a 200k-point
    4x-scaled corpus vs 4.2 s at target=2000 (res 2 -> 4; identical
    output, the ring-vs-brute pytest and the q24 oracle pin exactness).
    2000 = 400x the contract k — far above what exactness needs, far
    below the old scan-everything regime; still data-adaptive through
    choose_res, still capped at res hi=8 (the documented limit at
    >= 65k-cell scales).
    """
    if res is None:
        from geotiff_tiler_spark.operators.spatial_join import choose_res

        res = choose_res(
            points, "n_lon", "n_lat", target_rows_per_cell=target_rows_per_cell
        )
    n = 1 << res
    cell_w = 360.0 / n
    cell_h = 180.0 / n
    min_cell = min(cell_w, cell_h)

    q = queries.withColumn("q_ix", geo.cell_ix("q_lon", res)).withColumn(
        "q_iy", geo.cell_iy("q_lat", res)
    )
    p = points.withColumn("n_ix", geo.cell_ix("n_lon", res)).withColumn(
        "n_iy", geo.cell_iy("n_lat", res)
    ).withColumn("n_cell", geo.pack_cell("n_ix", "n_iy", res))

    unresolved = q
    best: DataFrame | None = None
    resolved_parts: list[DataFrame] = []
    # r6: one up-front count replaces the per-round unresolved.isEmpty()
    # action (which re-evaluated the growing anti-join chain every round);
    # the loop now breaks on arithmetic over the per-round done counts.
    n_unres = unresolved.count()

    # r6: rings 0 and 1 probe together in the first iteration (9 offsets)
    # when max_ring >= 1 — the r=0 round's resolution check had guard 0
    # (see below), so running it separately only added a probe join, a
    # top-k window and a checkpoint job before the first decisive check.
    # The candidate set at the r=1 check is identical (top-k over the
    # union of rings 0..1 == top-k of per-ring top-ks under the total
    # (dist2, neighbor_id) order), so the output is unchanged.
    start = 1 if max_ring > 0 else 0
    for r in range(start, max_ring + 1):
        if r == start:
            offs = [
                (dx, dy)
                for dx in range(-r, r + 1)
                for dy in range(-r, r + 1)
            ]
        else:
            offs = [
                (dx, dy)
                for dx in range(-r, r + 1)
                for dy in range(-r, r + 1)
                if max(abs(dx), abs(dy)) == r
            ]
        off_arr = F.array([F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offs])
        probe = (
            unresolved.withColumn("_o", F.explode(off_arr))
            .withColumn("_ix", F.col("q_ix") + F.col("_o.dx"))
            .withColumn("_iy", F.col("q_iy") + F.col("_o.dy"))
            .filter(
                (F.col("_ix") >= 0) & (F.col("_ix") < n) & (F.col("_iy") >= 0) & (F.col("_iy") < n)
            )
            .withColumn("n_cell", geo.pack_cell("_ix", "_iy", res))
            .select("query_id", "q_lon", "q_lat", "q_ix", "q_iy", "n_cell")
        )
        new_cand = (
            probe.join(p.select("neighbor_id", "n_lon", "n_lat", "n_cell"), "n_cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("dist2", _dist2())
            .select("query_id", "q_lon", "q_lat", "q_ix", "q_iy", "neighbor_id", "dist2")
        )
        best = new_cand if best is None else best.unionByName(new_cand)
        # keep only per-query top-k candidates between rounds (bounds state)
        best = _topk(best, k).drop("rank")
        # cut lineage across rounds; eager (one job barrier per round) vs
        # lazy (materializes under the round's first action) measured by
        # tools/bench_knn_ab.py — BENCH/knn_ab.json records both orders.
        # Verdict: indistinguishable on this box — in BOTH pair orders the
        # SECOND-run variant wins (warm-state recency, ~2x), so the
        # cadence itself is within noise. Eager stays the default: the
        # barrier materializes `best` exactly where the loop's invariants
        # assume it bounded.
        best = best.localCheckpoint(eager=checkpoint_eager)

        # a query is resolved when it has k candidates AND the kth distance
        # fits inside the ring-r guarantee radius. (With ring fusion above
        # a standalone r=0 round only exists when max_ring == 0; its
        # guard-0 check can resolve exact-duplicate stacks, matching the
        # pre-r6 behavior for that configuration.)
        guard = (r * min_cell) ** 2
        stats = best.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n_cand"), F.max("dist2").alias("kth")
        )
        done_ids = stats.filter((F.col("n_cand") >= k) & (F.col("kth") <= F.lit(guard))).select(
            "query_id"
        )
        done_n = done_ids.count()
        if done_n:
            resolved_parts.append(
                best.join(done_ids, "query_id", "left_semi").select(
                    "query_id", "neighbor_id", "dist2"
                )
            )
            best = best.join(done_ids, "query_id", "left_anti")
            unresolved = unresolved.join(done_ids, "query_id", "left_anti")
            n_unres -= done_n
        if n_unres == 0:
            break
    else:
        # fallback: brute force for the starved queries
        fb = knn_bruteforce(
            unresolved.select("query_id", "q_lon", "q_lat"),
            points.select("neighbor_id", "n_lon", "n_lat"),
            k,
        ).select("query_id", "neighbor_id", "dist2")
        resolved_parts.append(fb)

    out = resolved_parts[0]
    for part in resolved_parts[1:]:
        out = out.unionByName(part)
    return _topk(out.distinct(), k).select("query_id", "rank", "neighbor_id", "dist2")

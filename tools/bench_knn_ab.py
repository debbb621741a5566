"""A/B: kNN ring-round checkpoint cadence — eager vs lazy localCheckpoint
(round-4 VERDICT minor item). Writes BENCH/knn_ab.json.

Eager inserts one job barrier per ring round (max_ring+1 barriers); lazy
defers materialization to the round's first action (the stats aggregate),
the pattern dedup.ngram_jaccard_pairs established. Same synthetic input
for both variants, output parity asserted.

Usage: python tools/bench_knn_ab.py [n_points] [n_queries] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from pyspark.sql import functions as F

    from geotiff_tiler_spark.operators.knn import knn_cell_ring
    from geotiff_tiler_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.driver.memory": "16g",
                    "spark.ui.showConsoleProgress": "false"},
    )
    base = spark.range(n_points)
    u = lambda tag: (
        F.pmod(F.xxhash64(F.col("id"), F.lit(tag)), F.lit(1 << 20)).cast("double")
        / F.lit(float(1 << 20))
    )
    points = base.select(
        F.col("id").alias("neighbor_id"),
        (u("lon") * 360.0 - 180.0).alias("n_lon"),
        (u("lat") * 180.0 - 90.0).alias("n_lat"),
    ).persist()
    points.count()
    queries = (
        points.filter(F.col("neighbor_id") % (n_points // n_queries) == 0)
        .select(
            F.col("neighbor_id").alias("query_id"),
            F.col("n_lon").alias("q_lon"),
            F.col("n_lat").alias("q_lat"),
        )
        .persist()
    )
    queries.count()

    out = {"n_points": n_points, "n_queries": n_queries, "cpus": cpus,
           "load_at_start": round(os.getloadavg()[0], 2)}
    results = {}
    # untimed warmup pass (codegen + JVM + cache warm): without it the
    # first-run variant absorbs ~100 s of one-time cost and the A/B
    # measures ORDER, not cadence (observed: eager-first 214/114, lazy-
    # first 157/48 — both orders' SECOND variant looks better)
    knn_cell_ring(queries, points, k=5, checkpoint_eager=True).count()
    from geotiff_tiler_spark.session import clear_persistent_rdds as _clear

    _clear(spark)
    points.persist(); points.count()
    queries.persist(); queries.count()
    # BOTH pair orders: the warm-state recency effect (~2x, the second of
    # each pair wins) would otherwise masquerade as a cadence difference
    times: dict[str, list[float]] = {"eager": [], "lazy": []}
    for name, eager in (
        ("eager", True), ("lazy", False), ("lazy", False), ("eager", True),
        ("eager", True), ("lazy", False),
    ):
        t0 = time.time()
        df = knn_cell_ring(queries, points, k=5, checkpoint_eager=eager)
        rows = sorted(map(tuple, df.collect()))
        times[name].append(round(time.time() - t0, 2))
        if name not in results:
            results[name] = rows
        _clear(spark)
        points.persist(); points.count()  # re-pin inputs the clear released
        queries.persist(); queries.count()
    assert results["eager"] == results["lazy"], "variant outputs diverge"
    out["times"] = times
    out["sec_eager"] = min(times["eager"])
    out["sec_lazy"] = min(times["lazy"])
    out["rows"] = len(results["eager"])
    out["ts"] = int(time.time())
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "knn_ab.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Synthesize a K-replica scaled sf directory from a base one (round-4
VERDICT next-round #8: prove the adaptive paths — choose_res, adaptive
sign bits, IVF sizing — stay cross-engine-stable when `n` changes regime,
by running tools/check_contract.py at ~sf1 scale).

Replication is key-offset: replica i shifts every surrogate key by
i * (max_key + 1) consistently across FK pairs (orders.o_custkey moves
with customer.c_custkey, etc.), so all join structure replicates.
Documents get a per-replica text suffix (distinct hashes/shingles/
geocodes per replica — the dedup and spatial paths see fresh data, not
10x duplicate groups) and embeddings a per-replica deterministic sign
flip per coordinate (float32 preserved). region/nation are dimensions
with a fixed key range and are copied as-is. Replica 0 is bit-identical
to the base.

Usage: python tools/make_scaled_sf.py <base_sf_dir> <out_dir> [K]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from geotiff_tiler_spark.session import get_spark

    spark = get_spark(master="local[16]", shuffle_partitions=16)

    def load(t):
        return spark.read.parquet(f"{base}/{t}.parquet")

    def span(df, key):
        return int(df.agg(F.max(key)).first()[0]) + 1

    cust, supp, part, orders, li = (
        load("customer"), load("supplier"), load("part"), load("orders"), load("lineitem"),
    )
    ev, docs, emb = load("events"), load("documents"), load("embeddings")
    C, S, P = span(cust, "c_custkey"), span(supp, "s_suppkey"), span(part, "p_partkey")
    O, E, U = span(orders, "o_orderkey"), span(ev, "event_id"), span(ev, "user_id")
    D, V = span(docs, "doc_id"), span(emb, "vec_id")

    def replicate(df, shifts: dict[str, int], extra=None):
        parts = []
        for i in range(k):
            r = df
            for col, width in shifts.items():
                r = r.withColumn(col, (F.col(col) + F.lit(i * width)).cast("bigint"))
            if extra is not None:
                r = extra(r, i)
            parts.append(r)
        outdf = parts[0]
        for p_ in parts[1:]:
            outdf = outdf.unionByName(p_)
        return outdf

    def doc_extra(r, i):
        if i == 0:
            return r
        txt = F.concat(F.col("text"), F.lit(f" r{i}"))
        return r.withColumn("text", txt).withColumn("n_chars", F.length(txt).cast("bigint"))

    def emb_extra(r, i):
        if i == 0:
            return r
        # deterministic per-(replica, coordinate) sign flip; float32 kept
        flipped = F.transform(
            "embedding",
            lambda x, j: (
                x
                * F.when(
                    F.pmod(F.xxhash64(F.lit(i), j), F.lit(2)) == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0)).cast("float")
            ).cast("float"),
        )
        return r.withColumn("embedding", flipped)

    plan = {
        "region": (load("region"), None, None),
        "nation": (load("nation"), None, None),
        "customer": (cust, {"c_custkey": C}, None),
        "supplier": (supp, {"s_suppkey": S}, None),
        "part": (part, {"p_partkey": P}, None),
        "orders": (orders, {"o_orderkey": O, "o_custkey": C}, None),
        "lineitem": (li, {"l_orderkey": O, "l_partkey": P, "l_suppkey": S}, None),
        "events": (ev, {"event_id": E, "user_id": U}, None),
        "documents": (docs, {"doc_id": D}, doc_extra),
        "embeddings": (emb, {"vec_id": V}, emb_extra),
    }
    import glob
    import shutil

    os.makedirs(out, exist_ok=True)
    for name, (df, shifts, extra) in plan.items():
        target = df if shifts is None else replicate(df, shifts, extra)
        # single FILE per table (the driver's testdata layout — DuckDB
        # views point at '{dir}/{t}.parquet' without a glob)
        tmp = f"{out}/_tmp_{name}"
        target.coalesce(1).write.mode("overwrite").parquet(tmp)
        (part,) = glob.glob(f"{tmp}/part-*.parquet")
        shutil.move(part, f"{out}/{name}.parquet")
        shutil.rmtree(tmp)
        print(f"{name}: {target.count()} rows")
    spark.stop()
    print(f"scaled x{k} -> {out}")


if __name__ == "__main__":
    main()

"""Volume stress for the global graph tier: synthesize an edge table with
the shapes that hurt label propagation (long chains for diameter, stars
for skew, random bridges for component merging) and time
``weakly_connected_components`` end-to-end, optionally in durable
checkpoint mode.

Usage: python tools/stress_graph.py [n_nodes] [--durable]
"""
from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    from legal_ner_spark.session import get_spark
    from pyspark.sql import functions as F
    from legal_ner_spark.operators.graph import weakly_connected_components

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    durable = "--durable" in sys.argv
    spark = get_spark(master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    ids = spark.range(n).select(F.col("id"))
    # chains of length 64 (diameter stress: 15,625 chains at n=1M),
    # a 1%-of-nodes mega-star (skew stress), and sparse random bridges
    chains = ids.filter("id % 64 != 63").select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    star = ids.filter(f"id < {n // 100}").select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst"))
    bridges = ids.filter("id % 997 = 0").select(
        F.col("id").alias("src"),
        F.pmod(F.xxhash64("id"), F.lit(n)).alias("dst"))
    edges = chains.union(star).union(bridges).filter("src != dst").cache()
    n_edges = edges.count()

    cdir = tempfile.mkdtemp() if durable else None
    t0 = time.time()
    comp = weakly_connected_components(edges, max_iter=30,
                                       checkpoint_dir=cdir)
    n_comp = comp.select("component").distinct().count()
    dt = time.time() - t0
    mode = "durable-parquet" if durable else "localCheckpoint"
    print(f"WCC[{mode}]: {n} nodes, {n_edges} edges -> {n_comp} components "
          f"in {dt:.1f}s ({n_edges / dt:,.0f} edges/s)")

    # ---- weighted SSSP over deep chains with skip edges ----------------
    # k chains of length L; unit-successor edges weight 2, skip edges
    # (i -> i+2) weight 3: dist(pos) = 3*(pos//2) + 2*(pos%2), so the
    # total over every node is k * Σ — closed form; a mis-relaxed
    # frontier or a double-counted improvement breaks it exactly.
    from legal_ner_spark.operators.graph import shortest_paths
    L = 64
    k = max(n // L, 1)
    pos = F.col("id") % L
    e1 = (spark.range(k * L).filter(pos < L - 1)
          .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"),
                  F.lit(2.0).alias("weight")))
    e2 = (spark.range(k * L).filter(pos < L - 2)
          .select(F.col("id").alias("src"), (F.col("id") + 2).alias("dst"),
                  F.lit(3.0).alias("weight")))
    srcs = spark.range(k).select((F.col("id") * L).alias("node"))
    t0 = time.time()
    out = shortest_paths(e1.unionByName(e2), srcs, max_iter=L)
    row = out.agg(F.count("*").alias("n"),
                  F.sum("dist").alias("s")).collect()[0]
    dt2 = time.time() - t0
    want_sum = k * sum(3 * (i // 2) + 2 * (i % 2) for i in range(L))
    assert row["n"] == k * L, (row["n"], k * L)
    assert int(row["s"]) == want_sum, (row["s"], want_sum)
    print(f"SSSP: {k} chains x {L} nodes (skip edges) -> "
          f"{row['n']} settled, dist-sum EXACT in {dt2:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()

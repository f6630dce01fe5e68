"""Hub stress for the degree-ORIENTED triangle enumeration: a star
whose hub has ``n_leaves`` neighbors plus a planted ring of triangles
through the hub's first few leaves.

The naive 3-join on unoriented canonical edges builds every wedge at
every corner — the hub alone contributes C(n_leaves, 2) wedges
(2×10¹⁰ rows at 200k leaves: one reducer melts).  The oriented form
builds wedges only at each triangle's LOWEST-degree corner, and the
hub (highest degree in the graph) is the lowest corner of nothing —
its oriented out-degree is 0-ish, so the whole star contributes ~no
wedge rows and the job's cost is the planted triangles plus the degree
aggregate.

Usage: python tools/stress_triangles.py [n_leaves] [n_tris]
Prints one JSON line; asserts the exact triangle count.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    from pyspark.sql import functions as F
    from legal_ner_spark.session import get_spark
    from legal_ner_spark.operators import graph

    n_leaves = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_tris = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    spark = get_spark(master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    # star: hub ↔ leaf_i for all i; triangles: (leaf_{2j}, leaf_{2j+1})
    # edges close (hub, leaf_{2j}, leaf_{2j+1}) for j < n_tris
    star = spark.range(n_leaves).select(
        F.lit("hub").alias("src"),
        F.concat(F.lit("leaf"), F.col("id")).alias("dst"))
    ring = spark.range(n_tris).select(
        F.concat(F.lit("leaf"), F.col("id") * 2).alias("src"),
        F.concat(F.lit("leaf"), F.col("id") * 2 + 1).alias("dst"))
    edges = star.unionByName(ring).repartition(64).cache()
    n_edges = edges.count()

    t0 = time.time()
    tri = graph.triangles(edges)
    n = tri.count()
    wall = time.time() - t0
    assert n == n_tris, (n, n_tris)
    # spot-check membership: every triangle contains the hub
    assert tri.filter((F.col("node_a") != "hub")
                      & (F.col("node_b") != "hub")
                      & (F.col("node_c") != "hub")).count() == 0

    print(json.dumps({
        "n_leaves": n_leaves, "n_edges": n_edges,
        "n_triangles": n, "wall_s": round(wall, 1),
        "naive_hub_wedges": n_leaves * (n_leaves - 1) // 2,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

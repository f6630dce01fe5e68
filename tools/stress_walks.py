"""Hub stress for the random-walk neighbor RANKING — the r5 fix for the
last per-key-unbounded shape in the graph tier.

Before: rank = row_number over Window.partitionBy(node).orderBy(dst) —
a d-degree hub puts its whole adjacency in ONE window partition, so a
10⁶⁺-degree hub becomes a single straggler task sorting d rows every
materialization.  After: the per-node order is (md5-bucket(dst), dst) —
rank windows partition by (node, bucket) with ~d/256 rows per task and
the offsets come from a per-node window over ≤256 count rows.

This tool builds a ``D``-leaf star (hub degree D ≥ 10⁶), times BOTH
rank shapes over the symmetrized adjacency (the old shape is inlined
here for the comparison — it no longer exists in the operator), then
runs the full ``random_walks`` end-to-end on the star and validates
every transition follows a real edge.  Prints one JSON line; the
committed row lives in BENCH.md.

Usage: python tools/stress_walks.py [hub_degree] [n_probe_nodes]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window, functions as F  # noqa: E402


def main() -> None:
    from legal_ner_spark.session import get_spark
    from legal_ner_spark.operators import graph

    d = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    edges = (spark.range(d)
             .select(F.lit("hub").alias("src"),
                     F.concat(F.lit("leaf"), F.col("id")).alias("dst")))
    und0 = (edges.select("src", "dst")
            .filter(F.col("src") != F.col("dst")).distinct())
    und = (und0.union(und0.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
           .distinct()
           .select(F.col("src").alias("nsrc"), F.col("dst").alias("ndst"))
           .cache())
    und.count()

    # OLD shape (straggler): one window partition per node
    t0 = time.time()
    (und.withColumn("r", F.row_number().over(
        Window.partitionBy("nsrc").orderBy("ndst")) - 1)
     .agg(F.max("r")).collect())
    t_old = time.time() - t0

    # NEW shape: (node, md5-bucket) windows + per-node offset window
    t0 = time.time()
    nbr0 = und.withColumn("_bk", F.substring(
        F.md5(F.col("ndst").cast("string")), 1, 2))
    cnt = nbr0.groupBy("nsrc", "_bk").agg(F.count(F.lit(1)).alias("_n"))
    woff = (Window.partitionBy("nsrc").orderBy("_bk")
            .rowsBetween(Window.unboundedPreceding, -1))
    off = cnt.select("nsrc", "_bk",
                     F.coalesce(F.sum("_n").over(woff), F.lit(0))
                     .alias("_off"))
    (nbr0.withColumn("_r0", F.row_number().over(
        Window.partitionBy("nsrc", "_bk").orderBy("ndst")) - 1)
     .join(off, ["nsrc", "_bk"])
     .agg(F.max(F.col("_r0") + F.col("_off"))).collect())
    t_new = time.time() - t0

    # end-to-end: the full operator on the star — walks from the hub
    # must reach md5-chosen leaves, walks from leaves must bounce
    # through the hub; every transition is a real edge.  (Skipped for
    # very large hubs: walks start from EVERY node, so the frontier —
    # not the rank under test — dominates the wall there.)
    t_walk, n_rows = None, None
    if d <= 8_000_000:
        t0 = time.time()
        walks = graph.random_walks(edges, n_walks=1, walk_len=2)
        probe = walks.filter(F.col("start_node") == "hub").collect()
        t_walk = round(time.time() - t0, 1)
        seq = {r.step: r.node for r in probe}
        assert seq[0] == "hub" and seq[1].startswith("leaf") \
            and seq[2] == "hub", seq
        n_rows = walks.count()

    print(json.dumps({
        "hub_degree": d,
        "rank_old_single_window_s": round(t_old, 1),
        "rank_new_bucketed_s": round(t_new, 1),
        "speedup": round(t_old / t_new, 2),
        "full_walk_probe_s": t_walk,
        "walk_rows": n_rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

"""Hub stress for SECOND-ORDER biased walks — the node2vec state
blow-up in frontier form.

No physical plan bounds a second-order step at a hub: a walk standing
on a D-degree node must weigh D wedges, so a star where every leaf's
walk reaches the hub at step 1 makes step 2 cost |walks|·D weighted
rows (4×10¹² at D=2M — unrunnable anywhere).  The mitigation under
test is ``second_order_max_degree``: hub visits fall back to the
uniform first-order pick (ONE rank equi-join row per walk), leaf-level
visits keep the exact second-order semantics.

This tool builds a D-leaf star plus a ring among the first 1,000
leaves (so both the common-neighbour and explore weight classes are
exercised off-hub), runs the capped walk end-to-end, validates every
transition follows a real edge, and times a small UNCAPPED control
(D=1,500: frontier×deg ≈ 2.3M weighted rows) to show the exact path
works but scales as Σ deg(visit) — the measured reason the cap exists.

Prints one JSON line; the committed row lives in BENCH.md.

Usage: python tools/stress_biased_walks.py [hub_degree]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def _star_with_ring(spark, d: int, ring: int = 1000):
    star = (spark.range(d)
            .select(F.lit("hub").alias("src"),
                    F.concat(F.lit("leaf"), F.col("id")).alias("dst")))
    ring_e = (spark.range(ring)
              .select(F.concat(F.lit("leaf"), F.col("id")).alias("src"),
                      F.concat(F.lit("leaf"),
                               (F.col("id") + 1) % ring).alias("dst")))
    return star.unionByName(ring_e)


def main() -> None:
    from legal_ner_spark.session import get_spark
    from legal_ner_spark.operators import graph

    d = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    edges = _star_with_ring(spark, d).cache()
    n_edges = edges.count()

    t0 = time.time()
    walks = graph.biased_walks(edges, n_walks=1, walk_len=2,
                               ret_w=1, com_w=2, far_w=1,
                               second_order_max_degree=4096)
    n_rows = walks.count()
    t_capped = time.time() - t0

    # every non-start transition must follow a real edge
    sym = (edges.select("src", "dst")
           .union(edges.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst"))).distinct())
    steps = walks.filter("step > 0").select(
        "start_node", "walk_id", "step", "node")
    prev = walks.select("start_node", "walk_id",
                        (F.col("step") + 1).alias("step"),
                        F.col("node").alias("pnode"))
    bad = (steps.join(prev, ["start_node", "walk_id", "step"])
           .join(sym, (F.col("pnode") == F.col("src"))
                 & (F.col("node") == F.col("dst")), "left_anti")
           .count())

    # uncapped control at a size where frontier×deg is feasible
    small = _star_with_ring(spark, 1_500).cache()
    small.count()
    t0 = time.time()
    n_small = graph.biased_walks(small, n_walks=1, walk_len=2,
                                 ret_w=1, com_w=2, far_w=1).count()
    t_uncapped_1500 = time.time() - t0

    print(json.dumps({
        "metric": "biased_walks_hub_stress",
        "hub_degree": d,
        "n_edges": n_edges,
        "walk_rows": n_rows,
        "bad_transitions": bad,
        "capped_sec": round(t_capped, 1),
        "uncapped_hub1500_sec": round(t_uncapped_1500, 1),
        "note": ("capped: hub visits take the first-order rank join "
                 "(O(1)/walk); uncapped at D=2M would weigh ~4e12 "
                 "wedge rows — the control shows the exact path at "
                 "D=1500 for scale"),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

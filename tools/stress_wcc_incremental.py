"""Scale stress for `graph.wcc_incremental`: maintenance must cost
O(delta + affected labels), not O(corpus).

Base graph: 10,000 disjoint 200-node chains (2M nodes, ~1.99M edges) —
the long-diameter shape that makes from-scratch CC earn its pointer
jumps.  Delta: 1,000 bridge edges between random chain heads (plus 50
edges introducing brand-new nodes).  The tool labels the base once,
then times (a) full from-scratch WCC over base ∪ delta vs (b) the
incremental maintainer, and verifies the two labellings are IDENTICAL
(exact join, zero mismatches) — min-node component ids included.

Prints one JSON line; the committed row lives in BENCH.md.

Usage: python tools/stress_wcc_incremental.py [n_chains] [chain_len]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from legal_ner_spark.session import get_spark
    from legal_ner_spark.operators import graph

    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    n = n_chains * chain_len
    base = (spark.range(n)
            .filter((F.col("id") % chain_len) != chain_len - 1)
            .select(F.col("id").alias("src"),
                    (F.col("id") + 1).alias("dst"))
            .cache())
    n_base = base.count()

    # 1,000 bridges between md5-chosen chain heads + 50 new-node edges
    bridges = (spark.range(1000)
               .select(((F.conv(F.substring(F.md5(F.concat(
                   F.lit("a"), F.col("id"))), 1, 8), 16, 10)
                   .cast("bigint") % n_chains) * chain_len).alias("src"),
                   ((F.conv(F.substring(F.md5(F.concat(
                       F.lit("b"), F.col("id"))), 1, 8), 16, 10)
                    .cast("bigint") % n_chains) * chain_len).alias("dst")))
    newbies = (spark.range(50)
               .select(F.col("id").alias("src"),
                       (F.col("id") + n).alias("dst")))
    delta = bridges.unionByName(newbies).cache()
    n_delta = delta.count()

    t0 = time.time()
    labels = graph.weakly_connected_components(base).cache()
    labels.count()
    t_base = time.time() - t0

    t0 = time.time()
    full = graph.weakly_connected_components(
        base.unionByName(delta)).cache()
    n_full = full.count()
    t_full = time.time() - t0

    t0 = time.time()
    inc = graph.wcc_incremental(labels, delta).cache()
    n_inc = inc.count()
    t_inc = time.time() - t0

    mismatches = (inc.join(full.withColumnRenamed("component", "want"),
                           "node")
                  .filter(F.col("component") != F.col("want")).count())

    print(json.dumps({
        "metric": "wcc_incremental_stress",
        "n_base_edges": n_base,
        "n_delta_edges": n_delta,
        "n_labels": n_inc,
        "full_recompute_sec": round(t_full, 1),
        "incremental_sec": round(t_inc, 1),
        "speedup": round(t_full / t_inc, 2),
        "label_mismatches": mismatches,
        "base_label_sec": round(t_base, 1),
        "note": ("incremental = 2 label equi-joins + CC over a "
                 "<=1050-edge component graph + 1 broadcast remap; "
                 "identical labelling required"),
    }))
    assert mismatches == 0 and n_full == n_inc
    spark.stop()


if __name__ == "__main__":
    main()

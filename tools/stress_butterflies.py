"""Scale stress for `graph.butterfly_counts` — the left-hub cap on the
only quadratic step (per-left right-pair enumeration, Σ C(deg_left, 2)).

Balanced load: 2,000,000 left nodes × 8 rights drawn from a 100k-right
universe — 56M wedge rows through the pair join, the shape a real
doc×statute corpus produces.  Hub hazard: ONE left node connected to
20,000 rights adds C(20k, 2) ≈ 2×10⁸ pair rows on its own (10⁴× its
fair share); `max_left_degree=256` drops it BEFORE the self-join.  The
tool times the balanced run, the hub run WITH the cap, and verifies
cap-correctness: on the balanced graph (no left node above the cap)
capped and uncapped butterflies are IDENTICAL.

Prints one JSON line; the committed row lives in BENCH.md.

Usage: python tools/stress_butterflies.py [n_left]
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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def right(salt):
        return F.concat(F.lit("s"), F.conv(F.substring(F.md5(F.concat(
            F.lit(salt), F.col("id").cast("string"))), 1, 8), 16, 10)
            .cast("bigint") % 100_000)

    bal = (spark.range(n)
           .select(F.concat(F.lit("d"), F.col("id")).alias("left"),
                   F.explode(F.array(*[right(str(k))
                                       for k in range(8)]))
                   .alias("right"))
           .cache())
    n_bal = bal.count()

    t0 = time.time()
    bf = graph.butterfly_counts(bal).cache()
    n_nodes = bf.count()
    tot = bf.agg(F.sum("butterflies")).collect()[0][0]
    t_bal = time.time() - t0

    # capped ≡ uncapped when nothing exceeds the cap
    t0 = time.time()
    bf_cap = graph.butterfly_counts(bal, max_left_degree=256)
    diff = (bf.withColumnRenamed("butterflies", "a")
            .join(bf_cap.withColumnRenamed("butterflies", "b"),
                  "node", "full")
            .filter(F.coalesce("a", F.lit(-1))
                    != F.coalesce("b", F.lit(-1))).count())
    t_cap_eq = time.time() - t0

    hub = bal.unionByName(
        spark.range(20_000).select(
            F.lit("dHUB").alias("left"),
            F.concat(F.lit("s"), F.col("id")).alias("right")))
    t0 = time.time()
    n_hub_nodes = graph.butterfly_counts(
        hub, max_left_degree=256).count()
    t_hub = time.time() - t0

    print(json.dumps({
        "metric": "butterfly_stress", "n_left": n,
        "n_edges": n_bal, "balanced_sec": round(t_bal, 1),
        "n_butterfly_nodes": n_nodes, "total_butterflies": int(tot),
        "cap_equivalence_mismatches": diff,
        "cap_check_sec": round(t_cap_eq, 1),
        "hub20k_capped_sec": round(t_hub, 1),
        "hub_nodes": n_hub_nodes,
        "note": ("uncapped hub would add C(20k,2)~2e8 pair rows; the "
                 "cap drops it pre-join, balanced results identical "
                 "capped or not"),
    }))
    assert diff == 0
    spark.stop()


if __name__ == "__main__":
    main()

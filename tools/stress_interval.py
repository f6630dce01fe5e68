"""Volume stress for the keyless range join: synthesize point events and
alert intervals over a shared time domain sized so the NAIVE plan
(nested-loop) would evaluate the full |intervals| x |points| cross
product, and time the binned equi-join end-to-end (join + per-interval
aggregate).  Reports produced pairs and pairs/s so the bin-width knob's
candidate-volume calculus (operators/relational.py:interval_join) can be
checked against measurement.

Usage: python tools/stress_interval.py [n_points] [n_intervals] [bin_seconds]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    from legal_ner_spark.session import get_spark
    from pyspark.sql import functions as F
    from legal_ner_spark.operators.relational import interval_join

    n_pts = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_ivs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    bin_s = int(sys.argv[3]) if len(sys.argv) > 3 else 3600
    spark = get_spark(master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    # 30-day domain in seconds; deterministic pseudo-random placement
    domain = 30 * 86400
    pts = spark.range(n_pts).select(
        F.col("id").alias("pt_id"),
        F.pmod(F.xxhash64("id"), F.lit(domain)).cast("double").alias("t"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 1000) / 10.0).alias("v"))
    ivs = spark.range(n_ivs).select(
        F.col("id").alias("iv_id"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(domain))
        .cast("double").alias("lo"))
    # interval length 1h: expected pairs = n_ivs * n_pts * 3600 / domain
    ivs = ivs.withColumn("hi", F.col("lo") + 3600)

    t0 = time.time()
    joined = interval_join(ivs, pts, "lo", "hi", "t", bin_seconds=bin_s)
    out = (joined.groupBy("iv_id")
           .agg(F.count("*").alias("n"), F.sum("v").alias("sv")))
    n_rows = out.count()
    n_pairs = joined.count()
    dt = time.time() - t0
    naive = n_pts * n_ivs
    print(f"interval_join[bin={bin_s}s]: {n_pts:,} points x {n_ivs:,} "
          f"intervals -> {n_pairs:,} pairs / {n_rows:,} non-empty intervals "
          f"in {dt:.1f}s ({n_pairs / dt:,.0f} pairs/s; naive cross product "
          f"would probe {naive:,.0f} combinations, {naive / n_pairs:,.0f}x "
          "the qualifying volume)")
    spark.stop()


if __name__ == "__main__":
    main()

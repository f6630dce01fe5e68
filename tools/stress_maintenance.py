"""Volume stress for the table-maintenance tier: synthesize a CDC change
log with the shapes that hurt it (hot keys carrying thousands of
versions, delete/re-insert churn, out-of-order sequence numbers within
partitions) and time `cdc_apply` (two-stage) and `scd2_versions`
end-to-end, verifying the composition law and interval integrity on the
way out.

Usage: python tools/stress_maintenance.py [n_changes] [n_keys]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    from pyspark.sql import functions as F
    from legal_ner_spark.session import get_spark
    from legal_ner_spark.plans import maintenance as mt

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark(master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    # 90% of changes hash across all keys; 10% pile onto 100 hot keys
    # (hot key ≈ n/1000 versions — the IPC/CrPC shape of a change log).
    # seq is the global order; partition layout is hash-scrambled so
    # arrival order ≠ seq order.
    log = (spark.range(n, numPartitions=64)
           .withColumn("k", F.when(F.pmod(F.xxhash64("id"), F.lit(10))
                                   < 9,
                                   F.pmod(F.xxhash64("id", F.lit(1)),
                                          F.lit(n_keys)))
                       .otherwise(F.pmod(F.xxhash64("id", F.lit(2)),
                                         F.lit(100))))
           .withColumn("op", F.element_at(
               F.array(F.lit("I"), F.lit("U"), F.lit("U"), F.lit("D")),
               (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(4)) + 1)
               .cast("int")))
           .withColumn("val", F.concat(F.lit("v"), F.col("id")))
           .withColumnRenamed("id", "seq")
           .repartition(64, "val")  # scramble: arrival != seq order
           .cache())
    log.count()

    empty = spark.createDataFrame([], "k bigint, val string")
    t0 = time.time()
    whole = mt.cdc_apply(empty, log, ["k"], ["val"], ["seq"])
    n_whole = whole.count()
    t_whole = time.time() - t0

    t0 = time.time()
    snap = mt.cdc_apply(empty, log.filter(F.col("seq") < n // 2),
                        ["k"], ["val"], ["seq"])
    two = mt.cdc_apply(snap, log.filter(F.col("seq") >= n // 2),
                       ["k"], ["val"], ["seq"])
    n_two = two.count()
    t_two = time.time() - t0
    # composition law at volume: anti-joins both ways must be empty
    diff = (whole.exceptAll(two).count() + two.exceptAll(whole).count())

    t0 = time.time()
    scd2 = mt.scd2_versions(log.withColumnRenamed("op", "attr_in"),
                            ["k"], "attr_in", "seq")
    n_vers = scd2.count()
    t_scd2 = time.time() - t0
    bad = (scd2.groupBy("k")
           .agg(F.max("version_n").alias("mx"),
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("valid_to").isNull().cast("int"))
                .alias("open"))
           .filter((F.col("mx") != F.col("cnt")) | (F.col("open") != 1))
           .count())

    print(f"changes={n:,} keys≈{n_keys:,}")
    print(f"cdc_apply whole-log: {t_whole:.1f}s "
          f"({n / t_whole:,.0f} changes/s), snapshot={n_whole:,}")
    print(f"cdc_apply two-stage: {t_two:.1f}s, snapshot={n_two:,}, "
          f"composition diff rows={diff}")
    print(f"scd2_versions: {t_scd2:.1f}s ({n / t_scd2:,.0f} changes/s), "
          f"versions={n_vers:,}, integrity violations={bad}")
    assert diff == 0 and bad == 0 and n_whole == n_two
    spark.stop()


if __name__ == "__main__":
    main()

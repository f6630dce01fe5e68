"""Lineage-truncation regression tests (plans/checkpoint.py).

The silent failure mode these guard: ``localCheckpoint`` preserves the
replaced plan's sizeInBytes statistic, and an iterative join loop
COMPOUNDS it (each round's estimate multiplies the previous round's
already-compounded leaves) — by round ~17 the driver multiplies
10^8-digit BigIntegers and each checkpoint takes minutes.  Truncator
rebuilds the checkpointed RDD as a fresh LogicalRDD, dropping the stat.
"""

from pyspark.sql import functions as F

from legal_ner_spark.plans.checkpoint import Truncator


def _stat_digits(df):
    return len(str(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes()))


def test_truncator_keeps_stats_bounded_across_rounds(spark):
    """15 rounds of a 3-reference join loop: with raw localCheckpoint the
    size estimate grows by a constant factor of DIGITS per round
    (~3× digits/round → 10^6+ digits by round 15); through Truncator it
    must stay at the 19-digit defaultSizeInBytes forever."""
    trunc = Truncator(None)
    labels = trunc(spark.range(50).select(F.col("id").alias("v"),
                                          F.col("id").alias("comp")), "init")
    for _ in range(15):
        a = labels.select(F.col("v").alias("av"), F.col("comp").alias("ac"))
        b = labels.select(F.col("v").alias("bv"), F.col("comp").alias("bc"))
        nxt = (labels.join(a, labels.comp == F.col("av"), "left")
               .join(b, labels.v == F.col("bv"), "left")
               .select("v", F.least(
                   F.col("comp"),
                   F.coalesce("ac", F.col("comp")),
                   F.coalesce("bc", F.col("comp"))).alias("comp")))
        labels = trunc(nxt, "round")
        assert _stat_digits(labels) <= 25, \
            "checkpoint stats compounding — _reset_stats regressed"
    assert labels.count() == 50


def test_truncator_durable_rounds_write_distinct_paths(spark, tmp_path):
    """The durable branch must never overwrite the path the incoming plan
    still reads from — every call gets a fresh numbered directory."""
    trunc = Truncator(str(tmp_path))
    df = spark.range(10).select(F.col("id"))
    a = trunc(df, "step")
    b = trunc(a.select((F.col("id") + 1).alias("id")), "step")
    assert sorted(r.id for r in b.collect()) == list(range(1, 11))
    import os
    dirs = sorted(os.listdir(tmp_path))
    assert dirs == ["0001_step", "0002_step"]

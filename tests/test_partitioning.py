"""Range-partition planner: cut count, balance, tie routing, bucket
range disjointness, and the zero-shuffle routing plan."""

from pyspark.sql import functions as F

from legal_ner_spark.plans import partitioning as rp


def _df(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], ["id", "v"])


def test_cut_count_and_balance_on_uniform_data(spark):
    """k-1 cuts from an equal-depth sample; on uniform data every bucket
    of the FULL table lands within 2× of the ideal width."""
    df = _df(spark, [(i * 37) % 10007 for i in range(10007)])
    cuts = rp.range_cuts(df, "v", "id", n_buckets=8, sample_rate=0.3)
    assert cuts.count() == 7
    sizes = [r.n for r in rp.assign_buckets(df, "v", cuts)
             .groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
             .collect()]
    assert len(sizes) == 8
    ideal = 10007 / 8
    assert max(sizes) < 2 * ideal and min(sizes) > ideal / 2


def test_tie_routes_low_and_ranges_disjoint(spark):
    """A value equal to a cut goes to the LOWER bucket (cut < v is
    strict), and bucket value-ranges never overlap: hi(b) ≤ lo(b+1)."""
    df = _df(spark, list(range(100)) * 3)
    cuts = rp.range_cuts(df, "v", "id", n_buckets=4, sample_rate=1.0)
    cut_vals = sorted(r.cut for r in cuts.collect())
    rows = (rp.assign_buckets(df, "v", cuts)
            .groupBy("bucket").agg(F.min("v").alias("lo"),
                                   F.max("v").alias("hi"))
            .orderBy("bucket").collect())
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo
    for c in cut_vals:  # the cut value itself sits in the lower bucket
        holder = [r.bucket for r in rows if r.lo <= c <= r.hi]
        assert holder and holder[0] == sum(1 for x in cut_vals if x < c)


def test_zorder_interleave_bits(spark):
    """zkey must be the exact Morton interleave: col 0 on even bit
    positions, col 1 on odd."""
    df = spark.createDataFrame([(0b1010, 0b0110)], ["bp", "bc"])
    z = rp.zorder_key(df, ["bp", "bc"], bits=4).collect()[0].zkey
    expected = sum((((0b1010 >> j) & 1) << (2 * j)) +
                   (((0b0110 >> j) & 1) << (2 * j + 1))
                   for j in range(4))
    assert z == expected


def test_zorder_prunes_second_dimension(spark):
    """THE z-order claim: split a 2-d uniform table into 32 files under
    (a) z-order layout and (b) 1-d sort on dim x; a selective predicate
    on dim Y must overlap far fewer z-order files' zone maps than
    x-sorted files (where y's min/max per file spans everything)."""
    rows = [(i, float(i % 64), float(i // 64)) for i in range(4096)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    bx = rp.assign_buckets(df, "x",
                           rp.range_cuts(df, "x", "id", 16, 1.0), "bx")
    bxy = rp.assign_buckets(bx, "y",
                            rp.range_cuts(df, "y", "id", 16, 1.0), "by")
    z = rp.zorder_key(bxy, ["bx", "by"], bits=4)
    zmaps = (z.groupBy(F.floor(F.col("zkey") / 8).alias("f"))
             .agg(F.min("y").alias("lo"), F.max("y").alias("hi"))
             .collect())
    lin = (df.withColumn(
        "f", F.floor(F.percent_rank().over(
            __import__("pyspark").sql.Window.orderBy("x")) * 31.999))
        .groupBy("f").agg(F.min("y").alias("lo"), F.max("y").alias("hi"))
        .collect())
    y_lo, y_hi = 10.0, 12.0  # selective band on the SECOND dimension
    z_hit = sum(1 for r in zmaps if r.lo <= y_hi and r.hi >= y_lo)
    lin_hit = sum(1 for r in lin if r.lo <= y_hi and r.hi >= y_lo)
    assert len(zmaps) == 32 and len(lin) == 32
    assert lin_hit == 32          # 1-d sort: every file spans all of y
    assert z_hit <= 16            # z-order: at most half, typically ~1/4


def test_assign_buckets_is_shuffle_free(spark):
    """Routing the full table must be a broadcast + projection — any
    hash Exchange here would defeat the point of planning the layout
    before the write."""
    df = _df(spark, range(50))
    cuts = rp.range_cuts(df, "v", "id", n_buckets=4, sample_rate=1.0)
    plan = rp.assign_buckets(df, "v", cuts) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastExchange" in plan

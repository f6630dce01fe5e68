"""Deterministic range-partition planning: sampled equal-depth cut
points + bucket assignment.

Spark's own RangePartitioner does exactly this under `orderBy`/
`repartitionByRange` — reservoir-sample the column, pick equal-depth
cuts, route rows by binary search — but its sample is nondeterministic,
so two runs of the same job can produce different file boundaries, which
breaks resume ledgers and makes written layouts impossible to reproduce
for audit.  This module makes the plan an explicit, reproducible
relation:

* the sample is an md5-hash filter (same family as ``sample_corpus`` —
  retry/resume-stable, no RNG state),
* cut i is the sample value at sorted rank ``ceil(i·n/k)`` — an
  integer-exact, engine-neutral definition (no float interpolation), so
  a DuckDB oracle reproduces the cuts bit-for-bit,
* bucket(v) = #cuts < v (ties go low), attached via ONE broadcast of the
  (k-1)-element cut array.

Scale shape: the only global sort is over the SAMPLE (rate-bounded —
documented single-partition window, the same pattern as
``pack_shards``' bucket-totals table); the full table is touched by a
scan + broadcast-map projection only, zero shuffles.  At 100 TB with
rate 1e-4 the sample of a 10^12-row table is ~10^8 rows — raise
``n_buckets`` granularity by sampling per-partition min/max instead if
that ever binds; the cut DEFINITION stays the same.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _sample_key(col: F.Column, salt: str) -> F.Column:
    """Deterministic per-row key in [0, 1e6): first 8 md5 hex digits of
    salt||value, mod 1e6 (DuckDB: ('0x' || substr(md5(s||v),1,8))::
    UBIGINT % 1000000)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit(salt),
                                          col.cast("string"))), 1, 8),
               16, 10).cast("bigint"),
        F.lit(1000000))


def range_cuts(df: DataFrame, value_col: str, key_col: str,
               n_buckets: int, sample_rate: float = 0.05,
               salt: str = "rp1") -> DataFrame:
    """(n_buckets-1)-row frame of ``cut`` values: equal-depth ranks of a
    deterministic hash sample.  ``key_col`` seeds the sample membership
    (a stable unique id — sampling on the VALUE column would bias cuts
    on heavy values); ``value_col`` is what gets ranked."""
    sample = (df
              .filter(_sample_key(F.col(key_col), salt)
                      < int(sample_rate * 1000000))
              .select(F.col(value_col).alias("v")))
    # Global window over the rate-bounded sample only — same documented
    # single-partition pattern as pack_shards' bucket-totals frame.
    w = Window.orderBy("v")
    ranked = (sample
              .withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count(F.lit(1)).over(
                  Window.partitionBy(F.lit(1)))))
    positions = F.transform(
        F.sequence(F.lit(1), F.lit(n_buckets - 1)),
        lambda i: F.ceil(i * F.col("n") / F.lit(n_buckets)))
    return (ranked.filter(F.array_contains(positions, F.col("rn")))
            .select(F.col("v").alias("cut")))


def zorder_key(df: DataFrame, bucket_cols: Sequence[str],
               bits: int = 4) -> DataFrame:
    """Attach ``zkey``: the Morton/Z-order interleave of the low ``bits``
    bits of each bucket column (produced by ``assign_buckets`` with
    ``n_buckets = 2**bits`` per dimension) — the multi-dimension
    clustering key behind Delta/Iceberg `OPTIMIZE ZORDER BY`.  Sorting or
    range-partitioning by ``zkey`` keeps every written file's zone map
    (min/max per column) tight in ALL dimensions at once, so a filter on
    ANY of the columns prunes files — a 1-d sort only prunes its own
    sort column (tests/test_partitioning.py measures both layouts).

    Pure Catalyst bit arithmetic (shift/AND/sum), zero shuffles, 2·d·b
    expression terms; d·bits must stay ≤ 63."""
    if len(bucket_cols) * bits > 63:
        raise ValueError("zkey exceeds 63 bits")
    d = len(bucket_cols)
    z = F.lit(0).cast("bigint")
    for j in range(bits):
        for i, c in enumerate(bucket_cols):
            bit = F.shiftright(F.col(c).cast("bigint"),
                               j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, j * d + i)
    return df.withColumn("zkey", z.cast("bigint"))


def assign_buckets(df: DataFrame, value_col: str, cuts: DataFrame,
                   bucket_col: str = "bucket") -> DataFrame:
    """Attach ``bucket`` = #cuts strictly below ``value_col`` (0-based;
    ties route low).  One broadcast of the cut array, zero shuffles of
    ``df`` — the row-routing half of a range repartition, usable as a
    write-layout key (`partitionBy("bucket")`) or as the explicit twin
    of `repartitionByRange`."""
    arr = cuts.agg(F.sort_array(F.collect_list("cut")).alias("__cuts"))
    val = F.col(value_col)
    return (df.crossJoin(F.broadcast(arr))
            .withColumn(
                bucket_col,
                F.aggregate("__cuts", F.lit(0),
                            lambda acc, c:
                            acc + F.when(c < val, 1).otherwise(0))
                .cast("bigint"))
            .drop("__cuts"))

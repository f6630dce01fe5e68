"""Explicit skew mitigation (north_rule: 'salted repartitioning to defuse
skew from high-frequency statutes (IPC, CrPC) and mega-judgments').

Two devices, complementing AQE's runtime skew-join splitting (on by
default in session.py):

* ``salted_two_phase_count`` — statute-keyed aggregates concentrate on a
  handful of keys (IPC/CrPC dominate by construction).  Phase 1 aggregates
  on (key, salt) so the hot key's rows spread over N reducers; phase 2
  combines the N partials.  Identical result to a plain groupBy, bounded
  per-reducer load.
* ``salted_repartition`` — spreads a hot key's rows across up to n_salts
  partitions before a map-side stage, for when one key would otherwise
  blow a single task (mega-judgment guard when partitioning by a coarser
  key than doc_id).  NOT for grouped computations that need a whole group
  in one partition — by construction it splits groups.

Salts are DETERMINISTIC content hashes of the row, never
``monotonically_increasing_id``/``rand``: a nondeterministic partition
expression can silently drop or duplicate rows when a lost shuffle map
output is recomputed (the recomputed rows hash to different reducers than
the first attempt, and reducers that already fetched are not re-run —
SPARK-23207 class).  Determinism trades perfect spreading of exact
duplicate rows for retry safety; distinct rows still spread uniformly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, n_salts: int) -> F.Column:
    """Deterministic per-row salt: hash of every column PLUS the input
    partition id — stable across task retries whenever the input
    partitioning is (file scans re-read the same split on retry), and the
    partition term spreads byte-identical hot rows that a pure content
    hash would send to one reducer.  Residual: identical rows WITHIN one
    input partition share a salt — harmless for aggregates with map-side
    partial combine (one partial row per task reaches the shuffle) and
    bounded by task size for pandas stages."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns])
                  + F.spark_partition_id().cast("long"),
                  F.lit(n_salts))


def salted_two_phase_count(df: DataFrame, key: str,
                           n_salts: int = 16) -> DataFrame:
    """``df.groupBy(key).count()`` with bounded per-reducer load under
    heavy key skew.  Result-identical; the first exchange is on
    (key, salt) so no reducer sees more than ~1/n_salts of a hot key
    (assuming the hot key's rows are not all byte-identical)."""
    partial = (df.withColumn("_salt", _row_salt(df, n_salts))
               .groupBy(key, "_salt")
               .agg(F.count("*").alias("_partial")))
    return (partial.groupBy(key)
            .agg(F.sum("_partial").cast("bigint").alias("n")))


def salted_repartition(df: DataFrame, key: str, n_partitions: int,
                       n_salts: int = 8) -> DataFrame:
    """Repartition by (hash(key), salt): every key's rows spread across up
    to n_salts partitions, bounding the hottest partition at ~1/n_salts of
    the hottest key.  Use before MAP-side stages only (the Arrow extract,
    per-row scoring); a grouped computation needing all of a key's rows
    together must not be salted.

    PRECONDITION: the input must be retry-deterministic per partition —
    i.e. a file/Iceberg scan (a retried task re-reads the same split), not
    the output of a shuffle or an AQE-coalesced stage.  The salt includes
    spark_partition_id() to spread byte-identical hot rows; downstream of
    a shuffle, a recomputed map task may see a different partition id and
    reintroduce the SPARK-23207-class drop/duplicate risk this operator
    exists to avoid.  Salt a scan, then transform — not the reverse.
    (salted_two_phase_count is immune: re-aggregation keyed by the real
    key makes any salt assignment correct.)"""
    return (df.withColumn("_salt", _row_salt(df, n_salts))
            .repartition(n_partitions, F.xxhash64(key), F.col("_salt"))
            .drop("_salt"))

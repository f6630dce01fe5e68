"""Explicit skew mitigation (north_rule: 'salted repartitioning to defuse
skew from high-frequency statutes (IPC, CrPC) and mega-judgments').

Two devices, complementing AQE's runtime skew-join splitting (on by
default in session.py):

* ``salted_two_phase_count`` — statute-keyed aggregates concentrate on a
  handful of keys (IPC/CrPC dominate by construction).  Phase 1 aggregates
  on (key, salt) so the hot key's rows spread over N reducers; phase 2
  combines the N partials.  Identical result to a plain groupBy, bounded
  per-reducer load.
* ``salted_repartition`` — spreads rows across partitions by
  xxhash64(key) ⊕ salt before a per-group pandas stage, for when one group
  would otherwise blow a single task (mega-judgment guard when grouping by
  a coarser key than doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_two_phase_count(df: DataFrame, key: str,
                           n_salts: int = 16) -> DataFrame:
    """``df.groupBy(key).count()`` with bounded per-reducer load under
    heavy key skew.  Result-identical; the first exchange is on
    (key, salt) so no reducer sees more than ~1/n_salts of a hot key."""
    partial = (df.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                                             F.lit(n_salts)))
               .groupBy(key, "_salt")
               .agg(F.count("*").alias("_partial")))
    return (partial.groupBy(key)
            .agg(F.sum("_partial").cast("bigint").alias("n")))


def salted_repartition(df: DataFrame, key: str, n_partitions: int,
                       n_salts: int = 8) -> DataFrame:
    """Repartition by (hash(key), salt) — co-locates most of a key's rows
    while splitting hot keys across up to n_salts partitions."""
    return (df.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                                          F.lit(n_salts)))
            .repartition(n_partitions, F.xxhash64(key), F.col("_salt"))
            .drop("_salt"))

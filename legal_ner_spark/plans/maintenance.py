"""Table maintenance: CDC change-log replay (upsert + tombstones) and
SCD-2 validity-interval dimension builds.

The reference pipeline rebuilds its graph tables from scratch each run
(SURVEY §2.4); at 10^12 documents the corpus arrives as a change stream
(new judgments, corrected OCR, withdrawn cases), so the engine needs the
two canonical maintenance primitives every lakehouse MERGE is built on:

* ``cdc_apply`` — fold a change log to its net effect per key (latest
  change wins, Debezium-snapshot semantics) and apply it over a base
  snapshot: latest op ``D`` deletes, anything else upserts, untouched
  base rows pass through.  Composition law (pinned by test): applying a
  log in two halves equals folding the whole log — which is what makes
  incremental daily applies equivalent to a full rebuild.
* ``scd2_versions`` — compress a change log into one row per (key, run
  of identical attribute) with ``[valid_from, valid_to)`` intervals,
  the dimension shape an as-of join consumes.

Scale shape: ``cdc_apply`` is one hash exchange per side on the key
(fold's window and the full-outer join share the changes-side
partitioning, so the folded frame is NOT re-shuffled); ``scd2_versions``
is a single exchange on the key reused by both window passes and the
run filter (plan-audited: exactly one Exchange).  No driver collects,
no non-equi joins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fold_changes(changes: DataFrame, key_cols: Sequence[str],
                 seq_cols: Sequence[str], op_col: str = "op") -> DataFrame:
    """Net effect of a change log per key: the row with the highest
    (seq_cols) wins — ties must be broken by the caller's seq columns
    (pass the log's total order, e.g. ``["ts", "event_id"]``)."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.desc(c) for c in seq_cols])
    return (changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def cdc_apply(base: DataFrame, changes: DataFrame,
              key_cols: Sequence[str], value_cols: Sequence[str],
              seq_cols: Sequence[str], op_col: str = "op") -> DataFrame:
    """Next snapshot = base ⊕ folded changes.

    A key whose latest change is ``D`` is absent from the output even if
    it exists in base (tombstone); any other latest change upserts the
    change-side values; base keys untouched by the log pass through.
    ``base`` carries (key_cols + value_cols) only — a snapshot has no
    memory of ops, which is exactly why two-stage application composes.
    """
    folded = fold_changes(
        changes.select(*key_cols, *value_cols, op_col, *seq_cols),
        key_cols, seq_cols, op_col)
    b = base.select(*key_cols,
                    *[F.col(c).alias(f"__b_{c}") for c in value_cols])
    c = folded.select(*key_cols, F.col(op_col).alias("__op"),
                      *[F.col(v).alias(f"__c_{v}") for v in value_cols])
    j = b.join(c, list(key_cols), "full_outer")
    return (j.filter(F.col("__op").isNull() | (F.col("__op") != F.lit("D")))
            .select(*key_cols,
                    *[F.when(F.col("__op").isNotNull(),
                             F.col(f"__c_{v}"))
                      .otherwise(F.col(f"__b_{v}")).alias(v)
                      for v in value_cols]))


def asof_dimension_join(facts: DataFrame, versions: DataFrame,
                        key_cols: Sequence[str], attr_col: str,
                        fact_ts_col: str,
                        valid_from_col: str = "valid_from",
                        version_order_col: str | None = None) -> DataFrame:
    """Point-in-time enrichment: attach to every fact row the dimension
    attribute valid AT the fact's timestamp (the feature-store /
    training-data join that prevents label leakage — never a LATER
    version).  Facts with no version at-or-before their timestamp get
    NULL.

    Implementation is the union + window trick, NOT a non-equi range
    join: version rows (tagged 0) and fact rows (tagged 1) interleave in
    one (key, ts, tag) sort; ``last_value(attr, ignorenulls)`` over the
    preceding frame carries each version forward to the facts after it.
    One hash exchange + sort — a BroadcastNestedLoop/range join here
    would be the 100 TB mistake.  Ties resolve dimension-first (tag 0
    sorts before tag 1), so a fact AT a version boundary sees the NEW
    version, matching the [valid_from, valid_to) convention of
    ``scd2_versions``.  If two versions of one key can share a
    valid_from, pass ``version_order_col`` (e.g. scd2's ``version_n``)
    to make the winner deterministic — the highest wins."""
    keys = list(key_cols)
    payload = [c for c in facts.columns if c not in keys]
    fact_types = dict(facts.dtypes)
    attr_type = dict(versions.dtypes)[attr_col]
    vord = (F.col(version_order_col) if version_order_col
            else F.lit(0)).cast("long").alias("__vord")
    f_side = facts.select(
        *keys, F.col(fact_ts_col).alias("__ts"),
        F.lit(None).cast(attr_type).alias("__attr"),
        F.lit(1).alias("__tag"), F.lit(0).cast("long").alias("__vord"),
        *payload)
    v_side = versions.select(
        *keys, F.col(valid_from_col).alias("__ts"),
        F.col(attr_col).alias("__attr"), F.lit(0).alias("__tag"), vord,
        *[F.lit(None).cast(fact_types[c]).alias(c) for c in payload])
    w = (Window.partitionBy(*keys).orderBy("__ts", "__tag", "__vord")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (f_side.unionByName(v_side)
            .withColumn(attr_col,
                        F.last("__attr", ignorenulls=True).over(w))
            .filter(F.col("__tag") == 1)
            .select(*keys, *payload, attr_col))


def scd2_versions(changes: DataFrame, key_cols: Sequence[str],
                  attr_col: str, ts_col: str,
                  tie_cols: Sequence[str] = ()) -> DataFrame:
    """SCD-2 build: change-point compress the log into runs of identical
    ``attr_col`` per key, emitting ``version_n`` (1-based),
    ``valid_from`` (first ts of the run) and ``valid_to`` (next run's
    valid_from; NULL marks the current version).  ``tie_cols`` break
    equal-timestamp ordering — REQUIRED for determinism when the log can
    carry two changes at the same instant.

    Null-safe on the attribute: a run of NULLs is one version (via
    ``eqNullSafe``), and the first row of every key always opens one.
    """
    order = [F.col(ts_col), *[F.col(c) for c in tie_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    runs = (changes
            .withColumn("__prev", F.lag(attr_col).over(w))
            .withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) |
                    ~F.col("__prev").eqNullSafe(F.col(attr_col))))
    # runs is already hash-partitioned AND sorted by (key, order) from
    # the first window, so this second window adds no Exchange and no
    # Sort — one shuffle end to end (tests/test_maintenance.py audits).
    wv = Window.partitionBy(*key_cols).orderBy(*order)
    return (runs
            .withColumn("version_n", F.row_number().over(wv))
            .withColumn("valid_to", F.lead(ts_col).over(wv))
            .select(*key_cols, "version_n",
                    F.col(attr_col).alias("attr"),
                    F.col(ts_col).alias("valid_from"), "valid_to"))

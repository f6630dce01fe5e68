"""Declarative data-quality validation (expectations over a table).

Before a 10^12-doc corpus enters extraction, a pipeline asserts its
contract: keys non-null and unique, text non-empty, enums in range,
timestamps present.  The operator takes named violation predicates and
answers them in ONE aggregation pass over the table — every check is a
conditional count folded into the same map-side partial aggregate, so
adding a 20th check costs a column, not a scan.  The wide one-row result
unpivots via ``stack`` into the (check_name, n_violations, rate) shape
dashboards and circuit-breakers consume.

Uniqueness is the one contract a row-local predicate can't express; it
gets its own key-shuffle aggregate (excess-copy count), unioned in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_constraints(df: DataFrame,
                      checks: dict[str, Column]) -> DataFrame:
    """Violation counts + rates for named predicates (True = violation).
    Single scan, single one-row aggregate, no shuffle of data rows."""
    aggs = [F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(name)
            for name, pred in checks.items()]
    wide = df.agg(F.count("*").alias("_n"), *aggs)
    pairs = ", ".join(f"'{name}', {name}" for name in checks)
    return (wide.select(
        "_n",
        F.expr(f"stack({len(checks)}, {pairs}) "
               "AS (check_name, n_violations)"))
        .select("check_name", "n_violations",
                F.when(F.col("_n") > 0,
                       F.round(F.col("n_violations") / F.col("_n"), 4))
                .otherwise(F.lit(0.0)).alias("violation_rate")))


def check_unique(df: DataFrame, cols: list[str],
                 name: str | None = None) -> DataFrame:
    """Excess-copy count for a candidate key: sum over duplicated key
    groups of (copies - 1), as one (check_name, n_violations, rate) row.
    The groupBy shuffles only the key columns; the excess sum rides the
    partial-aggregated counts."""
    name = name or "unique_" + "_".join(cols)
    per_key = df.groupBy(*[F.col(c) for c in cols]).count()
    return (per_key.agg(
        F.coalesce(F.sum(F.col("count") - 1), F.lit(0))
        .cast("bigint").alias("n_violations"),
        F.coalesce(F.sum("count"), F.lit(0)).alias("_n"))
        .select(F.lit(name).alias("check_name"), "n_violations",
                F.when(F.col("_n") > 0,
                       F.round(F.col("n_violations") / F.col("_n"), 4))
                .otherwise(F.lit(0.0)).alias("violation_rate")))

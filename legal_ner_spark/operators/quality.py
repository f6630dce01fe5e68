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


_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}


def profile_table(df: DataFrame) -> DataFrame:
    """ANALYZE-style one-pass column profile: per column, row count,
    null count, exact distinct count, min/max (string and integral
    columns — rendered as strings; other types NULL, since float
    formatting is not engine-portable), and average string length.

    All columns fold into ONE aggregation; the multiple DISTINCT
    aggregates expand map-side (Spark's Expand operator — one shuffle
    carrying (column-id, value) pairs).  At 10^12 rows swap the exact
    distincts for `approx_count_distinct` or the mergeable KMV sketch
    (`operators/sketch.py`) — the output contract stays identical.
    These are the stats a cost-based optimizer, a skew planner, or a
    data-contract monitor reads first."""
    exprs: list[Column] = []
    for field in df.schema.fields:
        c, t = field.name, field.dataType.simpleString()
        exprs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).cast("bigint")
            .alias(f"{c}__nulls"),
            F.countDistinct(c).cast("bigint").alias(f"{c}__nd"),
        ]
        if t == "string":
            exprs += [F.min(c).alias(f"{c}__min"),
                      F.max(c).alias(f"{c}__max"),
                      F.round(F.avg(F.length(c)), 4).alias(f"{c}__len")]
        elif t in _INT_TYPES:
            exprs += [F.min(c).cast("string").alias(f"{c}__min"),
                      F.max(c).cast("string").alias(f"{c}__max"),
                      F.lit(None).cast("double").alias(f"{c}__len")]
        else:
            exprs += [F.lit(None).cast("string").alias(f"{c}__min"),
                      F.lit(None).cast("string").alias(f"{c}__max"),
                      F.lit(None).cast("double").alias(f"{c}__len")]
    wide = df.agg(*exprs)
    stack = ", ".join(
        f"'{c}', `{c}__rows`, `{c}__nulls`, `{c}__nd`, "
        f"`{c}__min`, `{c}__max`, `{c}__len`" for c in df.columns)
    return wide.selectExpr(
        f"stack({len(df.columns)}, {stack}) as "
        "(col_name, n_rows, n_nulls, n_distinct, min_s, max_s, avg_len)")

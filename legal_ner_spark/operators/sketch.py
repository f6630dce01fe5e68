"""Mergeable cardinality sketches (K-Minimum-Values).

`approx_count_distinct` exists, but its HLL++ registers are opaque and
engine-specific — useless when the pipeline needs to PERSIST per-partition
sketches and merge them later (incremental corpus stats, per-day distinct
users/tokens rolled into monthly, cross-dataset overlap estimates).  KMV
(Bar-Yossef et al. 2002; Beyer et al., "On Synopses for Distinct-Value
Estimation Under Multiset Operations", SIGMOD'07) is the classic
mergeable alternative: keep the k smallest values of a uniform hash; the
kth smallest normalized hash U_(k) yields the unbiased estimator
(k-1)/U_(k); the union sketch is just min-k of the concatenation.

Everything here is deterministic and engine-neutral (md5-derived 60-bit
hashes, no xxhash/HLL internals), so a DuckDB oracle reproduces sketches
BIT-EXACTLY — the correctness gate covers the sketch contents, not only
the estimate.

Scale shape: phase 1 aggregates on (group, salt) — a hot group's distinct
values spread over ``n_salts`` reducers, and each partial is capped at k
hashes BEFORE the phase-2 shuffle, so the merge moves n_salts·k longs per
group no matter how many rows or distinct values the group has.  The salt
is the value's own hash mod n_salts: duplicate values land in the same
partial and dedup inside ``collect_set`` (map-side partial aggregation),
never inflating the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 15 md5 hex nibbles = 60 uniform bits; hash domain size for the estimator
_KMV_DOMAIN = float(1 << 60)


def _kmv_hash(col: F.Column) -> F.Column:
    """Deterministic 60-bit uniform hash: md5 hex prefix as an integer.
    Engine-neutral (DuckDB: ('0x' || substr(md5(v), 1, 15))::UBIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15),
                  16, 10).cast("bigint")


def kmv_partial(df: DataFrame, group_col: str, value_col: str,
                k: int = 64, n_salts: int = 8) -> DataFrame:
    """Phase 1: per-(group, salt) min-k hash arrays — the persistable /
    shippable partial sketches.  Output: (group, _salt, partial)."""
    h = _kmv_hash(F.col(value_col))
    return (df.select(F.col(group_col).alias("grp"),
                      F.pmod(h, F.lit(n_salts)).alias("_salt"),
                      h.alias("h"))
            .groupBy("grp", "_salt")
            .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k)
                 .alias("partial")))


def kmv_merge(partials: DataFrame, k: int = 64) -> DataFrame:
    """Phase 2: union partial sketches into the final per-group sketch +
    estimate.  Correct because every one of the k globally smallest
    hashes is among the k smallest of its own salt's partial, so the
    concatenation always contains the exact global min-k.

    Output: (grp, sketch_size, est_distinct, sketch_digest) — the digest
    is md5 over the comma-joined sketch so downstream equality checks
    (and the SQL oracle) compare full sketch CONTENTS without hauling
    arrays around."""
    sketch = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("partial")))),
        1, k)
    est = F.when(F.size("sketch") < k,
                 F.size("sketch").cast("double")) \
           .otherwise(F.lit(float(k - 1)) * F.lit(_KMV_DOMAIN)
                      / F.element_at("sketch", k))
    return (partials.groupBy("grp").agg(sketch.alias("sketch"))
            .select("grp",
                    F.size("sketch").cast("bigint").alias("sketch_size"),
                    F.round(est, 4).alias("est_distinct"),
                    F.md5(F.array_join(
                        F.transform("sketch", lambda h: h.cast("string")),
                        ",")).alias("sketch_digest")))


def kmv_sketch(df: DataFrame, group_col: str, value_col: str,
               k: int = 64, n_salts: int = 8) -> DataFrame:
    """Distinct-count sketch per group: two-phase (salted partials, then
    bounded merge).  (k-1)/U_(k) has relative error ~ 1/sqrt(k-2)
    (~12.7% at k=64, ~3.2% at k=1000); groups with < k distinct values
    return the EXACT count (the sketch holds every hash)."""
    return kmv_merge(kmv_partial(df, group_col, value_col,
                                 k=k, n_salts=n_salts), k=k)


def cms_build(df: DataFrame, value_col: str, weight_col: str | None = None,
              depth: int = 4, width: int = 256) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a relation:
    one row per (row_idx, col_idx) cell with the summed weight of items
    hashing there.  depth independent hash rows come from salting the
    same md5 (engine-neutral, like the KMV hash); merging two sketches
    is a union + groupBy-sum (tested), so per-partition / per-day
    sketches roll up without the raw stream.  The whole build is ONE
    aggregation of (depth × |input|) narrow rows — at most depth·width
    cells survive, bounded state no matter the input size."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    w = F.lit(1).cast("bigint") if weight_col is None \
        else F.col(weight_col).cast("bigint")
    keyed = (df.select(F.col(value_col).cast("string").alias("item"),
                       w.alias("w"))
             .select("item", "w", rows)
             .withColumn("c", _cms_col(F.col("item"), F.col("r"), width)))
    return (keyed.groupBy("r", "c")
            .agg(F.sum("w").cast("bigint").alias("cnt")))


def _cms_col(item: F.Column, row: F.Column, width: int) -> F.Column:
    """Column index of ``item`` in hash row ``row``: first 8 md5 hex
    digits of 'r|item' mod width (DuckDB:
    ('0x' || substr(md5(r || '|' || item), 1, 8))::UBIGINT % width)."""
    return F.pmod(
        F.conv(F.substring(
            F.md5(F.concat_ws("|", row.cast("string"), item)), 1, 8),
            16, 10).cast("bigint"),
        F.lit(width))


def cms_join_size(spark, sketch_a: DataFrame, sketch_b: DataFrame,
                  depth: int = 4) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches built
    on the join key with the same (depth, width): per hash row, the dot
    product Σ_c cntA·cntB over-counts |A ⋈ B| only by collisions, so
    min over the depth rows is the tightest upper bound (Cormode &
    Muthukrishnan's inner-product estimator).  This is the planner
    primitive — choose broadcast vs shuffle vs salt BEFORE running the
    join, from two bounded sketches instead of a scan.  Rows with no
    overlapping cells contribute 0 (handled via the left join from the
    full row range), making disjoint inputs estimate exactly 0."""
    prod = (sketch_a.alias("a")
            .join(sketch_b.alias("b"), ["r", "c"])
            .groupBy("r")
            .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("dot")))
    rows = spark.range(depth).withColumnRenamed("id", "r")
    return (rows.join(prod, "r", "left")
            .agg(F.min(F.coalesce("dot", F.lit(0))).cast("bigint")
                 .alias("est_join_size")))


def cms_query(sketch: DataFrame, probes: DataFrame, value_col: str,
              depth: int = 4, width: int = 256) -> DataFrame:
    """Point-estimate counts for probe items: min over the depth rows of
    the probed cells (the count-min bound: est >= true, over-count
    ≤ 2·N/width with prob 1 - 2^-depth).  The sketch side is at most
    depth×width rows — broadcast — so probing is map-side."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    keyed = (probes.select(F.col(value_col).cast("string").alias("item"))
             .distinct()
             .select("item", rows)
             .withColumn("c", _cms_col(F.col("item"), F.col("r"), width)))
    return (keyed.join(F.broadcast(sketch), ["r", "c"], "left")
            .groupBy("item")
            .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint")
                 .alias("est")))

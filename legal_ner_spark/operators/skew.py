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
from pyspark.sql.window import Window


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


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join under heavy key skew when the small side is too large to
    broadcast: the big side gets a deterministic per-row salt, the small
    side is REPLICATED n_salts times (one copy per salt value), and the
    join key becomes (key, salt) — the hot key's probe rows spread over
    n_salts reducers instead of landing on one.  Result-identical to
    ``big.join(small, key, how)`` for 'inner' and 'left' (each big row
    meets exactly one replica of each matching small row).

    Cost model: shuffles n_salts × |small| instead of melting one reducer
    — the right trade when |small| is modest but above the broadcast
    threshold and the big side has IPC/CrPC-grade hot keys.  Prefer
    ``F.broadcast(small)`` when small fits the driver/executors; prefer
    AQE skew-join when the skew is runtime-discovered rather than known.
    PRECONDITION (same as ``salted_repartition``): the BIG side must be
    retry-deterministic per partition — a file/Iceberg scan, not the
    output of a shuffle or an AQE-coalesced stage.  The salt includes
    spark_partition_id() so byte-identical hot rows still spread;
    downstream of a shuffle a recomputed map task may observe a
    different partition id, assign different salts, and reintroduce the
    SPARK-23207-class drop/duplicate risk.  Fed a scan, salting is
    deterministic (see module docstring) so a recomputed map task
    re-sends identical rows — no loss.  Salt a scan, then join — not
    the reverse."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salts = big.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt"))
    b = big.withColumn("_salt",
                       F.pmod(F.xxhash64(*[F.col(c) for c in big.columns])
                              + F.spark_partition_id().cast("long"),
                              F.lit(n_salts)).cast("int"))
    s = small.crossJoin(F.broadcast(salts))
    return b.join(s, [key, "_salt"], how).drop("_salt")


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


def digest_semi_prune(big: DataFrame, keys: DataFrame, big_key: str,
                      key_col: str) -> DataFrame:
    """Pre-shuffle semi-join pruning: broadcast the DISTINCT 64-bit
    digests (xxhash64) of the key set and semi-join the big side on the
    digest — non-matching rows die at the scan, before they pay the
    shuffle.  8 bytes/key: ~80 MB broadcast at 10^7 keys, the practical
    ceiling; contract is SUPERSET-of-semi-join (a digest collision is a
    false positive at 2^-64, false negatives impossible), so compose
    with the exact join downstream — it shuffles only the pruned rows.

    Above ~10^7-10^8 keys, don't broadcast digests: Spark's own runtime
    Bloom-filter injection (spark.sql.optimizer.runtime.bloomFilter.*,
    ON by default — demonstrated in tests/test_plan_audit.py) builds a
    bits-per-key filter on the selective side automatically, and
    salted_join handles the case where the key set must shuffle."""
    dig = keys.select(F.xxhash64(F.col(key_col)).alias("_kh")).distinct()
    return big.join(F.broadcast(dig),
                    F.xxhash64(F.col(big_key)) == F.col("_kh"), "left_semi")


def bounded_topk_per_key(df: DataFrame, key_col: str, id_col: str,
                         k: int, salt: str = "ss1",
                         cell_chars: int = 2) -> DataFrame:
    """Exact per-key smallest-k under the md5(salt||id) uniform —
    output-identical to ``textprep.stratified_sample`` (same rank key,
    same id tie-break) but with per-task work bounded under key skew:
    the mega-stratum guard that function's docstring defers to skew.*.

    A plain ``row_number() over (partition by key)`` puts a hot key's
    ENTIRE population into one window partition — one straggler task
    sorting 10^9 rows when 90% of a crawl is one language.  Here the
    rank key's first ``cell_chars`` hex digits radix-partition each key
    into ``16^cell_chars`` cells whose order AGREES with the rank order
    (fixed-width lowercase hex compares lexicographically as its
    numeric value), so a tiny per-(key, cell) count table + a per-key
    prefix sum over ≤16^cell_chars rows decides almost every row
    without ranking it:

      cum ≤ k            → the whole cell is in the top-k: keep, unsorted
      cum − count ≥ k    → the whole cell is past the top-k: drop at scan
      boundary cell      → row_number within (key, cell) only — expected
                           hot-key-count/16^cell_chars rows per task

    Exactly one boundary cell exists per key with more than k rows, so
    the residual window is 16^cell_chars× smaller than the naive one;
    raise ``cell_chars`` (4 → 65,536 cells) if a key is hot enough that
    even that slice is a straggler.  Every shuffle is on (key, cell) —
    the hot key spreads across cells by construction.  The md5 rank is
    deterministic, so retries replay identically (SPARK-23207-safe) and
    a DuckDB oracle can replay the draw."""
    u = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    g = (df.withColumn("_u", u)
         .withColumn("_cell", F.conv(F.substring("_u", 1, cell_chars),
                                     16, 10).cast("int")))
    cnt = g.groupBy(key_col, "_cell").agg(F.count(F.lit(1)).alias("_cn"))
    wc = (Window.partitionBy(key_col).orderBy("_cell")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (cnt.withColumn("_cum", F.sum("_cn").over(wc))
           .withColumn("_prev", F.col("_cum") - F.col("_cn"))
           .drop("_cn"))
    j = g.join(cum, [key_col, "_cell"])
    whole = j.filter(F.col("_cum") <= k)
    wb = Window.partitionBy(key_col, "_cell").orderBy("_u", F.col(id_col))
    edge = (j.filter((F.col("_prev") < k) & (F.col("_cum") > k))
            .withColumn("_rn", F.row_number().over(wb))
            .filter(F.col("_prev") + F.col("_rn") <= k)
            .drop("_rn"))
    return whole.unionByName(edge).drop("_u", "_cell", "_cum", "_prev")

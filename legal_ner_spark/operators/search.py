"""Relevance-ranked keyword search over the corpus (BM25).

A training-data pipeline needs keyword retrieval constantly — pulling
topical subsets for mixture construction, auditing what a dedup or
quality filter removed, spot-checking contamination hits.  BM25
(Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework")
is the standard lexical ranking function; here it is expressed as pure
DataFrame algebra so Catalyst keeps the whole thing JVM-side:

- the corpus-side explode is filtered to the QUERY terms inside the same
  whole-stage-codegen span as the scan (a handful of terms vs a 10^12-doc
  corpus: the exploded-and-kept volume is the posting-list volume of the
  query, not the corpus token count);
- document frequencies and the (n_docs, avgdl) scalar are tiny by
  construction -> broadcast joins;
- the final top-k is an `orderBy().limit(k)` = TakeOrderedAndProject
  (per-partition partial top-k, no global sort).

Scores are rounded to 4 decimals BEFORE ranking so the ordering (and the
tie-break on doc_id) is reproducible across engines and summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Top-``k`` docs by BM25 score for a bag-of-words query ``terms``.

    Output: (doc_id, bm25) — score = Σ_t idf(t) · tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl)), idf(t) = ln((N − df + ½)/(df + ½) + 1)
    (the Lucene non-negative variant).  Docs matching no term are absent.
    """
    toks = F.split(F.lower(text_col), " ")
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    stats = base.agg(F.count("*").alias("n_docs"),
                     F.avg(F.size("toks")).alias("avgdl"))
    tf = (base.select("doc_id", F.size("toks").alias("dl"),
                      F.explode("toks").alias("term"))
          .filter(F.col("term").isin(list(terms)))
          .groupBy("doc_id", "dl", "term")
          .agg(F.count("*").alias("tf")))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    contrib = (F.log((F.col("n_docs") - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0)
               * F.col("tf") * (k1 + 1.0)
               / (F.col("tf")
                  + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))))
    return (tf.join(F.broadcast(df_t), "term")
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(F.round(F.sum(contrib), 4).alias("bm25"))
            .orderBy(F.col("bm25").desc(), "doc_id")
            .limit(k))


_IDX_MANIFEST = "_current.json"


def _read_text_manifest(path: str) -> dict:
    """Resolve the index layout.  A segmented index (one that has seen
    ``append_text_index`` or ``compact_text_index``) carries a
    ``_current.json`` manifest listing its segment roots; a build-once
    index is the legacy single segment rooted at ``path`` itself."""
    import json
    import os
    man = os.path.join(path, _IDX_MANIFEST)
    if os.path.exists(man):
        with open(man) as fh:
            return json.load(fh)
    return {"snapshot": None, "segments": [path], "n_buckets": None}


def _write_text_manifest(path: str, manifest: dict) -> None:
    import json
    import os
    tmp = os.path.join(path, f".{_IDX_MANIFEST}.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, os.path.join(path, _IDX_MANIFEST))  # commit point


def _write_text_segment(docs: DataFrame, seg: str, n_buckets: int,
                        id_col: str, text_col: str) -> None:
    """One self-contained index segment: bucketed posting lists + its
    own (n_docs, avgdl) stats + a 0-row unpartitioned schema pin (an
    empty corpus, or a bucket layout with no matching partitions,
    leaves the partitioned dir without inferable schema, and the reader
    must not depend on data being present).  All three writes are
    overwrite-mode, so rewriting a segment under the same name (a
    replayed batch) REPLACES it instead of double-appending."""
    toks = F.split(F.lower(text_col), " ")
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    (base.agg(F.count("*").alias("n_docs"),
              F.avg(F.size("toks")).alias("avgdl"))
     .write.mode("overwrite").parquet(f"{seg}/stats"))
    postings = (base.select("doc_id", F.size("toks").alias("dl"),
                            F.explode("toks").alias("term"))
                .groupBy("doc_id", "dl", "term")
                .agg(F.count("*").alias("tf"))
                .withColumn("bucket",
                            F.pmod(F.xxhash64("term"), F.lit(n_buckets))))
    (postings.write.mode("overwrite").partitionBy("bucket")
     .parquet(f"{seg}/postings"))
    (postings.limit(0).write.mode("overwrite")
     .parquet(f"{seg}/postings_schema"))


def build_text_index(docs: DataFrame, path: str, n_buckets: int = 64,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> None:
    """Materialize an inverted index for BM25 serving: posting lists
    (term, doc_id, tf, dl) written as parquet partitioned by a
    term-hash bucket (Iceberg: identity-partition on the bucket), corpus
    stats (n_docs, avgdl) alongside.  The 100 TB pattern mirrors the IVF
    index: the corpus-side tokenize/aggregate pass runs once; every
    subsequent query reads only its terms' buckets via partition pruning
    + a pushed term filter — posting-list I/O instead of a corpus scan.
    Rolling ingest does NOT force rebuilds: ``append_text_index`` adds
    per-batch segments and ``compact_text_index`` merges them back to
    one under an atomic manifest flip (BM25 is order-independent, so a
    segmented index answers every query exactly — document frequencies
    and corpus stats are aggregated across segments at query time).

    Bucketing by ``xxhash64(term) % n_buckets`` keeps any single
    partition ~1/n_buckets of the posting volume regardless of term skew
    ACROSS terms; a single degenerate term ("the") still concentrates in
    one bucket, which is why serving filters on term before scoring —
    the scan cost is bounded by the bucket, the compute by the term."""
    import os
    import shutil
    # a (re)build starts a FRESH index: drop any manifest/segments a
    # previous segmented index left at this path, or the stale manifest
    # would shadow the new flat tables (same guard as dedup_index_build)
    if os.path.isdir(path):
        for d in os.listdir(path):
            full = os.path.join(path, d)
            if d == _IDX_MANIFEST or d.startswith(f".{_IDX_MANIFEST}"):
                os.remove(full)
            elif ((d.startswith("seg-") or d.startswith("snap="))
                  and os.path.isdir(full)):
                shutil.rmtree(full)
    _write_text_segment(docs, path, n_buckets, id_col, text_col)
    # record the bucketing modulus: the max(bucket)+1 probe is NOT a
    # reliable recovery (a small corpus can leave the top bucket empty —
    # measured at sf0.01: max=62 under n_buckets=64, which would make
    # every subsequent query compute wrong bucket literals and prune
    # away its own terms)
    _write_text_manifest(path, {"snapshot": None, "segments": [path],
                                "n_buckets": n_buckets})


def append_text_index(new_docs: DataFrame, path: str,
                      id_col: str = "doc_id", text_col: str = "text",
                      batch_tag: str | None = None,
                      n_buckets: int | None = None) -> dict:
    """Add a batch to an existing text index WITHOUT rebuilding: the
    batch becomes one new self-contained segment (its own postings /
    stats / schema pin, written overwrite-mode so a replayed
    ``batch_tag`` replaces itself), then one atomic manifest rename
    publishes the grown segment list.  Queries over the segmented index
    are EXACT — BM25's sufficient statistics (tf, dl per doc; df and
    (n_docs, avgdl) per corpus) are all unions/sums over segments, so
    append-then-query ≡ rebuilt-index-query (pinned in pytest).  Batches
    must be disjoint doc sets (same contract as ``dedup_index_append``);
    the bucketing modulus is inherited from the manifest so every
    segment prunes identically (first append over a legacy build-once
    index: pass ``n_buckets`` if the build used a non-default modulus —
    the fallback probe of max(bucket)+1 can under-read an unlucky
    layout).  Returns the published manifest."""
    import os
    import re
    man = _read_text_manifest(path)
    if man.get("n_buckets") is not None:
        n_buckets = man["n_buckets"]
    elif n_buckets is None:  # legacy flat index: probe the modulus
        spark = new_docs.sparkSession
        mx = (spark.read.parquet(f"{path}/postings")
              .agg(F.max("bucket")).collect()[0][0])
        # explicit None check: `or` would turn a genuine max of 0 (a
        # single-bucket index) into the 64-bucket default and mis-hash
        # every later query's bucket literals
        n_buckets = int(mx) + 1 if mx is not None else 64
    if batch_tag is None:
        nums = [int(m.group(1)) for d in os.listdir(path)
                if (m := re.fullmatch(r"seg-a(\d+)", d))]
        batch_tag = f"a{(max(nums) + 1 if nums else 0):06d}"
    seg = os.path.join(path, f"seg-{batch_tag}")
    _write_text_segment(new_docs, seg, n_buckets, id_col, text_col)
    segments = [s for s in man["segments"] if s != seg] + [seg]
    manifest = {"snapshot": man.get("snapshot"), "segments": segments,
                "n_buckets": n_buckets}
    if "history" in man:  # the snapshot log survives appends
        manifest["history"] = man["history"]
    _write_text_manifest(path, manifest)
    return manifest


def compact_text_index(spark, path: str, snapshot_id: str | None = None,
                       vacuum: bool = True,
                       num_files: int | None = None,
                       keep_snapshots: int = 1) -> dict:
    """Merge all segments back into ONE under ``<path>/snap=<id>`` and
    flip the manifest atomically — the maintenance move a rolling
    ingest needs (every append adds a segment whose listing cost
    accumulates; the merge also re-packs small files, exactly like
    ``dedup_index_compact``).  Combined stats are the weighted fold of
    the per-segment stats (n = Σnᵢ, avgdl = Σnᵢ·avgdlᵢ / n) — the same
    fold the query path applies, so answers are unchanged.  ``vacuum``
    removes the now-unreferenced segment dirs immediately after the
    flip; as with the dedup index, that invalidates DataFrame handles
    resolved BEFORE the compact — pass ``vacuum=False`` when long-lived
    reader plans may be in flight."""
    import os
    import re
    import shutil
    man = _read_text_manifest(path)
    if snapshot_id is None:
        nums = [int(m.group(1)) for d in os.listdir(path)
                if (m := re.fullmatch(r"snap=c(\d+)", d))]
        snapshot_id = f"c{(max(nums) + 1 if nums else 0):06d}"
    snap = os.path.join(path, f"snap={snapshot_id}")
    if any(os.path.normpath(snap) == os.path.normpath(s)
           for s in man["segments"]):
        raise ValueError(
            f"snapshot_id {snapshot_id!r} is a currently published "
            "segment — compaction must mint a fresh id, or the rewrite "
            "would overwrite its own input mid-scan")
    tf, stats = _read_text_segments(spark, man["segments"])
    postings = tf if num_files is None else tf.coalesce(num_files)
    (postings.write.mode("overwrite").partitionBy("bucket")
     .parquet(f"{snap}/postings"))
    stats.write.mode("overwrite").parquet(f"{snap}/stats")
    (postings.limit(0).write.mode("overwrite")
     .parquet(f"{snap}/postings_schema"))
    n_buckets = man.get("n_buckets")
    if n_buckets is None:  # compacting a legacy build-once index
        mx = (spark.read.parquet(f"{path}/postings")
              .agg(F.max("bucket")).collect()[0][0])
        n_buckets = int(mx) + 1 if mx is not None else 64
    # snapshot log: the superseded state (with every segment appended
    # while it was current) is frozen into history; `vacuum` retains
    # the newest `keep_snapshots` entries — the same commit-vs-expiry
    # split as the dedup index's `_write_index_snapshot`
    from ..plans.publish import referenced_roots, segmented_history
    history = segmented_history(man, _TEXT_ENTRY_KEYS)
    history.append({"snapshot": snapshot_id, "segments": [snap],
                    "n_buckets": n_buckets})
    if vacuum:
        if keep_snapshots < 1:
            raise ValueError("keep_snapshots must be >= 1")
        history = history[-keep_snapshots:]
    manifest = {"snapshot": snapshot_id, "segments": [snap],
                "n_buckets": n_buckets, "history": history}
    _write_text_manifest(path, manifest)
    if vacuum:
        keep = referenced_roots(path, history)
        for d in os.listdir(path):
            full = os.path.join(path, d)
            if d in keep or not os.path.isdir(full):
                continue
            if (d.startswith("seg-") or d.startswith("snap=")
                    or d in ("postings", "stats", "postings_schema")):
                shutil.rmtree(full)
    return manifest


_TEXT_ENTRY_KEYS = ("snapshot", "segments", "n_buckets")


def text_index_history(path: str) -> list[dict]:
    """Snapshot log of the BM25 index, oldest → newest (current last);
    ``[]`` for a build-once index.  Entries are frozen AS-SUPERSEDED
    states (segments appended while a snapshot was current ride in its
    entry), same semantics as ``dedup.index_snapshot_history``."""
    from ..plans.publish import segmented_history
    return segmented_history(_read_text_manifest(path), _TEXT_ENTRY_KEYS)


def expire_text_index_snapshots(path: str, keep_last: int = 1) -> dict:
    """Drop all but the newest ``keep_last`` retained BM25 snapshots —
    the file-expiry half of the lifecycle, separated from compaction so
    retention runs on its own schedule; the current snapshot is always
    kept.  Returns the rewritten manifest."""
    from ..plans.publish import expire_segmented_snapshots
    return expire_segmented_snapshots(
        path, _IDX_MANIFEST, _TEXT_ENTRY_KEYS, keep_last=keep_last,
        legacy_dirs=("postings", "stats", "postings_schema"))


def _read_text_segments(spark, segments: list[str],
                        buckets: list | None = None,
                        terms: list[str] | None = None):
    """(tf, stats) across segments: per-segment pruned posting scans
    unioned, per-segment stats folded with document-count weights.
    With ONE segment the stats pass through unfolded — byte-identical
    to the build-once read."""
    tfs, sts = [], []
    for seg in segments:
        schema = spark.read.parquet(f"{seg}/postings_schema").schema
        t = spark.read.schema(schema).parquet(f"{seg}/postings")
        if buckets is not None:
            t = t.filter(F.col("bucket").isin(buckets))
        if terms is not None:
            t = t.filter(F.col("term").isin(list(terms)))
        tfs.append(t)
        sts.append(spark.read.parquet(f"{seg}/stats"))
    tf = tfs[0]
    for t in tfs[1:]:
        tf = tf.unionByName(t)
    if len(sts) == 1:
        return tf, sts[0]
    stats_all = sts[0]
    for s in sts[1:]:
        stats_all = stats_all.unionByName(s)
    return tf, stats_all.agg(
        F.sum("n_docs").alias("n_docs"),
        (F.sum(F.col("n_docs") * F.col("avgdl")) / F.sum("n_docs"))
        .alias("avgdl"))


def query_text_index(spark, path: str, terms: list[str], k: int = 20,
                     k1: float = 1.2, b: float = 0.75,
                     n_buckets: int = 64,
                     snapshot_id: str | None = None) -> DataFrame:
    """BM25 top-k served from a materialized index: the query terms'
    bucket ids are LITERALS, so they reach every segment's postings
    scan as PartitionFilters (pruned directories, not filtered rows)
    with the term filter pushed beneath; scoring is identical to
    ``bm25_topk`` (df and corpus stats fold across segments).

    ``snapshot_id`` time-travels: serve from a RETAINED snapshot (see
    ``text_index_history``) instead of the current one — the
    repeatable-scan pin a reader holds across a compaction until
    ``expire_text_index_snapshots`` drops it."""
    man = _read_text_manifest(path)
    if snapshot_id is not None:
        from ..plans.publish import resolve_segmented_snapshot
        man = resolve_segmented_snapshot(man, _TEXT_ENTRY_KEYS,
                                         snapshot_id, "BM25 index")
    if man.get("n_buckets") is not None:
        n_buckets = man["n_buckets"]
    # no driver-side xxhash64 exists; compute the buckets with a tiny
    # Spark job (once per query batch) so the hash definition stays
    # single-sourced with the writer
    bucket_rows = (spark.createDataFrame([(t,) for t in terms], ["term"])
                   .select(F.pmod(F.xxhash64("term"),
                                  F.lit(n_buckets)).alias("b"))
                   .distinct().collect())
    buckets = sorted({r.b for r in bucket_rows})
    tf, stats = _read_text_segments(spark, man["segments"],
                                    buckets=buckets, terms=terms)
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    contrib = (F.log((F.col("n_docs") - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0)
               * F.col("tf") * (k1 + 1.0)
               / (F.col("tf")
                  + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))))
    return (tf.join(F.broadcast(df_t), "term")
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(F.round(F.sum(contrib), 4).alias("bm25"))
            .orderBy(F.col("bm25").desc(), "doc_id")
            .limit(k))


def text_index_stats(spark, path: str) -> DataFrame:
    """Observability census for the (possibly segmented) BM25 index —
    the pre-query go/no-go row, mirroring ``prefix_posting_stats`` /
    ``lsh_bucket_stats``: one row (n_postings, n_terms, max_df, n_docs,
    avgdl, n_segments).  ``max_df`` is the widest posting list — the
    term whose bucket a degenerate query ("the") would scan; a pipeline
    should log it before committing to serve.  Folds across segments
    exactly like the query path, so the census describes what queries
    will actually read."""
    man = _read_text_manifest(path)
    tf, stats = _read_text_segments(spark, man["segments"])
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    core = tf.agg(F.count(F.lit(1)).cast("bigint").alias("n_postings"))
    terms = dfs.agg(F.count(F.lit(1)).cast("bigint").alias("n_terms"),
                    F.max("df").cast("bigint").alias("max_df"))
    return (core.crossJoin(F.broadcast(terms))
            .crossJoin(F.broadcast(stats))
            .select("n_postings", "n_terms", "max_df",
                    F.col("n_docs").cast("bigint").alias("n_docs"),
                    F.round("avgdl", 4).alias("avgdl"),
                    F.lit(len(man["segments"])).cast("int")
                    .alias("n_segments")))

"""Training-corpus preparation operators (beyond the reference surface).

Three ops every large-scale training-data pipeline needs in front of a
tokenizer, all pure DataFrame / JVM-side:

- ``contamination`` — flag corpus docs sharing word n-gram shingles with a
  benchmark/eval set.  The benchmark side is tiny by construction (eval
  sets are thousands of docs, the corpus is 10^12) → distinct benchmark
  shingles broadcast; the corpus side never shuffles.
- ``pii_redact`` — regex redaction of emails / long digit runs with
  per-doc hit counts; a pure projection (whole-stage codegen, no shuffle).
- ``pack_shards`` — deterministic token-budget shard assignment via a
  distributed prefix-sum: per-bucket token totals (tiny) get an exclusive
  running offset, docs get a bucket-local cumulative sum under a window
  partitioned by bucket.  No global single-partition window at any scale:
  the only global ordering runs over the bucket-totals table
  (|corpus| / bucket_size rows), mirroring how Spark's own
  repartitionByRange samples boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingle_rows

EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
LONGNUM_RE = r"\d{6,}"


def contamination(docs: DataFrame, benchmark: DataFrame, n: int = 3,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc count + ratio of word n-gram shingles that also occur in
    ``benchmark``.  Inner-join against the broadcast distinct benchmark
    shingle set; docs with zero hits are reported with ratio 0 via the
    left join back onto the corpus."""
    bench_sh = (shingle_rows(benchmark, id_col=id_col, text_col=text_col, n=n)
                .select("shingle").distinct())
    doc_sh = shingle_rows(docs, id_col=id_col, text_col=text_col, n=n)
    totals = doc_sh.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_shingles"))
    hits = (doc_sh.join(F.broadcast(bench_sh), "shingle")
            .groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_hits")))
    return (totals.join(hits, "doc_id", "left")
            .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)).cast("bigint"))
            .withColumn("contamination",
                        F.round(F.col("n_hits") / F.col("n_shingles"), 4))
            .select("doc_id", "n_shingles", "n_hits", "contamination"))


def pii_redact(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Redact emails and ≥6-digit runs; emit hit counts for monitoring.
    Pure projection — Catalyst keeps it inside one codegen span."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_replace(F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
                         LONGNUM_RE, "<NUM>").alias("clean_text"),
        # lit-pattern form, not expr(): a backslash inside a SQL string
        # literal would be eaten by the SQL parser before reaching the regex
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
        .cast("int").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(LONGNUM_RE), F.lit(0)))
        .cast("int").alias("n_numbers"))


def pack_shards(docs: DataFrame, token_budget: int = 2000,
                bucket_size: int = 100, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Assign each doc to a training shard so shards hold ~``token_budget``
    whitespace tokens, preserving doc_id order (shard_id = start-offset
    div budget — the streaming-packing approximation of bin packing).

    Distributed prefix-sum: bucket = doc_id div ``bucket_size``; the
    global cumulative offset is computed once over the per-bucket totals
    (a table ``bucket_size``× smaller than the corpus) and broadcast back;
    the per-doc cumsum window is partitioned by bucket."""
    toks = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.size(F.split(text_col, r"\s+")).cast("bigint").alias("n_tokens"))
    toks = toks.withColumn(
        "bucket", F.floor(F.col("doc_id") / bucket_size).cast("bigint"))
    btot = toks.groupBy("bucket").agg(F.sum("n_tokens").alias("btot"))
    wb = (Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1))
    boff = btot.withColumn(
        "boffset", F.coalesce(F.sum("btot").over(wb), F.lit(0)))
    w = (Window.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (toks.join(F.broadcast(boff.select("bucket", "boffset")), "bucket")
            .withColumn("cum", F.col("boffset") + F.sum("n_tokens").over(w))
            .select("doc_id", "n_tokens",
                    F.floor((F.col("cum") - F.col("n_tokens")) / token_budget)
                    .cast("bigint").alias("shard_id")))

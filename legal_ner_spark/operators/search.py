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


def build_text_index(docs: DataFrame, path: str, n_buckets: int = 64,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> None:
    """Materialize an inverted index for BM25 serving: posting lists
    (term, doc_id, tf, dl) written ONCE as parquet partitioned by a
    term-hash bucket (Iceberg: identity-partition on the bucket), corpus
    stats (n_docs, avgdl) alongside.  The 100 TB pattern mirrors the IVF
    index: the corpus-side tokenize/aggregate pass runs once; every
    subsequent query reads only its terms' buckets via partition pruning
    + a pushed term filter — posting-list I/O instead of a corpus scan.

    Bucketing by ``xxhash64(term) % n_buckets`` keeps any single
    partition ~1/n_buckets of the posting volume regardless of term skew
    ACROSS terms; a single degenerate term ("the") still concentrates in
    one bucket, which is why serving filters on term before scoring —
    the scan cost is bounded by the bucket, the compute by the term."""
    toks = F.split(F.lower(text_col), " ")
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    (base.agg(F.count("*").alias("n_docs"),
              F.avg(F.size("toks")).alias("avgdl"))
     .write.mode("overwrite").parquet(f"{path}/stats"))
    postings = (base.select("doc_id", F.size("toks").alias("dl"),
                            F.explode("toks").alias("term"))
                .groupBy("doc_id", "dl", "term")
                .agg(F.count("*").alias("tf"))
                .withColumn("bucket",
                            F.pmod(F.xxhash64("term"), F.lit(n_buckets))))
    (postings.write.mode("overwrite").partitionBy("bucket")
     .parquet(f"{path}/postings"))
    # a 0-row, UNpartitioned twin pins the schema: an empty corpus (or a
    # bucket layout with no matching partitions) leaves the partitioned
    # dir without inferable schema, and the reader must not depend on
    # data being present (works on any filesystem, unlike a sidecar file)
    (postings.limit(0).write.mode("overwrite")
     .parquet(f"{path}/postings_schema"))


def query_text_index(spark, path: str, terms: list[str], k: int = 20,
                     k1: float = 1.2, b: float = 0.75,
                     n_buckets: int = 64) -> DataFrame:
    """BM25 top-k served from a materialized index: the query terms'
    bucket ids are LITERALS, so they reach the postings scan as
    PartitionFilters (pruned directories, not filtered rows) with the
    term filter pushed beneath; scoring is identical to ``bm25_topk``."""
    # no driver-side xxhash64 exists; compute the buckets with a tiny
    # Spark job (once per query batch) so the hash definition stays
    # single-sourced with the writer
    bucket_rows = (spark.createDataFrame([(t,) for t in terms], ["term"])
                   .select(F.pmod(F.xxhash64("term"),
                                  F.lit(n_buckets)).alias("b"))
                   .distinct().collect())
    buckets = sorted({r.b for r in bucket_rows})
    stats = spark.read.parquet(f"{path}/stats")
    schema = spark.read.parquet(f"{path}/postings_schema").schema
    tf = (spark.read.schema(schema).parquet(f"{path}/postings")
          .filter(F.col("bucket").isin(buckets))
          .filter(F.col("term").isin(list(terms))))
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

"""End-to-end KG construction pipeline.

Plan shape at scale (SURVEY.md §3.1):

    Iceberg/parquet corpus scan (partition-pruned, column-pruned)
      → mapInPandas [fused extract: assemble → split → tag → postprocess
                     → triples]               (narrow, zero-shuffle)
      → write records table partitioned by (rec_type, doc bucket)
      → downstream projections & aggregations read the materialized table

Materialize-once is deliberate: the records table is written a single time
and every derived view (triples, mentions, clusters, counts) is a pruned
column/partition read — no re-execution of the Python stage per consumer.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import CORPUS_SCHEMA
from .operators import extract as ops
from . import synth


def synthetic_corpus(spark: SparkSession, n_docs: int,
                     partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus: spark.range fan-out, one gen_doc per
    id, seeded by id (synth.py) — no driver materialization, scales to any
    n_docs."""

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [synth.gen_doc(int(i)) for i in pdf["id"]],
                columns=["doc_id", "spans"])

    rng = spark.range(n_docs, numPartitions=partitions)
    return rng.mapInPandas(gen, CORPUS_SCHEMA)


def extract_records(corpus: DataFrame, carry_spans: bool = True,
                    text_type: str = "doc",
                    strict_compat: bool = True) -> DataFrame:
    """``text_type`` ∈ {'doc','sent'}: the reference's run_type knob
    (legal_ner.py:24-27) — see operators.extract.extract_records."""
    return ops.extract_records(corpus, carry_spans=carry_spans,
                               text_type=text_type,
                               strict_compat=strict_compat)


def extract_triples(corpus: DataFrame, text_type: str = "doc") -> DataFrame:
    return ops.triples(ops.extract_records(corpus, text_type=text_type))


def run_to_parquet(corpus: DataFrame, out_path: str,
                   text_type: str = "doc") -> None:
    """Materialize the records table (production: Iceberg partitioned by
    (rec_type, bucket(doc_id)); sandbox: parquet partitioned by rec_type)."""
    (ops.extract_records(corpus, text_type=text_type)
     .write.mode("overwrite").partitionBy("rec_type").parquet(out_path))


def read_records(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def flagship_query(records: DataFrame) -> DataFrame:
    """README.md:246-254's question — per-doc provision-of-statute
    frequencies — over the materialized records."""
    return (ops.unique_provision_counts(records)
            .orderBy("doc_id", F.desc("freq"), "provision_of_statute"))

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship KG query: build the deterministic judgment
corpus (size tied to the sf0.001 documents table), run the fused zero-shuffle
extraction pipeline, return the triples DataFrame.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator family
from SURVEY.md §2 plus the training-data-pipeline operators; oracles are
DuckDB-ANSI SQL over the same parquet tables (or shared VALUES fixtures).
The order-sensitive full-pipeline queries (kg_*) intentionally have no SQL
form (SURVEY.md §2.3) and get rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from legal_ner_spark import pipeline
    from legal_ner_spark.operators import extract as ops

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = max(16, min(64, docs.count() // 10))
    corpus = pipeline.synthetic_corpus(spark, n)
    return ops.triples(pipeline.extract_records(corpus))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from legal_ner_spark.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from legal_ner_spark.queries import ORACLES
    return dict(ORACLES)

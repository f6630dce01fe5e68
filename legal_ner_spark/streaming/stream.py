"""Structured Streaming wrapper over the batch operators.

The reference has no streaming surface (SURVEY.md §2.8) — this is the
engine's incremental-ingest path: new corpus files appear under a directory
(production: Iceberg table appends), each micro-batch runs the *identical*
fused extract operator via ``foreachBatch``, appending to the records table.
All state is per-document, so no watermarks or stateful operators are
needed — exactly-once comes from the sink's idempotent batch-id handling
(checkpointLocation).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..schema import CORPUS_SCHEMA
from ..operators import extract as ops


def stream_extract(spark: SparkSession, corpus_dir: str, out_dir: str,
                   checkpoint_dir: str,
                   max_files_per_trigger: int = 4) -> StreamingQuery:
    """Watch ``corpus_dir`` for new corpus parquet files; extract each
    micro-batch with the batch operator; append records parquet."""
    stream = (spark.readStream.schema(CORPUS_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(corpus_dir))

    def process(batch_df, batch_id: int) -> None:
        (ops.extract_records(batch_df)
         .write.mode("append").parquet(out_dir))

    return (stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())

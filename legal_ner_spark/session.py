"""SparkSession factory with the engine's scale-oriented defaults.

Defaults chosen for the 100 TB design point and scaled down by parallelism
for local runs: AQE on (runtime coalescing + skew-join splitting — the
explicit mitigation for IPC/CrPC key skew, SURVEY.md §4), bounded Arrow
batches (documents are large; a 10k-row Arrow batch of mega-docs would blow
executor memory — the per-batch cap complements the reference's own 20k-token
chunk guard, data_preparation.py:73-78).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "legal-ner-spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              arrow_batch_rows: int = 64, extra_conf: dict | None = None
              ) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        # respect an externally-configured master (spark-submit --master
        # yarn/k8s sets spark.master in system properties; unconditionally
        # calling .master() here would silently turn a cluster deployment
        # into a local run).  Only default to local[N] when nothing is set.
        from pyspark import SparkConf
        if SparkConf().get("spark.master", None) is None:
            master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(arrow_batch_rows))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

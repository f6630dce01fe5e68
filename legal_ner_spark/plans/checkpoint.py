"""Lineage truncation for the iterative tier (CC, PageRank, near-dedup).

Iterative DataFrame algorithms grow their logical plan every round; some
truncation device is mandatory or analysis time explodes.  Two tiers:

- ``localCheckpoint`` (default, ``checkpoint_dir=None``): blocks live in
  executor memory/disk.  Cheapest, and fine single-node — but on a real
  cluster losing ONE executor mid-iteration makes the truncated lineage
  unrecoverable and fails the job.
- durable parquet round-trip (``checkpoint_dir`` set): each round writes
  to ``{checkpoint_dir}/{tag}`` and reads it back.  Survives executor
  loss (the 100 TB path — point it at HDFS/S3); costs one write+read of
  a tiny (id, label) table per round.

``Truncator`` hands out UNIQUE paths per call — a round-trip must never
overwrite the path the incoming plan is still reading from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class Truncator:
    """Per-job lineage truncation: ``t(df, "tag")`` returns an
    equivalent DataFrame whose plan is a leaf.  Thread one instance
    through an iterative operator; pass ``checkpoint_dir`` for durable
    (cluster-safe) truncation, leave ``None`` for localCheckpoint."""

    def __init__(self, checkpoint_dir: str | None = None):
        self.checkpoint_dir = checkpoint_dir
        self._n = 0

    def __call__(self, df: DataFrame, tag: str = "step") -> DataFrame:
        if self.checkpoint_dir is None:
            return df.localCheckpoint(eager=True)
        self._n += 1
        path = f"{self.checkpoint_dir}/{self._n:04d}_{tag}"
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)

"""Graph analytics over the materialized triples table.

The KG output is a standard (subj, pred, obj) edge table; these operators
show the downstream-analytics path: degree views and an iterative PageRank
over the citation graph, expressed as repeated join+aggregate (the
GraphFrames pattern) with lineage truncation per iteration.

Scale shape: each PageRank iteration is one shuffle keyed by node id;
ranks are (node, double) — tiny relative to the corpus; AQE coalesces the
post-join exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def node_degrees(triples: DataFrame, pred: str | None = None) -> DataFrame:
    t = triples if pred is None else triples.filter(F.col("pred") == pred)
    out_d = t.groupBy(F.col("subj").alias("node")).agg(
        F.count("*").cast("bigint").alias("out_degree"))
    in_d = t.groupBy(F.col("obj").alias("node")).agg(
        F.count("*").cast("bigint").alias("in_degree"))
    return (out_d.join(in_d, "node", "full_outer")
            .fillna(0, ["out_degree", "in_degree"]))


def pagerank(triples: DataFrame, pred: str | None = None,
             damping: float = 0.85, n_iter: int = 10,
             checkpoint_dir: str | None = None) -> DataFrame:
    """PageRank over the (deduplicated) edge set of one predicate.

    ``checkpoint_dir``: when set, per-iteration lineage truncation is a
    durable parquet round-trip (cluster-safe — localCheckpoint blocks
    die with their executor and kill the job mid-iteration; point this
    at HDFS/S3 on a real cluster).  Output is identical either way."""
    from ..plans.checkpoint import Truncator
    trunc = Truncator(checkpoint_dir)
    edges = (triples if pred is None
             else triples.filter(F.col("pred") == pred))
    edges = trunc(edges.select(F.col("subj").alias("src"),
                               F.col("obj").alias("dst")).distinct(), "edges")
    nodes = trunc(edges.select(F.col("src").alias("node"))
                  .union(edges.select(F.col("dst").alias("node")))
                  .distinct(), "nodes")
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    # materialize once: out_deg feeds a join in EVERY iteration — left lazy
    # it would re-run the edges groupBy shuffle n_iter times
    out_deg = trunc(edges.groupBy("src").agg(F.count("*").alias("deg")),
                    "out_deg")
    dangling = trunc(nodes.join(out_deg.withColumnRenamed("src", "node"),
                                "node", "left_anti"), "dangling")
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        # dangling nodes spread their mass uniformly (standard PageRank);
        # the mass stays a 1-row DataFrame broadcast-cross-joined into the
        # update — no .first()/collect, so each iteration costs exactly
        # ONE job (the lineage-truncating checkpoint), not two
        d_mass = (dangling.join(ranks, "node")
                  .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d_mass")))
        contrib = (edges.join(out_deg, "src")
                   .join(ranks.withColumnRenamed("node", "src"), "src")
                   .select(F.col("dst").alias("node"),
                           (F.col("rank") / F.col("deg")).alias("c")))
        ranks = (nodes.join(contrib.groupBy("node")
                            .agg(F.sum("c").alias("c")), "node", "left")
                 .crossJoin(F.broadcast(d_mass))
                 .select("node",
                         ((1 - damping) / n
                          + damping * (F.coalesce("c", F.lit(0.0))
                                       + F.col("d_mass") / n))
                         .alias("rank"))
                 )
        ranks = trunc(ranks, "ranks")
    return ranks.withColumn("rank", F.round("rank", 6))

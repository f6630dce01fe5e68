"""spark-submit entry point for INCREMENTAL KG construction: ingest one
batch of interleaved documents, extract its triples, and publish a new
atomic snapshot in which

  - every PREVIOUS batch's triple table is carried BY REFERENCE
    (immutable ``snap=`` dirs — the new snapshot re-points at them, so
    an ingest writes O(batch), never O(corpus): the append-only Iceberg
    shape over the existing manifest machinery);
  - the small ``kg_degrees`` stats table is maintained INCREMENTALLY —
    previous degrees folded with the batch delta via one full-outer sum,
    never recomputed from the corpus (equivalence to full recompute is
    pinned by tests/test_incremental_kg.py);
  - the manifest flip stays the single commit point: a reader sees the
    old corpus until the instant the new one is complete, and a crash
    mid-ingest leaves the published snapshot untouched (resume = re-run
    the same --snapshot-id, which is idempotent: a replay of the
    CURRENT snapshot's id reuses its batch-table name instead of
    minting a new one).

Cluster usage:

    zip -r legal_ner_spark.zip legal_ner_spark
    spark-submit --py-files legal_ner_spark.zip jobs/incremental_kg.py \
        --corpus <parquet dir of (doc_id, spans)> \
        --root <publish root> --snapshot-id 2026-08-17 [--vacuum]
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legal_ner_spark import pipeline  # noqa: E402
from legal_ner_spark.operators import extract as ops  # noqa: E402
from legal_ner_spark.plans import publish  # noqa: E402

_BATCH_PREFIX = "triples_b"


def triple_degrees(triples: DataFrame) -> DataFrame:
    """(node, out_degree, in_degree) over one triple set — the delta the
    incremental fold consumes."""
    out = (triples.groupBy(F.col("subj").alias("node"))
           .agg(F.count(F.lit(1)).alias("out_degree")))
    inn = (triples.groupBy(F.col("obj").alias("node"))
           .agg(F.count(F.lit(1)).alias("in_degree")))
    return (out.join(inn, "node", "full_outer")
            .select("node",
                    F.coalesce("out_degree", F.lit(0)).cast("bigint")
                    .alias("out_degree"),
                    F.coalesce("in_degree", F.lit(0)).cast("bigint")
                    .alias("in_degree")))


def fold_degrees(base: DataFrame, delta: DataFrame) -> DataFrame:
    """base ⊕ delta: one full-outer join summing both degree columns —
    degree maintenance is a semigroup fold, so batch-at-a-time
    application equals recompute over the whole corpus."""
    d = delta.select(F.col("node").alias("dnode"),
                     F.col("out_degree").alias("d_out"),
                     F.col("in_degree").alias("d_in"))
    return (base.join(d, base.node == d.dnode, "full_outer")
            .select(F.coalesce("node", "dnode").alias("node"),
                    (F.coalesce("out_degree", F.lit(0))
                     + F.coalesce("d_out", F.lit(0))).cast("bigint")
                    .alias("out_degree"),
                    (F.coalesce("in_degree", F.lit(0))
                     + F.coalesce("d_in", F.lit(0))).cast("bigint")
                    .alias("in_degree")))


def read_triples(spark: SparkSession, root: str) -> DataFrame:
    """Union of every published batch table — the reader's view of the
    whole triple corpus (batch dirs are leaf parquet scans; Spark unions
    them without shuffling)."""
    man = publish.current_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no published snapshot under {root}")
    parts = [spark.read.parquet(p) for t, p in sorted(man["tables"].items())
             if t.startswith(_BATCH_PREFIX)]
    if not parts:
        raise FileNotFoundError(f"no {_BATCH_PREFIX}* tables under {root}")
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def ingest_batch(spark: SparkSession, root: str, corpus: DataFrame,
                 snapshot_id: str) -> dict:
    """Extract one batch and publish the next snapshot.  Returns the new
    manifest."""
    recs = pipeline.extract_records(corpus)
    tri = ops.triples(recs)
    delta = triple_degrees(tri)

    man = publish.current_manifest(root)
    prev_batches = sorted(
        t for t in (man["tables"] if man else {})
        if t.startswith(_BATCH_PREFIX))
    if man is not None and man.get("snapshot") == snapshot_id:
        # replay of the current snapshot (crash after flip, rerun):
        # rewrite ITS batch table instead of minting a new one, and fold
        # the delta onto the degrees of the snapshot BEFORE it — which is
        # exactly current degrees minus the replayed delta; since the
        # replayed batch is identical, re-folding from the prior base
        # reproduces the same table.  The prior base is recoverable from
        # the carried batches, so recompute it from them.
        replay_name = prev_batches[-1]
        carried = prev_batches[:-1]
        if carried:
            base = triple_degrees(
                _union([spark.read.parquet(man["tables"][t])
                        for t in carried]))
            new_deg = fold_degrees(base, delta)
        else:
            new_deg = delta
        bname = replay_name
    else:
        carried = prev_batches
        bname = f"{_BATCH_PREFIX}{len(prev_batches):05d}"
        if man is not None:
            base = publish.read_published(spark, root, "kg_degrees")
            new_deg = fold_degrees(base, delta)
        else:
            new_deg = delta

    carry = {t: man["tables"][t] for t in carried} if man else {}
    return publish.publish_tables(
        {bname: tri, "kg_degrees": new_deg}, root, snapshot_id,
        carry=carry)


def _union(dfs: list[DataFrame]) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True,
                    help="parquet dir of (doc_id, spans) documents")
    ap.add_argument("--root", required=True, help="publish root")
    ap.add_argument("--snapshot-id", required=True)
    ap.add_argument("--vacuum", action="store_true",
                    help="GC unreachable snapshots after the flip")
    ap.add_argument("--master", default="local[*]")
    args = ap.parse_args()

    from legal_ner_spark.session import get_spark
    spark = get_spark(app_name="incremental-kg", master=args.master)
    corpus = spark.read.parquet(args.corpus)
    man = ingest_batch(spark, args.root, corpus, args.snapshot_id)
    print(f"published snapshot {man['snapshot']}: "
          f"{sorted(man['tables'])}")
    if args.vacuum:
        removed = publish.vacuum(args.root)
        print(f"vacuumed: {removed}")
    spark.stop()


if __name__ == "__main__":
    main()


def compact(spark: SparkSession, root: str, snapshot_id: str) -> dict:
    """Compact the accumulated per-batch triple tables into ONE table —
    the Iceberg 'rewrite data files' maintenance move: reader cost is
    O(tables) per query, so after many small ingests a compaction pass
    rewrites the union once and re-publishes.  The manifest flip is
    still the commit point (readers see either all batches or the one
    compacted table, never a mix), old snapshots stay readable until
    vacuum, and the small kg_degrees table is carried BY REFERENCE —
    compaction rewrites bytes, it must not change any answer."""
    man = publish.current_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no published snapshot under {root}")
    if snapshot_id == man.get("snapshot"):
        # mirror the ingest replay guard, but for the OPPOSITE reason:
        # the compacted table writes to triples_b00000/snap=<id> while
        # LAZILY reading the published batch dirs — if <id> is the
        # current snapshot (e.g. b00000 was written under it), the
        # overwrite target equals a read source and Spark would
        # self-overwrite its input mid-scan.  Compaction must mint a
        # fresh snapshot id.
        raise ValueError(
            f"snapshot_id {snapshot_id!r} is the currently published "
            "snapshot — compact() needs a fresh id, or the rewrite of "
            "triples_b00000 could overwrite a table it is reading")
    batches = sorted(t for t in man["tables"]
                     if t.startswith(_BATCH_PREFIX))
    if len(batches) <= 1:
        return man
    target = os.path.normpath(os.path.join(
        root, f"{_BATCH_PREFIX}00000", f"snap={snapshot_id}"))
    sources = {os.path.normpath(man["tables"][t]) for t in batches}
    if target in sources:
        # same hazard via a CARRIED dir: b00000 may sit at an older
        # snapshot than the manifest's — the current-snapshot check
        # above cannot see that collision
        raise ValueError(
            f"compact target {target} is one of the batch dirs being "
            "read — pick a snapshot id no batch table was written under")
    all_tri = _union([spark.read.parquet(man["tables"][t])
                      for t in batches])
    # publish_tables builds the manifest from carry + written tables
    # ONLY, so the stale batch entries vanish with the same atomic flip
    carry = {"kg_degrees": man["tables"]["kg_degrees"]}
    return publish.publish_tables(
        {f"{_BATCH_PREFIX}00000": all_tri}, root, snapshot_id,
        carry=carry)

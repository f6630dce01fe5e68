"""Atomic multi-table snapshot publish (Iceberg-commit stand-in).

The KG job materializes SEVERAL tables that must stay mutually
consistent — triples, mentions, cluster heads, stats.  A crash between
two table writes must never leave readers seeing new triples against old
mentions.  Iceberg solves this with a snapshot commit; the parquet
equivalent here is the same two-phase shape:

1. every table writes to an IMMUTABLE snapshot directory
   ``<root>/<table>/snap=<snapshot_id>/`` (a re-run of the same snapshot
   id overwrites its own directories — idempotent, like a replayed
   foreachBatch);
2. one atomic manifest swap (`os.rename` of ``_current.json``; on
   HDFS/S3 the same role is played by an Iceberg snapshot commit or a
   conditional PUT) flips ALL tables at once.

Readers resolve through the manifest, so a publish that dies after
writing some tables is invisible: the manifest still names the previous
snapshot, whose directories are immutable.  Old snapshots stay readable
until vacuumed (time travel for free).

Complements `plans/ledger.py` (intra-job per-bucket resume) — the ledger
gets a killed JOB back to where it was; the manifest keeps CONSUMERS
consistent across job boundaries.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_current.json"


def publish_tables(tables: dict[str, DataFrame], root: str,
                   snapshot_id: str,
                   partition_by: dict[str, list[str]] | None = None,
                   carry: dict[str, str] | None = None) -> dict:
    """Write every table to its ``snap=<snapshot_id>`` directory, then
    atomically swap the manifest.  Returns the manifest dict.

    ``carry`` maps table names to EXISTING snapshot paths (from the
    previous manifest) to be re-referenced without rewriting — the
    incremental-maintenance move: only the changed table pays a write,
    unchanged ones ride along because their directories are immutable
    and ``vacuum`` keeps every snapshot the manifest still names."""
    partition_by = partition_by or {}
    entries = dict(carry or {})
    for name, df in tables.items():
        path = os.path.join(root, name, f"snap={snapshot_id}")
        writer = df.write.mode("overwrite")
        if name in partition_by:
            writer = writer.partitionBy(*partition_by[name])
        writer.parquet(path)
        entries[name] = path
    manifest = {"snapshot": snapshot_id, "tables": entries}
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, f".{_MANIFEST}.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, os.path.join(root, _MANIFEST))  # the commit point
    return manifest


def current_manifest(root: str) -> dict | None:
    path = os.path.join(root, _MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def vacuum(root: str, keep_ids: set[str] | None = None,
           dry_run: bool = False) -> dict[str, list[str]]:
    """Delete snapshot directories no longer reachable: everything except
    the manifest-referenced snapshot and ``keep_ids`` (pass an in-flight
    publish's id here — an unfinished publish is unreferenced and would
    otherwise be collected as garbage, which is correct AFTER it is
    abandoned but not while it is being written).  The current snapshot
    can never be removed.  Returns {table: [removed snapshot ids]};
    ``dry_run`` reports without deleting (run it first at 100 TB — the
    same listing is the audit trail)."""
    import shutil

    manifest = current_manifest(root)
    if manifest is None:
        raise FileNotFoundError(f"no published snapshot under {root}")
    # per-table keep: the snapshot id the manifest references for THAT
    # table (which may be OLDER than the committed id when the table was
    # carried by reference — publish_tables carry=…) plus keep_ids
    base_keep = {manifest["snapshot"]} | (keep_ids or set())
    table_keep: dict[str, set[str]] = {}
    for name, path in manifest["tables"].items():
        leaf = os.path.basename(path.rstrip("/"))
        if leaf.startswith("snap="):
            table_keep.setdefault(name, set()).add(leaf.split("=", 1)[1])
    removed: dict[str, list[str]] = {}
    for table in sorted(os.listdir(root)):
        tdir = os.path.join(root, table)
        if not os.path.isdir(tdir):
            continue
        keep = base_keep | table_keep.get(table, set())
        for entry in sorted(os.listdir(tdir)):
            if not entry.startswith("snap="):
                continue
            snap_id = entry.split("=", 1)[1]
            if snap_id in keep:
                continue
            if not dry_run:
                shutil.rmtree(os.path.join(tdir, entry))
            removed.setdefault(table, []).append(snap_id)
    return removed


def read_published(spark: SparkSession, root: str, name: str) -> DataFrame:
    """Read a table AT THE CURRENT SNAPSHOT (never a half-published
    one).  Raises KeyError if the table was not part of the snapshot."""
    manifest = current_manifest(root)
    if manifest is None:
        raise FileNotFoundError(f"no published snapshot under {root}")
    return spark.read.parquet(manifest["tables"][name])

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


def read_snapshot(spark: SparkSession, root: str, name: str,
                  snapshot_id: str) -> DataFrame:
    """Time-travel read: a table at a SPECIFIC retained snapshot.
    Snapshot directories are immutable once published, so any id that
    survives retention (`vacuum` keep_ids) is exactly the state the
    commit published; an expired or never-published id raises with the
    retained list, never a half-missing-directory scan."""
    tdir = os.path.join(root, name)
    path = os.path.join(tdir, f"snap={snapshot_id}")
    if not os.path.isdir(path):
        have = sorted(e.split("=", 1)[1] for e in os.listdir(tdir)
                      if e.startswith("snap=")) if os.path.isdir(tdir) \
            else []
        raise ValueError(
            f"snapshot {snapshot_id!r} of table {name!r} is not retained "
            f"under {root} (retained: {have}) — it was vacuumed, or "
            "never published")
    return spark.read.parquet(path)


# ---------------------------------------------------------------------
# Segmented-lifecycle snapshot log (BM25 text index, IVF): the
# commit-vs-file-expiry split for manifests whose state is a SEGMENT
# LIST that appends mutate between compactions.  The dedup/semantic
# lifecycles get the same split from their shared snapshot writer
# (operators/dedup.py `_write_index_snapshot`); these helpers give the
# two segment-list manifests one consistent implementation of history,
# snapshot resolution, and retention-driven expiry.
# ---------------------------------------------------------------------

def segmented_history(man: dict, entry_keys: tuple[str, ...]) -> list[dict]:
    """Snapshot log of a segmented manifest, oldest → newest, CURRENT
    LAST.  The current snapshot's entry is re-derived from the manifest
    body (not the stored history) because appends grow the live
    ``segments`` list after the snapshot was published — the body is
    authoritative for the current state; stored history entries are
    frozen as-superseded states.  A manifest whose ``snapshot`` is None
    (legacy build-once / fresh build) contributes no current entry —
    that state is untracked, exactly like the dedup index's flat
    layout."""
    hist = list(man.get("history", []))
    if man.get("snapshot") is not None:
        cur = {k: man[k] for k in entry_keys if k in man}
        hist = ([e for e in hist if e.get("snapshot") != man["snapshot"]]
                + [cur])
    return hist


def resolve_segmented_snapshot(man: dict, entry_keys: tuple[str, ...],
                               snapshot_id: str, what: str) -> dict:
    """The history entry for ``snapshot_id``, or a loud ValueError
    naming the retained ids — never a half-missing-directory scan."""
    hist = segmented_history(man, entry_keys)
    for e in hist:
        if e.get("snapshot") == snapshot_id:
            return e
    raise ValueError(
        f"snapshot {snapshot_id!r} is not retained in the {what} "
        f"(retained: {[e.get('snapshot') for e in hist]}) — it was "
        "expired, or never published")


def referenced_roots(path: str, entries: list[dict]) -> set[str]:
    """Top-level directory names under ``path`` that retained history
    entries still reference (segment roots, centroids, …) — the KEEP
    set for vacuum/expiry.  A reference equal to ``path`` itself (the
    legacy single-segment layout) contributes nothing: legacy states
    are untracked."""
    roots: set[str] = set()
    for e in entries:
        refs = list(e.get("segments", []))
        if "centroids" in e:
            refs.append(e["centroids"])
        for s in refs:
            rel = os.path.relpath(s, path)
            if rel != "." and not rel.startswith(".."):
                roots.add(rel.split(os.sep)[0])
    return roots


def expire_segmented_snapshots(path: str, manifest_name: str,
                               entry_keys: tuple[str, ...],
                               keep_last: int = 1,
                               legacy_dirs: tuple[str, ...] = ()) -> dict:
    """Drop all but the newest ``keep_last`` retained snapshots of a
    segmented index: prune the history, rewrite the manifest
    atomically, THEN delete unreferenced ``snap=``/``seg-`` directories
    (and untracked legacy flat dirs).  The current snapshot is the
    log's last entry and is always kept.  Returns the rewritten
    manifest."""
    import shutil
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    mpath = os.path.join(path, manifest_name)
    if not os.path.exists(mpath):
        raise ValueError(
            f"no manifest at {path} — a build-once index has no "
            "snapshots to expire; compact it first")
    with open(mpath) as fh:
        man = json.load(fh)
    hist = segmented_history(man, entry_keys)
    if not hist:
        raise ValueError(
            f"the index at {path} has never published a snapshot "
            "(snapshot is None) — compact it first")
    kept = hist[-keep_last:]
    manifest = {k: v for k, v in man.items() if k != "history"}
    manifest["history"] = kept
    tmp = os.path.join(path, f".{manifest_name}.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, mpath)  # commit point
    keep = referenced_roots(path, kept)
    for d in os.listdir(path):
        full = os.path.join(path, d)
        if d in keep or not os.path.isdir(full):
            continue
        if d.startswith("snap=") or d.startswith("seg-") \
                or d in legacy_dirs:
            shutil.rmtree(full)
    return manifest

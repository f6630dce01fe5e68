"""spark-submit entry point for incremental table maintenance: apply a
CDC change-log directory onto the currently-published snapshot of a
table, publish the result as a NEW atomic snapshot, and optionally
vacuum unreachable ones.

Composes the four storage subsystems end to end (the '10^12-document
corpus arrives as a change stream' path):

    plans/maintenance.cdc_apply   — fold + upsert + tombstones
    plans/publish.publish_tables  — atomic manifest flip (readers never
                                    see a half-applied day)
    plans/publish.vacuum          — snapshot GC behind the flip
    plans/maintenance.scd2_versions — optional audit table of attribute
                                    history, published in the SAME
                                    snapshot (mutually consistent)

Cluster usage:

    zip -r legal_ner_spark.zip legal_ner_spark
    spark-submit --py-files legal_ner_spark.zip jobs/maintain_table.py \
        --changes <parquet dir of (key…, value…, op, seq…)> \
        --root    <publish root>  --table <name> \
        --keys k  --values v1,v2  --seq ts,event_id \
        --snapshot-id 2026-08-17 [--scd2-attr v1] [--vacuum]

Re-running with the same --snapshot-id is idempotent (overwrites its own
snapshot dirs, re-flips the same manifest).  The FIRST run (no manifest
yet) bootstraps from an empty base.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--changes", required=True)
    ap.add_argument("--root", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--keys", required=True)
    ap.add_argument("--values", required=True)
    ap.add_argument("--seq", required=True)
    ap.add_argument("--op-col", default="op")
    ap.add_argument("--snapshot-id", required=True)
    ap.add_argument("--scd2-attr", default=None,
                    help="also publish <table>_history (SCD-2 of this "
                         "attribute over the change log)")
    ap.add_argument("--vacuum", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from legal_ner_spark.session import get_spark
    from legal_ner_spark.plans import maintenance as mt
    from legal_ner_spark.plans import publish

    keys = args.keys.split(",")
    values = args.values.split(",")
    seq = args.seq.split(",")
    from pyspark.sql import SparkSession
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(master=args.master or "local[*]",
                      app_name="maintain-table")
    changes = spark.read.parquet(args.changes)

    manifest = publish.current_manifest(args.root)
    if manifest and args.table in manifest["tables"]:
        base = publish.read_published(spark, args.root, args.table)
    else:  # bootstrap: first publish starts from the empty snapshot
        base = spark.createDataFrame(
            [], changes.select(*keys, *values).schema)

    tables = {args.table: mt.cdc_apply(base, changes, keys, values, seq,
                                       op_col=args.op_col)}
    if args.scd2_attr:
        tables[f"{args.table}_history"] = mt.scd2_versions(
            changes, keys, args.scd2_attr, seq[0], tie_cols=seq[1:])
    # carry the current snapshot's other tables BY REFERENCE — their
    # snap dirs are immutable; one manifest keeps naming ALL tables
    # (mutual consistency) and only the changed ones pay a write
    carry = {name: path for name, path in
             (manifest["tables"].items() if manifest else [])
             if name not in tables}
    publish.publish_tables(tables, args.root, args.snapshot_id,
                           carry=carry)
    if args.vacuum:
        removed = publish.vacuum(args.root)
        print(f"vacuumed: {removed}")
    n = publish.read_published(spark, args.root, args.table).count()
    print(f"published snapshot={args.snapshot_id} table={args.table} "
          f"rows={n}")
    if owns_session:  # embedded callers (tests) keep their session
        spark.stop()


if __name__ == "__main__":
    main()

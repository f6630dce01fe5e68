"""Measure the cost SHAPE of dedup_index_reconcile: wall vs window size
at a fixed corpus, against the full near_dedup rebuild.

The reconcile contract (operators/dedup.py): the expensive tiers —
shingling, banding, verification, WCC — touch only |window| raw docs
plus the |keepers| frozen surface; surviving keepers' sigs/sizes are
REUSED byte-for-byte (no minhash recompute); the only corpus-sized work
is the keepers-table metadata rewrite.  So on a duplication-heavy
corpus (keepers << docs) the wall should grow with the window and sit
well under the full rebuild — that is what this tool measures.

Corpus (deterministic): ``n_clusters`` chains of 1 base + 7 near-members
(each member mutates 2 distinct tokens of the 40-token base →
J(base, member) = 0.727; members are pairwise 0.52, below the 0.6
threshold, so clusters are stars through the keeper).  doc_ids are
contiguous per cluster; windows are the HIGHEST ids (the recent-batch
slice a rolling reconcile schedule would pass).  Each window run gets
its own copy of the built index so the runs are independent.

Usage: python tools/measure_reconcile_cost.py [n_clusters] [w1] [w2]
Prints one JSON line; the committed figure lives in BENCH.md.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

N_TOK = 40
MEMBERS = 8
THRESHOLD = 0.6


def build_corpus(n_clusters: int):
    rows = []
    for c in range(n_clusters):
        base = [f"c{c}t{i}" for i in range(N_TOK)]
        rows.append((c * MEMBERS, " ".join(base)))
        for j in range(1, MEMBERS):
            mem = list(base)
            for p in (j, j + 20):
                mem[p] = f"m{j}p{p}"
            rows.append((c * MEMBERS + j, " ".join(mem)))
    return rows


def main() -> None:
    from legal_ner_spark.session import get_spark
    from legal_ner_spark.operators import dedup

    n_clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
    w1 = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    w2 = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    rows = build_corpus(n_clusters)
    n_docs = len(rows)
    docs = (spark.createDataFrame(rows, ["doc_id", "text"])
            .repartition(32, "doc_id").cache())
    docs.count()

    base_idx = tempfile.mkdtemp(prefix="rc_idx_")
    t0 = time.time()
    dedup.dedup_index_build(docs, base_idx, threshold=THRESHOLD)
    t_build = time.time() - t0
    n_keepers = (dedup.dedup_index_read(spark, base_idx, "keepers")
                 .filter("doc_id = keeper_doc_id").count())

    walls = {}
    for w in (w1, w2):
        idx = tempfile.mkdtemp(prefix=f"rc_idx_w{w}_")
        shutil.rmtree(idx)
        shutil.copytree(base_idx, idx)
        win = docs.filter(f"doc_id >= {n_docs - w}")
        t0 = time.time()
        dedup.dedup_index_reconcile(win, idx, threshold=THRESHOLD)
        walls[w] = round(time.time() - t0, 1)

    t0 = time.time()
    dedup.near_dedup(docs, threshold=THRESHOLD).count()
    t_full = time.time() - t0

    print(json.dumps({
        "n_docs": n_docs, "n_keepers": n_keepers,
        "threshold": THRESHOLD,
        "wall_build_s": round(t_build, 1),
        f"wall_reconcile_w{w1}_s": walls[w1],
        f"wall_reconcile_w{w2}_s": walls[w2],
        "wall_full_near_dedup_s": round(t_full, 1),
        "reconcile_vs_full_small_window": round(walls[w1] / t_full, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

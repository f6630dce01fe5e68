"""Measure the FROZEN-KEEPER recall trade of the incremental dedup
index (operators/dedup.py dedup_index_append docstring documents it
qualitatively: "near-dups of a non-keeper cluster MEMBER that do not
also match the keeper are missed").  This tool gives the trade a
MAGNITUDE on a corpus with planted drift.

Construction (deterministic, no RNG): 40-token docs, 3-gram shingles
(38 per doc), threshold 0.6.  Each planted cluster is a CHAIN:

  batch 1:  K  (keeper, lowest doc_id)
            M  = K with 2 tokens mutated      -> J(K,M)  = 32/44 = 0.727
  batch 2:  KD = K with 2 OTHER tokens mutated -> J(K,KD) = 0.727
            D  = M with 2 OTHER tokens mutated -> J(M,D)  = 0.727
                                                  J(K,D)  = 26/50 = 0.52 < 0.6

so KD links through the keeper on both paths (control: agreement should
be ~LSH recall on both), while D's ONLY above-threshold match is the
non-keeper M — a full recompute links it, the frozen-keeper index
cannot (M's signatures are not in the index).  Background singletons
dilute the corpus.  All similarities sit at 0.727, where the 8x4 LSH
banding's candidate probability is 1-(1-0.727^4)^8 = 0.93, so LSH
recall affects both paths equally and the measured GAP isolates the
frozen-keeper trade.

The tool also runs ``dedup_index_reconcile`` over the same index with
the full corpus as the window — the drift MITIGATION: with the window
covering the forgotten members, drift recall must return to the full
figure while the keeper-dup control stays put (full-window reconcile is
provably ≡ near_dedup of the corpus; the gap it closes at O(window)
cost on a rolling schedule is measured by measure_reconcile_cost.py).

Usage: python tools/measure_incremental_recall.py [n_clusters] [n_background]
Prints one JSON line; the committed figure lives in BENCH.md.
"""
from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

N_TOK = 40
THRESHOLD = 0.6


def _mutate(toks: list[str], positions: tuple[int, ...],
            salt: str) -> list[str]:
    out = list(toks)
    for p in positions:
        out[p] = f"mut{salt}p{p}"
    return out


def build_corpus(n_clusters: int, n_background: int):
    """Returns (rows, drift_ids, keeperdup_ids, cluster_of) — doc_id
    spaces: cluster c occupies [c*10, c*10+3]; background starts after."""
    rows, drift, keeperdup, cluster_of = [], set(), set(), {}
    for c in range(n_clusters):
        base = [f"c{c}t{i}" for i in range(N_TOK)]
        k_id, m_id, kd_id, d_id = c * 10, c * 10 + 1, c * 10 + 2, c * 10 + 3
        m = _mutate(base, (5, 20), "a")
        kd = _mutate(base, (15, 35), "b")
        d = _mutate(m, (10, 30), "c")
        rows += [(k_id, " ".join(base), 1), (m_id, " ".join(m), 1),
                 (kd_id, " ".join(kd), 2), (d_id, " ".join(d), 2)]
        keeperdup.add(kd_id)
        drift.add(d_id)
        for i in (k_id, m_id, kd_id, d_id):
            cluster_of[i] = k_id
    start = n_clusters * 10
    for b in range(n_background):
        rows.append((start + b,
                     " ".join(f"bg{b}u{i}" for i in range(N_TOK)),
                     1 + (b % 2)))
    return rows, drift, keeperdup, cluster_of


def main() -> None:
    from legal_ner_spark.session import get_spark
    from legal_ner_spark.operators import dedup

    n_clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_background = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    rows, drift, keeperdup, cluster_of = build_corpus(n_clusters,
                                                      n_background)
    docs = spark.createDataFrame(rows, ["doc_id", "text", "batch"]) \
        .repartition(32, "doc_id").cache()
    n_docs = docs.count()

    # incremental: frozen-keeper index on batch 1, append batch 2
    path = tempfile.mkdtemp(prefix="recall_idx_")
    t0 = time.time()
    dedup.dedup_index_build(docs.filter("batch = 1"), path,
                            threshold=THRESHOLD)
    dedup.dedup_index_append(docs.filter("batch = 2"), path,
                             threshold=THRESHOLD)
    t_inc = time.time() - t0
    inc = {r.doc_id: r.keeper_doc_id
           for r in dedup.dedup_index_read(spark, path,
                                           "keepers").collect()}

    # reconcile the SAME index with the full corpus as the window (the
    # r5 drift mitigation: near-dedup re-runs over window ∪ keeper
    # surface, every stored assignment rebased under the manifest flip)
    t0 = time.time()
    dedup.dedup_index_reconcile(docs, path, threshold=THRESHOLD)
    t_rec = time.time() - t0
    rec = {r.doc_id: r.keeper_doc_id
           for r in dedup.dedup_index_read(spark, path,
                                           "keepers").collect()}

    # full recompute over the whole corpus
    t0 = time.time()
    full = {r.doc_id: r.keeper_doc_id
            for r in dedup.near_dedup(docs, threshold=THRESHOLD).collect()}
    t_full = time.time() - t0

    def linked(assign, ids):
        """planted doc counted as linked iff it joined its true cluster
        (keeper = the chain's K, which is the min doc_id both paths
        pick)"""
        return sum(1 for i in ids if assign[i] == cluster_of[i])

    batch2 = sorted(keeperdup | drift)
    agree = sum(1 for i in batch2 if inc[i] == full[i])
    out = {
        "n_docs": n_docs, "n_clusters": n_clusters,
        "threshold": THRESHOLD,
        "drift_linked_full": linked(full, drift),
        "drift_linked_incremental": linked(inc, drift),
        "drift_recall_full": round(linked(full, drift) / len(drift), 4),
        "drift_recall_incremental": round(linked(inc, drift) / len(drift),
                                          4),
        "drift_recall_reconciled": round(linked(rec, drift) / len(drift),
                                         4),
        "keeperdup_recall_full": round(
            linked(full, keeperdup) / len(keeperdup), 4),
        "keeperdup_recall_incremental": round(
            linked(inc, keeperdup) / len(keeperdup), 4),
        "keeperdup_recall_reconciled": round(
            linked(rec, keeperdup) / len(keeperdup), 4),
        "batch2_agreement": round(agree / len(batch2), 4),
        "reconciled_full_agreement": round(
            sum(1 for i in rec if rec[i] == full[i]) / len(rec), 4),
        "wall_incremental_s": round(t_inc, 1),
        "wall_reconcile_s": round(t_rec, 1),
        "wall_full_s": round(t_full, 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

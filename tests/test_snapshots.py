"""Snapshot history, time travel, and retention for the manifest-flip
index lifecycles — the commit-vs-file-expiry split table formats make
(Iceberg snapshot log + ``expire_snapshots``), applied to the dedup and
semantic indexes' shared snapshot writer.

What is pinned here:
- every vacuuming publish retains the newest ``keep_snapshots`` entries,
  and a retained non-current snapshot stays READABLE through
  ``index_read_at`` after later publishes — the reader-protection half
  of retention (a plan pinned to an old snapshot survives the flip);
- snapshot semantics are AS-SUPERSEDED: appends write into the current
  snapshot's directories, so a retained snapshot reads as the state the
  superseding publish consumed.  For compaction that equals the new
  snapshot (a repack); for RECONCILE it is the pre-rebase index — the
  audit trail the keeper remap wants;
- ``expire_index_snapshots`` deletes files ONLY after the manifest
  rewrite commits, never drops the current snapshot, and a read of an
  expired snapshot fails loudly (not with a half-missing-directory scan);
- the default ``keep_snapshots=1`` is exactly the r4 vacuum behavior,
  so every pre-existing compaction/reconcile test doubles as a
  regression gate for this feature.
"""
import os

import pytest
from pyspark.sql import functions as F

from legal_ner_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _keepers_via(spark, path, snapshot_id=None):
    df = (dedup.index_read_at(spark, path, "keepers", snapshot_id)
          if snapshot_id is not None
          else dedup.dedup_index_read(spark, path, "keepers"))
    return {r.doc_id: r.keeper_doc_id for r in df.collect()}


def test_dedup_index_time_travel_and_expiry(spark, tmp_path):
    w = [f"w{i}" for i in range(40)]
    path = str(tmp_path / "idx")
    dedup.dedup_index_build(
        _docs(spark, [(0, " ".join(w[0:30])), (1, " ".join(w[2:32]))]),
        path, threshold=0.5)
    assert dedup.index_snapshot_history(path) == []  # flat layout: no log

    m1 = dedup.dedup_index_compact(spark, path, keep_snapshots=2)
    state1 = _keepers_via(spark, path)
    assert state1 == {0: 0, 1: 0}

    dedup.dedup_index_append(
        _docs(spark, [(7, " ".join(f"z{i}" for i in range(30)))]),
        path, threshold=0.5)
    m2 = dedup.dedup_index_compact(spark, path, keep_snapshots=2)
    assert m2["snapshot"] != m1["snapshot"]

    hist = dedup.index_snapshot_history(path)
    assert [e["snapshot"] for e in hist] == [m1["snapshot"], m2["snapshot"]]
    # reader protection: the superseded snapshot's directories survive
    # the flip, so a plan pinned to m1 still scans.  Its content is the
    # AS-SUPERSEDED state (the append landed in m1's dirs while m1 was
    # current), which the repack carried forward unchanged.
    assert state1 == {0: 0, 1: 0}
    assert _keepers_via(spark, path, m1["snapshot"]) == {0: 0, 1: 0, 7: 7}
    assert _keepers_via(spark, path) == {0: 0, 1: 0, 7: 7}
    assert os.path.isdir(os.path.join(path, f"snap={m1['snapshot']}"))

    # expiry: manifest rewrite first, then file deletion; current kept
    m = dedup.expire_index_snapshots(path, keep_last=1)
    assert m["snapshot"] == m2["snapshot"]
    assert [e["snapshot"] for e in dedup.index_snapshot_history(path)] \
        == [m2["snapshot"]]
    assert not os.path.isdir(os.path.join(path, f"snap={m1['snapshot']}"))
    with pytest.raises(ValueError, match="not retained"):
        dedup.index_read_at(spark, path, "keepers", m1["snapshot"])
    assert _keepers_via(spark, path) == {0: 0, 1: 0, 7: 7}
    # current snapshot still appendable after expiry
    dedup.dedup_index_append(
        _docs(spark, [(9, " ".join(f"y{i}" for i in range(30)))]),
        path, threshold=0.5)
    assert _keepers_via(spark, path) == {0: 0, 1: 0, 7: 7, 9: 9}


def test_default_vacuum_keeps_current_only(spark, tmp_path):
    """keep_snapshots=1 (the default) is the r4 behavior: one retained
    snapshot, previous snap dir removed at publish."""
    path = str(tmp_path / "idx")
    dedup.dedup_index_build(
        _docs(spark, [(0, "a b c d e f g h i j")]), path, threshold=0.5)
    m1 = dedup.dedup_index_compact(spark, path)
    m2 = dedup.dedup_index_compact(spark, path)
    assert [e["snapshot"] for e in dedup.index_snapshot_history(path)] \
        == [m2["snapshot"]]
    assert not os.path.isdir(os.path.join(path, f"snap={m1['snapshot']}"))
    # fresh-id guard still applies through the retention path
    with pytest.raises(ValueError, match="fresh"):
        dedup.dedup_index_compact(spark, path, snapshot_id=m2["snapshot"])


def test_reconcile_participates_in_snapshot_log(spark, tmp_path):
    """A reconcile publish is a snapshot like any other: with
    keep_snapshots=2 the pre-reconcile index stays time-travel-readable
    — the audit trail a rebase wants (what did the index say BEFORE the
    keeper remap?)."""
    w = [f"w{i}" for i in range(40)]
    path = str(tmp_path / "idx")
    dedup.dedup_index_build(
        _docs(spark, [(0, " ".join(w[0:30])), (1, " ".join(w[2:32]))]),
        path, threshold=0.5)
    m1 = dedup.dedup_index_compact(spark, path, keep_snapshots=2)
    before = _keepers_via(spark, path)
    window = _docs(spark, [(0, " ".join(w[0:30])),
                           (1, " ".join(w[2:32])),
                           (5, " ".join(w[1:31]))])
    m2 = dedup.dedup_index_reconcile(window, path, threshold=0.5,
                                     keep_snapshots=2)
    assert [e["snapshot"] for e in dedup.index_snapshot_history(path)] \
        == [m1["snapshot"], m2["snapshot"]]
    assert _keepers_via(spark, path, m1["snapshot"]) == before
    assert _keepers_via(spark, path) == {0: 0, 1: 0, 5: 0}


def test_semantic_index_shares_the_snapshot_log(spark, tmp_path):
    """The semantic lifecycle rides the same writer: history + time
    travel + expiry behave identically at its path (same manifest
    name, its own tables)."""
    from legal_ner_spark.operators.dedup import (
        semantic_index_build, semantic_index_compact, semantic_index_read)
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.999, 0.01]), (2, [0.0, 1.0])],
        ["vec_id", "embedding"])
    path = str(tmp_path / "sem")
    semantic_index_build(emb, path, n_clusters=1, threshold=0.95)
    m1 = semantic_index_compact(spark, path, keep_snapshots=2)
    state1 = {r.vec_id: r.keeper_vec_id
              for r in semantic_index_read(spark, path,
                                           "keepers").collect()}
    assert state1 == {0: 0, 1: 0, 2: 2}
    m2 = semantic_index_compact(spark, path, keep_snapshots=2)
    got = {r.vec_id: r.keeper_vec_id
           for r in dedup.index_read_at(spark, path, "keepers",
                                        m1["snapshot"]).collect()}
    assert got == state1
    dedup.expire_index_snapshots(path, keep_last=1)
    with pytest.raises(ValueError, match="not retained"):
        dedup.index_read_at(spark, path, "keepers", m1["snapshot"])
    assert m2["snapshot"] == dedup.index_snapshot_history(path)[-1]["snapshot"]


def test_text_index_snapshot_log(spark, tmp_path):
    """The BM25 lifecycle's snapshot log: history survives appends, a
    retained snapshot serves queries after the next compact (including
    segments appended while it was current — as-superseded), expiry
    removes its directories and a time-travel read of it fails loudly."""
    from legal_ner_spark.operators import search
    docs = _docs(spark, [(i, f"alpha beta w{i} w{i} gamma")
                         for i in range(8)])
    path = str(tmp_path / "bm25")
    search.build_text_index(docs.filter("doc_id < 4"), path, n_buckets=4)
    assert search.text_index_history(path) == []  # build-once: untracked

    m1 = search.compact_text_index(spark, path, keep_snapshots=2)
    search.append_text_index(docs.filter("doc_id >= 4"), path)
    assert [e["snapshot"] for e in search.text_index_history(path)] \
        == [m1["snapshot"]]  # append preserved the log
    m2 = search.compact_text_index(spark, path, keep_snapshots=2)

    hist = search.text_index_history(path)
    assert [e["snapshot"] for e in hist] == [m1["snapshot"], m2["snapshot"]]
    # m1's retained entry carries the appended segment (as-superseded):
    # serving from it equals serving from the current snapshot
    want = [(r.doc_id, r.bm25) for r in search.query_text_index(
        spark, path, ["alpha", "w5"], k=3).collect()]
    got = [(r.doc_id, r.bm25) for r in search.query_text_index(
        spark, path, ["alpha", "w5"], k=3,
        snapshot_id=m1["snapshot"]).collect()]
    assert got == want and any(d >= 4 for d, _ in got)

    search.expire_text_index_snapshots(path, keep_last=1)
    assert not os.path.isdir(os.path.join(path, f"snap={m1['snapshot']}"))
    with pytest.raises(ValueError, match="not retained"):
        search.query_text_index(spark, path, ["alpha"], k=1,
                                snapshot_id=m1["snapshot"]).collect()
    still = [(r.doc_id, r.bm25) for r in search.query_text_index(
        spark, path, ["alpha", "w5"], k=3).collect()]
    assert still == want


def test_ivf_index_snapshot_log(spark, tmp_path):
    """The IVF lifecycle's snapshot log: same contract as the BM25 one
    (shared helpers), with centroids riding inside each retained
    snapshot so a time-traveled query is fully self-contained."""
    import random
    from legal_ner_spark.operators import similarity
    rng = random.Random(3)
    emb = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(6)]) for i in range(40)],
        ["vec_id", "embedding"])
    qs = similarity.prepare_vectors(emb.filter("vec_id < 2"))
    cs = similarity.prepare_vectors(emb.filter("vec_id >= 2"))
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(cs.filter("vec_id < 25"), path,
                               n_centroids=2)
    assert similarity.ivf_index_history(path) == []

    m1 = similarity.compact_ivf_index(spark, path, keep_snapshots=2)
    similarity.append_ivf_index(cs.filter("vec_id >= 25"), path)
    m2 = similarity.compact_ivf_index(spark, path, keep_snapshots=2)
    assert [e["snapshot"] for e in similarity.ivf_index_history(path)] \
        == [m1["snapshot"], m2["snapshot"]]

    want = {(r.query_id, r.rnk): r.neighbor_id
            for r in similarity.query_ivf_index(spark, path, qs, k=3,
                                                n_probe=2).collect()}
    got = {(r.query_id, r.rnk): r.neighbor_id
           for r in similarity.query_ivf_index(
               spark, path, qs, k=3, n_probe=2,
               snapshot_id=m1["snapshot"]).collect()}
    assert got == want  # as-superseded: append rode into m1's entry

    similarity.expire_ivf_index_snapshots(path, keep_last=1)
    assert not os.path.isdir(os.path.join(path, f"snap={m1['snapshot']}"))
    with pytest.raises(ValueError, match="not retained"):
        similarity.query_ivf_index(spark, path, qs, k=1,
                                   snapshot_id=m1["snapshot"]).collect()
    assert {(r.query_id, r.rnk): r.neighbor_id
            for r in similarity.query_ivf_index(spark, path, qs, k=3,
                                                n_probe=2).collect()} == want


def test_expire_guards(spark, tmp_path):
    path = str(tmp_path / "idx")
    os.makedirs(path)
    with pytest.raises(ValueError, match="flat-layout"):
        dedup.expire_index_snapshots(path)
    dedup.dedup_index_build(
        _docs(spark, [(0, "a b c d e f g h i j")]), path, threshold=0.5)
    dedup.dedup_index_compact(spark, path)
    with pytest.raises(ValueError, match=">= 1"):
        dedup.expire_index_snapshots(path, keep_last=0)
    # keep_last larger than history: no-op, current intact
    m = dedup.expire_index_snapshots(path, keep_last=5)
    assert len(dedup.index_snapshot_history(path)) == 1
    assert m["snapshot"] == dedup.index_snapshot_history(path)[0]["snapshot"]

"""Incremental KG ingestion: append-only batch tables carried by
reference, degree stats folded batch-at-a-time ≡ full recompute, atomic
manifest flips, idempotent replay."""

import os

import pytest

from pyspark.sql import functions as F

from legal_ner_spark import pipeline
from legal_ner_spark.operators import extract as ops
from legal_ner_spark.plans import publish
from jobs.incremental_kg import (ingest_batch, read_triples,
                                 triple_degrees, fold_degrees)


@pytest.fixture()
def corpora(spark):
    full = pipeline.synthetic_corpus(spark, 24, partitions=4).cache()
    b1 = full.filter(F.col("doc_id") < "doc_00000012")
    b2 = full.filter(F.col("doc_id") >= "doc_00000012")
    yield full, b1, b2
    full.unpersist()


def _sorted_rows(df, cols=("subj", "pred", "obj", "doc_id")):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_two_batches_equal_full_recompute(spark, tmp_path, corpora):
    full, b1, b2 = corpora
    root = str(tmp_path / "kg")
    ingest_batch(spark, root, b1, "day1")
    ingest_batch(spark, root, b2, "day2")
    got = read_triples(spark, root)
    want = ops.triples(pipeline.extract_records(full))
    assert _sorted_rows(got) == _sorted_rows(want)
    # incremental degree fold == recompute over the whole corpus
    deg_inc = publish.read_published(spark, root, "kg_degrees")
    deg_full = triple_degrees(want)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(deg_inc) == key(deg_full)


def test_previous_batches_carried_by_reference(spark, tmp_path, corpora):
    _, b1, b2 = corpora
    root = str(tmp_path / "kg")
    ingest_batch(spark, root, b1, "day1")
    b1_dir = publish.current_manifest(root)["tables"]["triples_b00000"]
    before = {f: os.path.getmtime(os.path.join(b1_dir, f))
              for f in os.listdir(b1_dir)}
    man2 = ingest_batch(spark, root, b2, "day2")
    after = {f: os.path.getmtime(os.path.join(b1_dir, f))
             for f in os.listdir(b1_dir)}
    assert before == after                       # not rewritten
    assert man2["tables"]["triples_b00000"] == b1_dir   # re-pointed
    assert "snap=day2" in man2["tables"]["triples_b00001"]
    # the day-1 batch dir is the day-1 snapshot dir, still reachable
    assert "snap=day1" in b1_dir
    # vacuum must keep the carried day-1 snapshot of the batch table
    removed = publish.vacuum(root)
    assert "triples_b00000" not in removed
    assert os.path.isdir(b1_dir)


def test_replay_same_snapshot_is_idempotent(spark, tmp_path, corpora):
    _, b1, b2 = corpora
    root = str(tmp_path / "kg")
    ingest_batch(spark, root, b1, "day1")
    ingest_batch(spark, root, b2, "day2")
    tri_before = _sorted_rows(read_triples(spark, root))
    deg_before = sorted(map(tuple, publish.read_published(
        spark, root, "kg_degrees").collect()))
    man = ingest_batch(spark, root, b2, "day2")      # replay
    assert sorted(t for t in man["tables"]
                  if t.startswith("triples_b")) == \
        ["triples_b00000", "triples_b00001"]         # no third table
    assert _sorted_rows(read_triples(spark, root)) == tri_before
    assert sorted(map(tuple, publish.read_published(
        spark, root, "kg_degrees").collect())) == deg_before


def test_fold_degrees_is_semigroup(spark):
    a = spark.createDataFrame([("x", 2, 1), ("y", 0, 3)],
                              "node string, out_degree bigint,"
                              " in_degree bigint")
    b = spark.createDataFrame([("y", 5, 1), ("z", 1, 0)],
                              "node string, out_degree bigint,"
                              " in_degree bigint")
    got = {r.node: (r.out_degree, r.in_degree)
           for r in fold_degrees(a, b).collect()}
    assert got == {"x": (2, 1), "y": (5, 4), "z": (1, 0)}


def test_compaction_preserves_reader_view(spark, tmp_path, corpora):
    """Compacting N batch tables into one must not change any answer:
    identical triple set, identical degrees (carried by reference —
    same path), one batch table afterwards, and a following ingest
    numbers itself after the compacted table."""
    from jobs.incremental_kg import compact
    full, b1, b2 = corpora
    root = str(tmp_path / "kg")
    ingest_batch(spark, root, b1, "day1")
    ingest_batch(spark, root, b2, "day2")
    before_tri = _sorted_rows(read_triples(spark, root))
    deg_path_before = publish.current_manifest(root)["tables"]["kg_degrees"]
    man = compact(spark, root, "day3-compact")
    batch_tables = [t for t in man["tables"] if t.startswith("triples_b")]
    assert batch_tables == ["triples_b00000"]
    assert "snap=day3-compact" in man["tables"]["triples_b00000"]
    assert man["tables"]["kg_degrees"] == deg_path_before   # by reference
    assert _sorted_rows(read_triples(spark, root)) == before_tri
    # vacuum drops the old per-batch snapshots but keeps the carried
    # degrees snapshot
    publish.vacuum(root)
    assert os.path.isdir(deg_path_before)
    assert _sorted_rows(read_triples(spark, root)) == before_tri
    # next ingest appends after the compacted table
    man2 = ingest_batch(spark, root, b1, "day4")
    assert sorted(t for t in man2["tables"]
                  if t.startswith("triples_b")) == \
        ["triples_b00000", "triples_b00001"]
    # self-overwrite guards: re-compacting under the CURRENT snapshot id
    # (write target could equal a read source) is rejected, as is any id
    # under which a carried batch dir was written
    import pytest
    with pytest.raises(ValueError, match="fresh id"):
        compact(spark, root, "day4")
    with pytest.raises(ValueError, match="batch dirs being read"):
        compact(spark, root, "day3-compact")  # b00000 lives at this snap
    # a genuinely fresh id still works and answers are unchanged
    compact(spark, root, "day5-compact")
    after = _sorted_rows(read_triples(spark, root))
    assert {tuple(r) for r in after} >= {tuple(r) for r in before_tri}


def test_stream_kg_ingest_matches_batch_and_restart_noop(spark, tmp_path,
                                                         corpora):
    """File-stream ingestion (one snapshot per micro-batch) produces the
    same reader view as batch extraction over the whole corpus; re-running
    the availableNow stream on the same checkpoint publishes nothing new."""
    from legal_ner_spark.streaming.stream import stream_kg_ingest
    full, b1, b2 = corpora
    in_dir = str(tmp_path / "arrivals")
    b1.coalesce(1).write.mode("append").parquet(in_dir)
    b2.coalesce(1).write.mode("append").parquet(in_dir)
    root = str(tmp_path / "kg")
    ckpt = str(tmp_path / "ckpt")
    q = stream_kg_ingest(spark, in_dir, root, ckpt)
    assert q.awaitTermination(180)
    got = _sorted_rows(read_triples(spark, root))
    want = _sorted_rows(ops.triples(pipeline.extract_records(full)))
    assert got == want
    man1 = publish.current_manifest(root)
    deg1 = sorted(map(tuple, publish.read_published(
        spark, root, "kg_degrees").collect()))
    # restart over the same checkpoint: nothing new arrives, no flip
    q2 = stream_kg_ingest(spark, in_dir, root, ckpt)
    assert q2.awaitTermination(120)
    assert publish.current_manifest(root) == man1
    assert sorted(map(tuple, publish.read_published(
        spark, root, "kg_degrees").collect())) == deg1

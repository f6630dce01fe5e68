"""Distributed-vs-single-doc equality, the span-sequence invariant, and
determinism across parallelism — SURVEY.md §5.2/§5.5 and the BASELINE.md
correctness gates."""

import pandas as pd
import pytest

from legal_ner_spark import pipeline, synth
from legal_ner_spark.core.extract import extract_document
from legal_ner_spark.operators import extract as ops

N_DOCS = 24


@pytest.fixture(scope="module")
def records(spark):
    corpus = pipeline.synthetic_corpus(spark, N_DOCS, partitions=6)
    recs = pipeline.extract_records(corpus).cache()
    recs.count()
    yield recs
    recs.unpersist()


def _golden_triples():
    golden = set()
    for i in range(N_DOCS):
        d = synth.gen_doc(i)
        r = extract_document(d["doc_id"], synth.assemble_text(d["spans"]))
        golden.update((d["doc_id"],) + t for t in r.triples)
    return golden


def test_triples_match_single_doc_oracle_exactly(records):
    """P/R vs the single-doc oracle must be 1.0 (gate is ≥0.95) — any
    distribution artifact (batching, Arrow, ordering) breaks this."""
    got = {(r.doc_id, r.subj, r.pred, r.obj)
           for r in ops.triples(records).collect()}
    golden = _golden_triples()
    assert got == golden


def test_span_sequence_invariant(records):
    """Output spans == input spans per doc: kind, text, media_ref, order
    (BASELINE.json input_hint)."""
    out = {r.doc_id: [ (s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
           for r in ops.doc_spans(records).collect()}
    for i in range(N_DOCS):
        d = synth.gen_doc(i)
        exp = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in d["spans"]]
        assert out[d["doc_id"]] == exp


def test_mentions_well_formed(records):
    m = ops.mentions(records).toPandas()
    assert (m.start_char < m.end_char).all()
    assert set(m.region.unique()) <= {"preamble", "judgment"}
    assert m.label.notna().all()


def test_determinism_across_parallelism(spark):
    """Same input ⇒ identical triples at different partition counts
    (catches order-sensitivity leaks from the greedy stages)."""
    t1 = {(r.doc_id, r.subj, r.pred, r.obj) for r in pipeline.extract_triples(
        pipeline.synthetic_corpus(spark, 12, partitions=1)).collect()}
    t8 = {(r.doc_id, r.subj, r.pred, r.obj) for r in pipeline.extract_triples(
        pipeline.synthetic_corpus(spark, 12, partitions=8)).collect()}
    assert t1 == t8


def test_reference_aggregations(records):
    provisions = ops.unique_provision_counts(records).toPandas()
    assert (provisions.freq >= 1).all()
    assert provisions.provision_of_statute.str.contains(" of ").all()
    csv = ops.csv_export(records).toPandas()
    assert set(csv.columns) == {"file_name", "entity", "label",
                                "normalised_entities"}
    assert len(csv) > 0


def test_postprocess_ok_flag_present(records):
    docs = ops.doc_spans(records).toPandas()
    assert docs.postprocess_ok.notna().all()


def test_jvm_text_assembly_matches_python(spark):
    """TEXT_ASSEMBLY_EXPR (Catalyst) must equal synth.assemble_text for
    interleaved text+media docs."""
    from pyspark.sql import functions as F
    from legal_ner_spark import synth
    from legal_ner_spark.operators.extract import TEXT_ASSEMBLY_EXPR
    corpus = pipeline.synthetic_corpus(spark, 32, partitions=4)
    got = {r.doc_id: r.text for r in corpus.select(
        "doc_id", F.expr(TEXT_ASSEMBLY_EXPR).alias("text")).collect()}
    for i in range(32):
        d = synth.gen_doc(i)
        assert got[d["doc_id"]] == synth.assemble_text(d["spans"])


def test_no_passthrough_profile_matches_default(spark):
    """carry_spans=False must produce the identical records minus the
    spans column (null on doc rows)."""
    from pyspark.sql import functions as F
    corpus = pipeline.synthetic_corpus(spark, 24, partitions=4)
    cols = [c for c in ops.RECORD_COLUMNS if c != "spans"]
    a = ops.extract_records(corpus, carry_spans=True).select(*cols)
    b = ops.extract_records(corpus, carry_spans=False).select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    nospans = ops.extract_records(corpus, carry_spans=False)
    assert nospans.filter("rec_type = 'doc' AND spans IS NOT NULL").count() == 0

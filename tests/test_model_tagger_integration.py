"""Real-model integration test for the production spaCy tagger path
(core/model_tagger.py) — VERDICT r3 ask #5.

AUTO-SKIPS when spaCy (or a loadable pipeline) is absent, which is the
case in this sandbox; on a deployment, run

    python -m pytest tests/test_model_tagger_integration.py -q

FIRST (README "Environment caveats") — it drives one judgment plus a
mega-doc through the real model END-TO-END THROUGH THE FUSED STAGE
(operators/extract.extract_records(tagger=...)), exercising the
20k-token chunk guard with a document long enough to need several
chunks, so a deployer gets a one-command check that the swap point
actually works with their installed model before committing a cluster
run.
"""

from __future__ import annotations

import pytest

spacy = pytest.importorskip("spacy")

from legal_ner_spark.core.model_tagger import (TaggerConfig, chunk_bounds,
                                               load_spacy_tagger)
from legal_ner_spark.operators import extract as ops
from legal_ner_spark.schema import CORPUS_SCHEMA

_PIPELINES = ("en_legal_ner_trf", "en_core_web_trf", "en_core_web_md",
              "en_core_web_sm")


def _any_pipeline():
    for name in _PIPELINES:
        try:
            nlp = spacy.load(name)
        except Exception:
            continue
        labels = tuple(nlp.pipe_labels.get("ner", ()))
        if labels:
            return name, labels
    return None, ()


_NAME, _LABELS = _any_pipeline()

pytestmark = pytest.mark.skipif(
    _NAME is None,
    reason="spaCy importable but no NER pipeline installed "
           f"(tried {_PIPELINES})")


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(doc_id, [{"kind": "text", "text": text, "media_ref": None,
                    "offset": 0}]) for doc_id, text in rows],
        CORPUS_SCHEMA)


def test_real_model_through_fused_stage(spark):
    """One judgment through extract_records with the REAL model swapped
    in: the stage must run (model loads inside the Arrow worker), emit a
    doc record, and emit mentions whose labels come from the model."""
    cfg = TaggerConfig(model_path=_NAME, labels=_LABELS)
    tagger = load_spacy_tagger(cfg)
    text = ("In the High Court of Delhi, the petition filed by "
            "Rajesh Kumar against the State of Delhi was heard on "
            "12 January 2015. The Supreme Court of India judgment in "
            "Kesavananda Bharati vs State of Kerala was cited.")
    recs = ops.extract_records(_corpus(spark, [("d1", text)]),
                               tagger=tagger).cache()
    assert recs.filter("rec_type = 'doc' AND ok").count() == 1
    ments = recs.filter("rec_type = 'mention'").collect()
    assert ments, "real model produced no mentions on an entity-rich text"
    assert {m.label for m in ments} <= set(_LABELS)


def test_mega_doc_chunk_guard_with_real_model(spark):
    """A document far longer than one chunk window must yield mentions
    PAST the first window's end — truncation instead of chunking would
    silently drop every entity after the limit.  A small
    max_tokens_per_chunk keeps the real-model runtime test-sized; the
    guard logic (chunk_bounds) is identical at the production 20k."""
    cfg = TaggerConfig(model_path=_NAME, labels=_LABELS,
                       max_tokens_per_chunk=100)      # 800-char windows
    tagger = load_spacy_tagger(cfg)
    filler = "the appeal was admitted and the record was examined . "
    head = "In the High Court of Bombay , Anil Sharma filed a petition . "
    tail = ("The final order was pronounced by the Supreme Court of "
            "India in favour of Sunita Devi on 3 March 2019 .")
    text = head + filler * 120 + tail                 # ~6.8k chars, >8 windows
    window = cfg.max_tokens_per_chunk * 8
    assert len(chunk_bounds(text, window)) > 3
    recs = ops.extract_records(_corpus(spark, [("mega", text)]),
                               tagger=tagger).cache()
    ments = recs.filter("rec_type = 'mention'").collect()
    # at least one mention must start beyond the first chunk window
    assert any(m.start_char and m.start_char > window for m in ments), \
        [(m.text, m.start_char) for m in ments]


def test_chunk_bounds_cover_whole_text_no_model():
    """Pure chunk-guard property re-checked in the deployment
    environment: windows tile the text completely and split at
    whitespace when possible."""
    text = "word " * 5000
    bounds = chunk_bounds(text.strip(), 1000)
    assert bounds[0][0] == 0 and bounds[-1][1] == len(text.strip())
    for (s1, e1), (s2, e2) in zip(bounds, bounds[1:]):
        assert e1 == s2 and s1 < e1
        assert e1 - s1 <= 1000

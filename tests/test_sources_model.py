"""Sources abstraction, pluggable tagger contract, and the model-tagger
guard path."""

import pytest

from legal_ner_spark import pipeline
from legal_ner_spark.sources import corpus as src
from legal_ner_spark.operators import extract as ops
from legal_ner_spark.core.extract import extract_document
from legal_ner_spark.core.model_tagger import TaggerConfig, load_spacy_tagger
from legal_ner_spark import synth


def test_corpus_roundtrip_parquet(spark, tmp_path):
    c = pipeline.synthetic_corpus(spark, 8, partitions=2)
    loc = str(tmp_path / "corpus")
    src.write_corpus(c, loc)
    back = src.read_corpus(spark, loc)
    # parquet roundtrips relax nullability — names/types are the contract
    assert [(f.name, f.dataType) for f in back.schema.fields] == \
        [(f.name, f.dataType) for f in c.schema.fields]
    assert back.count() == 8


def test_records_and_triples_layout(spark, tmp_path):
    c = pipeline.synthetic_corpus(spark, 8, partitions=2)
    recs = pipeline.extract_records(c)
    src.write_records(recs, str(tmp_path / "records"))
    src.write_triples(ops.triples(recs), str(tmp_path / "triples"))
    r = spark.read.parquet(str(tmp_path / "records"))
    t = spark.read.parquet(str(tmp_path / "triples"))
    # partition-pruned projections
    assert r.filter("rec_type = 'triple'").count() == t.count()
    assert set(x.pred for x in t.select("pred").distinct().collect()) >= {
        "part_of", "decided_by"}


def test_custom_tagger_is_pluggable():
    """The tagger param is the model swap point: a custom tagger's spans
    flow through the identical lifecycle."""
    def fake_tagger(text, region):
        out = []
        i = text.find("Section 42")
        if i >= 0:
            out.append((i, i + len("Section 42"), "PROVISION"))
        j = text.find("Indian Penal Code")
        if j >= 0:
            out.append((j, j + len("Indian Penal Code"), "STATUTE"))
        return out

    r = extract_document(
        "d", "Charged under Section 42 of the Indian Penal Code today.",
        tagger=fake_tagger)
    assert ("Section 42", "part_of", "Indian Penal Code") in r.triples


def test_model_tagger_guard_without_spacy():
    tag = load_spacy_tagger(TaggerConfig())
    with pytest.raises(NotImplementedError, match="deterministic tagger"):
        tag("some text", "judgment")


def test_chunk_bounds_cover_text_and_split_at_whitespace():
    """Mega-doc chunking (data_preparation.py:73-78 guard): bounds must
    tile the WHOLE text with no gaps/overlap, each window ≤ limit, splits
    at whitespace when one exists inside the window."""
    from legal_ner_spark.core.model_tagger import chunk_bounds
    text = " ".join(f"tok{i}" for i in range(200))
    bounds = chunk_bounds(text, 97)
    assert bounds[0][0] == 0 and bounds[-1][1] == len(text)
    for (a, b), (c, _) in zip(bounds, bounds[1:]):
        assert b == c                      # contiguous
    for a, b in bounds:
        assert b - a <= 97
        if b < len(text):
            assert text[b] == " " or " " not in text[a:b]
    # pathological: a single token longer than the limit must still advance
    assert chunk_bounds("x" * 50, 10) == [(i, i + 10) for i in range(0, 50, 10)]


def test_chunked_tagging_matches_full_text_via_deterministic_tagger():
    """The chunked tag loop (model_tagger.load_spacy_tagger's shape) with
    the deterministic tagger must equal full-text tagging when chunks are
    large enough that no entity straddles a boundary — the swap contract
    between the sandbox tagger and the production spaCy path."""
    from legal_ner_spark.core.model_tagger import chunk_bounds
    from legal_ner_spark.core.tagger import tag_region
    from legal_ner_spark import synth
    for i in range(6):
        d = synth.gen_doc(i)
        text = synth.assemble_text(d["spans"])
        full = set(tag_region(text, "judgment"))
        # one chunk ≥ the text → byte-identical to full-text tagging
        one = {(s + a, e + a, l)
               for a, b in chunk_bounds(text, len(text) + 1)
               for (s, e, l) in tag_region(text[a:b], "judgment")}
        assert one == full
        # small chunks: boundary-straddling entities may be lost or
        # re-tagged from their fragments (same trade as the reference's
        # sent mode, README.md:159-165) — assert high agreement, not
        # equality
        chunked = set()
        for a, b in chunk_bounds(text, max(200, len(text) // 3)):
            for (s, e, label) in tag_region(text[a:b], "judgment"):
                chunked.add((s + a, e + a, label))
        agree = len(full & chunked) / max(1, len(full | chunked))
        assert agree >= 0.8, (i, agree, full ^ chunked)

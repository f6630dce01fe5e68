"""Production tagger: the spaCy transformer (`en_legal_ner_trf`,
legal_ner.py:57) hosted inside the same mapInPandas stage as the
deterministic sandbox tagger — this module is the swap point.

Deployment pattern (north_rule: 'spark-submit --py-files with broadcast
model weights'):

* model *files* ship via ``spark-submit --archives model.tar.gz#model`` (or
  an Iceberg/S3 artifact path) — NOT via sc.broadcast: transformer weights
  are hundreds of MB and the torch module graph doesn't pickle cleanly;
  the archive mechanism is Spark's supported channel for large read-only
  artifacts.  Small config (label maps, thresholds) goes through
  ``sc.broadcast`` — see ``TaggerConfig`` below.
* each executor Python worker loads the model ONCE, lazily, in a
  module-level singleton (`_get_model`), then serves every Arrow batch of
  every task the worker runs (spark.python.worker.reuse keeps workers
  alive across tasks).
* inference batches sentences across documents (`nlp.pipe`, mirroring
  data_preparation.py:259) — Arrow batch size (session.py
  arrow.maxRecordsPerBatch) is the outer batching knob.

spaCy is not installed in this sandbox, so ``load_spacy_tagger`` raises
with a clear message unless the model is available; everything above it is
real, tested plumbing (the deterministic tagger runs through the identical
``tag_region`` contract).
"""

from __future__ import annotations

from dataclasses import dataclass

_MODEL = None
_MODEL_PATH = None


@dataclass
class TaggerConfig:
    """Small, broadcastable tagger configuration."""
    model_path: str = "en_legal_ner_trf"
    labels: tuple = ("COURT", "PETITIONER", "RESPONDENT", "JUDGE", "LAWYER",
                     "DATE", "ORG", "GPE", "STATUTE", "PROVISION",
                     "PRECEDENT", "CASE_NUMBER", "WITNESS", "OTHER_PERSON")
    batch_size: int = 256          # training/config.cfg:14
    max_tokens_per_chunk: int = 20000  # data_preparation.py:73-78 guard


def _get_model(model_path: str):
    """Per-executor lazy singleton: the first task on a worker pays the
    load; every later Arrow batch reuses it."""
    global _MODEL, _MODEL_PATH
    if _MODEL is None or _MODEL_PATH != model_path:
        try:
            import spacy
        except ImportError as exc:
            raise NotImplementedError(
                "spaCy model tagging requires the en_legal_ner_trf artifact "
                "shipped via --archives; this sandbox uses the deterministic "
                "tagger (legal_ner_spark.core.tagger) instead.") from exc
        _MODEL = spacy.load(model_path)
        _MODEL_PATH = model_path
    return _MODEL


def load_spacy_tagger(config: TaggerConfig):
    """Return a ``tag_region(text, region) -> [(start, end, label)]``
    callable backed by the transformer — drop-in for
    core.tagger.tag_region inside operators/extract.py."""
    def tag_region(text: str, region: str):
        nlp = _get_model(config.model_path)
        spans = []
        for start, end in chunk_bounds(text, config.max_tokens_per_chunk * 8):
            doc = nlp(text[start:end])
            for ent in doc.ents:
                if ent.label_ in config.labels:
                    spans.append((ent.start_char + start,
                                  ent.end_char + start, ent.label_))
        return spans

    return tag_region


def chunk_bounds(text: str, limit: int) -> list[tuple[int, int]]:
    """Mega-doc chunking (data_preparation.py:73-78): cover the WHOLE text
    in ≤limit-char windows split at whitespace (offsets rebase per chunk) —
    truncating instead would silently drop every entity past the limit and
    break the swap contract with the full-text deterministic tagger."""
    bounds = []
    start = 0
    while start < len(text):
        end = min(len(text), start + limit)
        if end < len(text):
            ws = text.rfind(" ", start, end)
            if ws > start:
                end = ws
        bounds.append((start, end))
        start = end
    return bounds

"""Deterministic rule-based NER tagger — the sandbox stand-in for the
reference's spaCy transformer model (``en_legal_ner_trf``, legal_ner.py:57).

Same contract as the model: text in → non-overlapping labeled spans out,
labels drawn from the 14 types at legal_ner.py:68-71, region-aware (the
reference runs separate inference over the title-cased preamble and the
cleaned judgment, legal_ner.py:23-34).  Closed-world: it recognizes exactly
the surface vocabulary in :mod:`vocab`, which is all the synthetic corpus
plants — so tagging is exact and correctness gates stay model-independent
(SURVEY.md §7.0).  Overlaps are resolved with the same filter_spans
semantics the model's output implicitly satisfies.

In production the ``tag_region`` symbol is swapped for a broadcast spaCy
pipeline inside the same mapInPandas stage; nothing else changes.
"""

from __future__ import annotations

import re

from . import vocab
from .docmodel import Span, Doc, filter_spans


def _alt(words):
    return "|".join(re.escape(w) for w in words)


_FIRST = _alt(vocab.FIRST_NAMES)
_LAST = _alt(vocab.LAST_NAMES)
_NAME_FULL = rf"(?:{_FIRST})\s+(?:{_LAST})"
_GPE = _alt(vocab.GPES)
_ORG = _alt(sorted(vocab.ORGS, key=len, reverse=True))
_COURT = _alt(sorted(vocab.COURTS, key=len, reverse=True))
_STATUTE = _alt(sorted(set(vocab.STATUTES) | {a for a, _ in vocab.ALIASED_ACTS},
                       key=len, reverse=True))
_MONTH = _alt(vocab.MONTHS)
_CASE_TYPE = _alt(vocab.CASE_TYPES)

# Precedent parties are open-world title-case sequences (the transformer
# model generalizes beyond any fixed vocabulary) but confined to a single
# line — separators are spaces, never newlines, so the preamble's standalone
# "Versus" line cannot be glued to the party lines around it.
_PARTY = r"[A-Z][a-z]+(?:[ ]+(?:[A-Z][a-z]+|of))*"
_CITATION = (r"(?:\(\d{4}\)[ ]+\d+[ ]+SCC[ ]+\d+"
             r"|AIR[ ]+\d{4}[ ]+SC[ ]+\d+"
             r"|\d{4}[ ]+AIR[ ]+\d+)")

RULES: list[tuple[str, re.Pattern]] = [
    # order = tie-break priority under filter_spans (first-seen wins on full
    # ties); longest-match-wins handles containment (names inside precedents,
    # GPEs inside courts, …).
    ("PRECEDENT", re.compile(
        rf"{_PARTY}[ ]+(?i:vs\.?|v\.?|v/s\.?|versus)[ ]+{_PARTY}"
        rf"(?:[ ]+{_CITATION})?")),
    ("COURT", re.compile(rf"(?i)\b(?:{_COURT})\b")),
    ("CASE_NUMBER", re.compile(
        rf"(?i)\b(?:{_CASE_TYPE})(?:\s+\(C\))?\s+No\.?\s+\d+\s+of\s+\d{{4}}\b")),
    # trailing (?!\w) instead of \b: surfaces ending in '.' (I.P.C.) have
    # no word boundary before a space, but a bare prefix match inside a
    # longer word ('...Penal Codes') must still be rejected
    ("STATUTE", re.compile(rf"(?i)\b(?:{_STATUTE})(?:,\s+\d{{4}})?(?!\w)")),
    ("PROVISION", re.compile(
        r"(?i)\b(?:Sections?|Articles?)\s+\d+[A-Z]?"
        r"(?:\s*\(\d+\))?"
        r"(?:\s*,\s*\d+[A-Z]?)*"
        r"(?:\s+(?:and|or|read\s+with)\s+\d+[A-Z]?)?")),
    ("DATE", re.compile(
        rf"\b(?:\d{{1,2}}\.\d{{1,2}}\.\d{{4}}"
        rf"|\d{{1,2}}(?:st|nd|rd|th)?\s+(?:{_MONTH})\s*,?\s+\d{{4}})\b")),
    ("ORG", re.compile(rf"\b(?:{_ORG})\b")),
    ("GPE", re.compile(rf"\b(?:{_GPE})\b")),
]

_PERSON_RE = re.compile(rf"\b(?:{_NAME_FULL}|{_FIRST})\b")
_STATE_OF_RE = re.compile(rf"(?i)State\s+of\s+(?:{_GPE})")

# Person-role context markers (the model learned these from preamble layout;
# the stand-in reads them off the surrounding text).
_PET_MARK = re.compile(r"^\s*\.{2,}\s*Petitioner", re.IGNORECASE)
_RES_MARK = re.compile(r"^\s*\.{2,}\s*Respondent", re.IGNORECASE)
_JUDGE_BEFORE = re.compile(r"Justice\s+$", re.IGNORECASE)
_LAWYER_AFTER = re.compile(r"^\s*,\s*(?:Senior\s+)?Advocate", re.IGNORECASE)
_WITNESS_AFTER = re.compile(r"^\s*\(PW-?\d+\)")


def _person_label(text: str, start: int, end: int, region: str) -> str:
    before = text[max(0, start - 40):start]
    after = text[end:end + 40]
    if _JUDGE_BEFORE.search(before):
        return "JUDGE"
    if _LAWYER_AFTER.search(after):
        return "LAWYER"
    if _WITNESS_AFTER.search(after):
        return "WITNESS"
    if region == "preamble":
        if _PET_MARK.search(after):
            return "PETITIONER"
        if _RES_MARK.search(after):
            return "RESPONDENT"
    return "OTHER_PERSON"


def tag_region(text: str, region: str) -> list[tuple[int, int, str]]:
    """Tag one region; returns (start_char, end_char, label) triples,
    non-overlapping, sorted by start."""
    doc = Doc(text)
    candidates: list[Span] = []
    for label, pattern in RULES:
        for m in pattern.finditer(text):
            sp = doc.char_span(m.start(), m.end(), label=label)
            if sp is not None:
                candidates.append(sp)
    for m in _PERSON_RE.finditer(text):
        label = _person_label(text, m.start(), m.end(), region)
        sp = doc.char_span(m.start(), m.end(), label=label)
        if sp is not None:
            candidates.append(sp)
    # "State of X" as a litigant (preamble party line) — tagged like the
    # model tags respondents; elsewhere the bare GPE rule covers it.
    if region == "preamble":
        for m in _STATE_OF_RE.finditer(text):
            after = text[m.end():m.end() + 40]
            if _RES_MARK.search(after):
                sp = doc.char_span(m.start(), m.end(), label="RESPONDENT")
                if sp is not None:
                    candidates.append(sp)
            elif _PET_MARK.search(after):
                sp = doc.char_span(m.start(), m.end(), label="PETITIONER")
                if sp is not None:
                    candidates.append(sp)
    kept = filter_spans(candidates)
    return [(s.start_char, s.end_char, s.label) for s in kept]

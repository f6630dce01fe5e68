"""Lightweight per-document text model (tokens, sentences, spans).

Stands in for the spaCy ``Doc``/``Span`` objects the reference mutates in
place (see /root/reference/legal_ner.py:23-39 and SURVEY.md §1.1).  The
reference relies on four spaCy behaviors that downstream postprocessing
depends on, all reimplemented here with exact-parity semantics:

* token indices (``span.start``/``span.end``) alongside char offsets —
  used by the supra join (postprocessing_utils.py:55), provision linking
  (:379) and nesting checks (:690);
* ``len(span)`` = token count — cluster-head selection (:165);
* ``spacy.util.filter_spans`` longest-span-wins / earlier-start /
  first-seen tie-breaking (:349, :747);
* ``doc.char_span(..., alignment_mode='expand')`` snapping of char ranges
  to covering tokens (:679, :810).

Only instantiated inside Arrow batch UDFs and unit tests — never on the
Spark driver hot path.
"""

from __future__ import annotations

import re
from bisect import bisect_left, bisect_right

# One token per word-ish run or single punctuation char.  Deterministic and
# whitespace-stable: retokenizing the concatenation of two texts joined on
# whitespace yields the union of their token sequences (needed because the
# reference concatenates preamble+judgment docs, legal_ner.py:39).
# NB: apostrophes are separate tokens ("Limaye's" → Limaye / ' / s), like
# spaCy's possessive suffix split — the supra join anchors on the person
# span ending exactly at the apostrophe (postprocessing_utils.py:40-44).
_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]")

# Sentence boundary: sentence-final punctuation followed by whitespace, or a
# blank line.  The reference's ingest inserts "\n\n" after .\"? precisely so
# spaCy breaks there (data_preparation.py:177-178); we make that rule the
# definition.
_SENT_BOUNDARY_RE = re.compile(r"(?<=[.?!])[\"']?\s+|\n{2,}")


class Span:
    """An entity/sentence span.

    Equality follows spaCy ``Span.__eq__`` closely enough for the reference's
    membership tests (value identity on char range + label); the hash ignores
    the label because the reference relabels spans *after* inserting them into
    dicts/sets (postprocessing_utils.py:192,241,324) and a label-dependent
    hash would corrupt those containers.
    """

    __slots__ = ("start", "end", "start_char", "end_char", "text", "label")

    def __init__(self, start: int, end: int, start_char: int, end_char: int,
                 text: str, label: str):
        self.start = start            # token index, inclusive
        self.end = end                # token index, exclusive
        self.start_char = start_char
        self.end_char = end_char
        self.text = text
        self.label = label

    def __len__(self) -> int:
        return self.end - self.start

    def __eq__(self, other) -> bool:
        if not isinstance(other, Span):
            return NotImplemented
        return (self.start_char == other.start_char
                and self.end_char == other.end_char
                and self.label == other.label)

    def __hash__(self) -> int:
        return hash((self.start_char, self.end_char))

    def __repr__(self) -> str:
        return f"Span({self.label}:{self.text!r}@{self.start_char})"


class Doc:
    """Tokenized document with sentence boundaries and entity spans."""

    __slots__ = ("text", "ents", "_tok_starts", "_tok_ends", "_tokens",
                 "_sents", "_hard_breaks")

    def __init__(self, text: str, hard_breaks: tuple[int, ...] = ()):
        """``hard_breaks`` are extra guaranteed sentence boundaries (char
        offsets) — used at the preamble/judgment junction, which spaCy's
        ``Doc.from_docs`` preserves implicitly (legal_ner.py:39).

        Only the sorted token-boundary arrays are built eagerly (they back
        the O(log n) ``char_span`` hot path).  The (start, end, text)
        token tuples and the sentence list are lazy: the tagger constructs
        a Doc per region purely for ``char_span`` alignment and never
        touches either."""
        self.text = text
        starts: list[int] = []
        ends: list[int] = []
        sa, ea = starts.append, ends.append
        for m in _TOKEN_RE.finditer(text):
            sa(m.start())
            ea(m.end())
        self._tok_starts = starts
        self._tok_ends = ends
        self._tokens: list[tuple[int, int, str]] | None = None
        self._sents: list[Span] | None = None
        self._hard_breaks = hard_breaks
        self.ents: list[Span] = []

    @property
    def tokens(self) -> list[tuple[int, int, str]]:
        if self._tokens is None:
            t = self.text
            self._tokens = [(s, e, t[s:e])
                            for s, e in zip(self._tok_starts, self._tok_ends)]
        return self._tokens

    @property
    def sents(self) -> list["Span"]:
        if self._sents is None:
            self._sents = self._split_sentences(self._hard_breaks)
        return self._sents

    # -- construction helpers -------------------------------------------------

    def _split_sentences(self, hard_breaks: tuple[int, ...] = ()) -> list[Span]:
        bounds = {0, len(self.text)}
        for m in _SENT_BOUNDARY_RE.finditer(self.text):
            if m.end() < len(self.text):
                bounds.add(m.end())
        bounds.update(b for b in hard_breaks if 0 < b < len(self.text))
        bounds = sorted(bounds)
        sents = []
        for s, e in zip(bounds, bounds[1:]):
            span = self.char_span(s, e, label="SENT", alignment_mode="expand")
            if span is not None:
                # sentence end_char must reflect the *trimmed* sentence text
                # (reference uses sent.end_char for the preamble cut,
                # data_preparation.py:97)
                sents.append(span)
        return sents

    # -- spaCy-parity APIs ----------------------------------------------------

    def char_span(self, start_char: int, end_char: int, label: str = "",
                  alignment_mode: str = "expand") -> Span | None:
        """Snap a char range to covering tokens (alignment_mode='expand'
        semantics of spaCy ``Doc.char_span``, used at
        postprocessing_utils.py:679 and :810).

        Binary search over the sorted token boundaries: a token i overlaps
        [start_char, end_char) iff end_i > start_char and start_i <
        end_char; with non-overlapping sorted tokens that is exactly the
        contiguous range [bisect_right(ends, start), bisect_left(starts,
        end))."""
        t0 = bisect_right(self._tok_ends, start_char)
        t1 = bisect_left(self._tok_starts, end_char)
        if t0 >= t1:
            return None
        sc = self._tok_starts[t0]
        ec = self._tok_ends[t1 - 1]
        return Span(t0, t1, sc, ec, self.text[sc:ec], label)

    def token_span(self, t0: int, t1: int, label: str) -> Span:
        sc = self._tok_starts[t0]
        ec = self._tok_ends[t1 - 1]
        return Span(t0, t1, sc, ec, self.text[sc:ec], label)

    def sents_with_ents(self):
        """Yield (sentence, [ents fully inside it]) in document order —
        the ``for doc in docs.sents: ... doc.ents`` loop of
        postprocessing_utils.py:362-372 (spaCy yields ents whose token range
        lies within the sentence).

        One bucketing pass instead of a per-sentence scan of all ents —
        the naive form is O(sents × ents) and was 4.1 s of an 8.9 s
        mega-judgment (0.5 MB) before this.  Semantics are identical,
        including the edge where snap-expanded sentences share a
        boundary token and one entity is inside BOTH: each ent walks
        back over every candidate sentence whose token range still
        overlaps its start, so multi-membership is preserved, and
        per-bucket ent order stays self.ents order."""
        sents = self.sents
        buckets: list[list[Span]] = [[] for _ in sents]
        starts = [s.start for s in sents]
        for e in self.ents:
            j = bisect_right(starts, e.start) - 1
            while j >= 0 and sents[j].end > e.start:
                if e.start >= sents[j].start and e.end <= sents[j].end:
                    buckets[j].append(e)
                j -= 1
        # walking j downward reverses multi-membership *append* order per
        # ent, but bucket CONTENTS per sentence keep self.ents order
        # because each ent is appended to a bucket at most once
        for sent, bucket in zip(sents, buckets):
            yield sent, bucket


def filter_spans(spans: list[Span]) -> list[Span]:
    """Overlap resolution with spaCy ``util.filter_spans`` parity
    (longest span wins; equal length → earlier start wins; full tie →
    first-seen wins; result sorted by start).  Cited by the reference at
    postprocessing_utils.py:349 and :747."""
    ordered = sorted(spans, key=lambda s: (s.end - s.start, -s.start),
                     reverse=True)
    taken: set[int] = set()
    kept = []
    for s in ordered:
        if s.start not in taken and (s.end - 1) not in taken:
            kept.append(s)
            taken.update(range(s.start, s.end))
    kept.sort(key=lambda s: s.start)
    return kept


def levenshtein(a: str, b: str) -> int:
    """Plain edit distance (the reference calls ``nltk.edit_distance``,
    postprocessing_utils.py:100-101; nltk is not available in-sandbox).
    Spark-side relational variants use ``F.levenshtein`` instead."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def levenshtein_lt(a: str, b: str, threshold: int) -> bool:
    """``levenshtein(a, b) < threshold`` via a Ukkonen band of width
    2*threshold-1 with per-row early abort — O(threshold * len) instead of
    O(len^2), exactly the same predicate: any cell whose true distance is
    < threshold lies within the band (|i-j| <= cost), and a path cheaper
    than threshold never leaves it, so banded == true for every cell that
    can still pass; a banded row with min >= threshold proves failure."""
    if a == b:
        return threshold > 0
    la, lb = len(a), len(b)
    if abs(la - lb) >= threshold:
        return False
    if la == 0 or lb == 0:
        return max(la, lb) < threshold
    t = threshold
    big = t + 1
    prev = list(range(min(lb, t) + 1)) + [big] * (lb - min(lb, t))
    for i in range(1, la + 1):
        ca = a[i - 1]
        lo = max(1, i - t + 1)
        hi = min(lb, i + t - 1)
        cur = [big] * (lb + 1)
        cur[0] = i
        row_min = big
        for j in range(lo, hi + 1):
            v = prev[j] + 1
            w = cur[j - 1] + 1
            if w < v:
                v = w
            w = prev[j - 1] + (ca != b[j - 1])
            if w < v:
                v = w
            cur[j] = v
            if v < row_min:
                row_min = v
        if row_min >= t:
            return False
        prev = cur
    return prev[lb] < t

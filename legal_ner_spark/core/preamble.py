"""Preamble/judgment split — faithful to data_preparation.py:36-127.

The only reference dependency not reproducible verbatim is spaCy POS tagging
inside ``guess_preamble_end`` (data_preparation.py:86-88); per SURVEY.md §7.2
the sandbox stand-in replaces "token.pos_ == VERB" with membership in the
closed verb lexicon (:mod:`vocab`), keeping every other rule — exclusion
list, allowed-lowercase list, consecutive-break threshold, the ``sent_id-2``
walk-back, and the keyword/truncation/fallback composition — identical.
"""

from __future__ import annotations

import re

from .docmodel import Doc
from .vocab import VERBS

# Ordered keyword list — data_preparation.py:37 (order matters: first match
# wins in both passes).
PREAMBLE_END_KEYWORDS = ["JUDGMENT", "ORDER", "J U D G M E N T", "O R D E R",
                         "JUDGMENT & ORDER", "COMMON ORDER", "ORAL JUDGMENT"]

_VERB_EXCLUSIONS = {"reserved", "pronounced", "dated", "signed"}
_ALLOWED_LOWERCASE = {"for", "at", "on", "the", "in", "of"}


def keyword_preamble_end(text: str) -> int:
    """data_preparation.py:36-54: first keyword on its own line (match end),
    else first keyword anywhere; 0 when absent."""
    for kw in PREAMBLE_END_KEYWORDS:
        m = re.search(r'\n\s*' + re.escape(kw) + r'\s*\n', text)
        if m:
            return m.span()[1]
    for kw in PREAMBLE_END_KEYWORDS:
        m = re.search(re.escape(kw), text)
        if m:
            return m.span()[1]
    return 0


def guess_preamble_end(truncated_txt: str) -> int:
    """data_preparation.py:70-106 with the deterministic verb lexicon.

    A sentence breaks the preamble pattern iff it contains a verb (excluding
    reserved/pronounced/dated/signed) AND is not all upper/title-case
    (modulo the allowed lowercase words); after >1 consecutive breaks the
    preamble ends at the sentence two places back.
    """
    doc = Doc(truncated_txt)
    sent_list = doc.sents
    successive = 0
    threshold = 1
    preamble_end = 0
    for sent_id, sent in enumerate(sent_list):
        words = [w for (_s, _e, w) in doc.tokens[sent.start:sent.end]]
        verb_present = any(w.lower() in VERBS and w.lower() not in _VERB_EXCLUSIONS
                           for w in words)
        alpha = [w for w in words if w.isalpha()]
        upper_or_title = all(w in _ALLOWED_LOWERCASE or w.isupper() or w.istitle()
                             for w in alpha)
        if verb_present and not upper_or_title:
            successive += 1
            if successive > threshold:
                # sent_id - threshold - 1 may go negative; the reference's
                # Python list indexing wraps — kept as-is for parity.
                preamble_end = sent_list[sent_id - threshold - 1].end_char
                break
        else:
            if successive > 0 and (verb_present or not upper_or_title):
                preamble_end = sent_list[sent_id - threshold - 1].end_char
                break
            successive = 0
    return preamble_end


def convert_upper_case_to_title(txt: str) -> str:
    """data_preparation.py:56-68 verbatim semantics (``str.title`` on
    all-upper subtokens; length-preserving per word)."""
    title_tokens = []
    for token in txt.split(' '):
        subs = []
        for sub in token.split('\n'):
            subs.append(sub.title() if sub.isupper() else sub)
        title_tokens.append('\n'.join(subs))
    return ' '.join(title_tokens)


def separate_and_clean_preamble(txt: str) -> tuple[str, int]:
    """data_preparation.py:108-127: returns (title-cased preamble text,
    preamble end offset)."""
    keyword_off = keyword_preamble_end(txt)
    if keyword_off == 0:
        truncate_at = 5000
    else:
        truncate_at = keyword_off + 200
    guessed = guess_preamble_end(txt[:truncate_at])
    preamble_end = keyword_off if guessed == 0 else guessed
    preamble_txt = txt[:preamble_end]
    return convert_upper_case_to_title(preamble_txt), preamble_end

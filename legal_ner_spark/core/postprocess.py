"""Faithful per-document reimplementation of the reference's postprocessing DAG.

This is the single-doc semantic oracle for the whole engine: it reproduces
/root/reference/postprocessing_utils.py:896-915 (``postprocessing``) over the
lightweight :mod:`docmodel` spans, including the reference's order-sensitive
greedy passes and its observable quirks (documented inline with file:line
citations).  The Spark engine runs this inside Arrow ``mapInPandas`` batches
(one call per document — tens of entities each, so Python cost is negligible
next to tagging), and unit tests run it directly against README worked
examples.

Deliberately preserved reference quirks (SURVEY.md §7.3) — each is marked
``# QUIRK`` below:
  * no-vs/no-citation precedents absorbed into the first pet/res cluster when
    both citations are '' (postprocessing_utils.py:90-97);
  * nearest-provision index bug: ``nearest.index(min(...))`` indexes the
    filtered distance list but pops from the unfiltered ``pros`` list (:382-384);
  * stale-variable removal loop in other-person coref (:327-328);
  * alias-cluster list reset when one statute has several aliases (:681-685);
  * mutate-while-iterating skip in alias re-bucketing (:699-710);
  * ``pro_statute[-1]`` IndexError on empty list (:468) and any other
    exception → the whole doc's postprocessing is skipped, exactly like the
    blanket except at legal_ner.py:42-47 (but per-doc, so one bad doc cannot
    void a partition — SURVEY.md §7.3).
"""

from __future__ import annotations

import re
from bisect import bisect_right
from collections import namedtuple
from dataclasses import dataclass, field

from .docmodel import Doc, Span, filter_spans, levenshtein_lt

PERSON_ROLES = ['PETITIONER', 'RESPONDENT', 'JUDGE', 'WITNESS', 'LAWYER']

# --------------------------------------------------------------------------
# Precedent coreference (reference §: postprocessing_utils.py:34-198)
# --------------------------------------------------------------------------

_SUPRA_RE = re.compile(r"('s\s*case\s*\(supra\)|\s*\(supra\))")
_VS_RE = re.compile(r'\b(?i:((v(\.|/)*s*\.*)|versus))\s+')
_CIT_RE = re.compile(
    r'(\(\d+\)|\d+|\[\d+\])\s*(\(\d+\)|\d+|\[\d+\])*\s*[A-Z\.]+\s*'
    r'(\(\d+\)|\d+|\[\d+\])*\s*')


def split_precedents(precedents: list[Span]) -> list[tuple[Span, str | None, str | None, str]]:
    """(pet, res, cit) breakup per PRECEDENT — postprocessing_utils.py:121-143.
    cit is '' (not None) when no citation matches."""
    out = []
    for ent in precedents:
        m = _CIT_RE.search(ent.text)
        if m:
            cit, text = m.group(), ent.text[:m.start()]
        else:
            cit, text = '', ent.text
        vs = _VS_RE.search(text)
        if vs:
            out.append((ent, text[:vs.start()].strip(), text[vs.end():].strip(), cit))
        else:
            out.append((ent, None, None, cit))
    return out


def _lev_lt(a: str, b: str, threshold: int) -> bool:
    """levenshtein(a,b) < threshold via the banded DP (docmodel
    .levenshtein_lt): length-gap O(1) reject + Ukkonen band + per-row
    abort — identical predicate, ~threshold/len of the full DP's work on
    precedent-heavy mega-docs."""
    return levenshtein_lt(a, b, threshold)


def create_precedent_clusters(breakup, threshold: int = 5,
                              strict_compat: bool = True) -> dict[int, list[Span]]:
    """Greedy order-dependent clustering — postprocessing_utils.py:69-118.
    Seeds at the first unconsumed precedent; absorbs later ones on
    edit-distance<threshold of both parties, or on exact citation equality
    when parties are missing.

    ``strict_compat=False`` fixes the ''-citation quirks: citation-equality
    absorption requires a NON-empty citation, so citation-less precedents
    are never glued together just because both lack a citation."""
    clusters: dict[int, list[Span]] = {}
    consumed: set[int] = set()
    num = 0
    for i, (pre, pet, res, cit) in enumerate(breakup):
        if i in consumed:
            continue
        cluster = [pre]
        if pet is not None and res is not None:
            for j in range(i + 1, len(breakup)):
                pre1, pet1, res1, cit1 = breakup[j]
                if pet1 is None or res1 is None:
                    # QUIRK (:90-97): the reference's ``if cit_1==None:
                    # exclude`` branch is dead — cit defaults to '' — so the
                    # live behavior is citation equality, which also absorbs
                    # no-vs/no-cit precedents into a seed whose cit is ''.
                    # strict_compat=False requires a real citation.
                    if cit1 == cit and (strict_compat or cit != ''):
                        consumed.add(j)
                        cluster.append(pre1)
                else:
                    if _lev_lt(pet, pet1, threshold) and _lev_lt(res, res1, threshold):
                        consumed.add(j)
                        cluster.append(pre1)
        else:
            # QUIRK (:109): reference tests ``elif cit != None`` — always
            # true since cit defaults to '' — and its inner ``cit_1 != None``
            # guard is vacuous, so a party-less seed absorbs every later
            # precedent (with or without parties) of equal citation,
            # including equal-'' citations.  strict_compat=False requires a
            # real citation here too.
            for j in range(i + 1, len(breakup)):
                if breakup[j][3] == cit and (strict_compat or cit != ''):
                    consumed.add(j)
                    cluster.append(breakup[j][0])
        clusters[num] = cluster
        num += 1
    return clusters


def get_precedent_supras(doc: Doc, entities_pn: list[Span],
                         entities_precedents: list[Span]):
    """Supra-reference as-of join — postprocessing_utils.py:34-66.
    A supra site is a person/org entity whose end_char abuts a
    ``(supra)``/``'s case (supra)`` match; it resolves to the *last*
    precedent at-or-before it whose space-stripped text contains the
    supra's space-stripped text (case-insensitive)."""
    ends = [e.end_char for e in entities_pn]
    supras: list[Span] = []
    for m in _SUPRA_RE.finditer(doc.text):
        if m.start() in ends:
            supras.append(entities_pn[ends.index(m.start())])
        elif m.start() - 1 in ends:
            supras.append(entities_pn[ends.index(m.start() - 1)])

    matches_by_supra: list[tuple[Span, Span]] = []
    for supra in supras:
        matches = []
        for pre in entities_precedents:
            if pre.start > supra.end:
                break
            supra_text = re.sub(' +', '', supra.text)
            pre_text = re.sub(' +', '', pre.text)
            # QUIRK (:59): the supra text is used as a *regex pattern*;
            # names with metacharacters behave as regexes do — including
            # raising re.error on invalid patterns, which the reference
            # does NOT catch here: it propagates to the blanket except at
            # legal_ner.py:42-47 and skips the doc's postprocessing (our
            # per-doc ok=False degrade).
            hit = re.search(supra_text, pre_text, re.IGNORECASE)
            if hit:
                matches.append(pre)
        if matches:
            matches_by_supra.append((supra, matches[-1]))
    return matches_by_supra, supras


def merge_supras_precedents(supra_matches, clusters: dict[int, list[Span]]):
    """postprocessing_utils.py:146-159 — append each supra to every cluster
    containing its matched precedent, else open a 2-element cluster."""
    counter = len(clusters)
    for supra, pre in supra_matches:
        hit = False
        for members in clusters.values():
            if pre in members:
                hit = True
                members.append(supra)
        if not hit:
            clusters[counter] = [supra, pre]
            counter += 1
    return clusters


def set_main_cluster(clusters: dict[int, list[Span]]) -> dict[Span, list[Span]]:
    """Head = longest member by token count, first-wins tie
    (postprocessing_utils.py:162-167; ``max(..., key=len)``).  Dict keyed by
    head span — same-head clusters collide last-wins, as in the reference."""
    final: dict[Span, list[Span]] = {}
    for members in clusters.values():
        final[max(members, key=len)] = members
    return final


def precedent_coref_resol(doc: Doc,
                          strict_compat: bool = True) -> dict[Span, list[Span]]:
    """postprocessing_utils.py:170-198: full precedent stage.  Relabels supra
    spans to PRECEDENT in doc.ents; returns multi-member clusters only."""
    entities_pn = [e for e in doc.ents
                   if e.label in ('OTHER_PERSON', 'ORG', 'PETITIONER', 'RESPONDENT')]
    entities_precedents = [e for e in doc.ents if e.label == 'PRECEDENT']
    breakup = split_precedents(entities_precedents)
    clusters = create_precedent_clusters(breakup, threshold=5,
                                         strict_compat=strict_compat)
    supra_matches, supras = get_precedent_supras(doc, entities_pn, entities_precedents)
    clusters = merge_supras_precedents(supra_matches, clusters)
    final = set_main_cluster(clusters)
    kept = {head: members for head, members in final.items() if len(members) > 1}
    # set membership == the reference's list scan (same __eq__ under the
    # hood), minus the O(ents x supras) rescan per entity
    supra_set = set(supras)
    for ent in doc.ents:
        if ent in supra_set:
            ent.label = 'PRECEDENT'
    return kept


# --------------------------------------------------------------------------
# Other-person role reconciliation (postprocessing_utils.py:201-335)
# --------------------------------------------------------------------------

def _norm(t: str) -> str:
    return ' '.join(t.split()).lower().replace(',', '')


def get_roles(doc: Doc):
    """postprocessing_utils.py:201-218."""
    entities = list(doc.ents)
    other_person = [e for e in entities if e.label == 'OTHER_PERSON']
    known_person = [e for e in entities if e.label in PERSON_ROLES]
    entities = [e for e in entities if e.label != 'OTHER_PERSON']
    return entities, other_person, known_person


def map_exact_other_person(doc: Doc):
    """Exact normalized-name join OTHER_PERSON → unambiguous entity label
    (postprocessing_utils.py:221-247)."""
    entities, other_person, known_person = get_roles(doc)
    other_text = [_norm(o.text) for o in other_person]
    ents_text = [_norm(e.text) for e in entities]
    found: list[Span] = []
    to_remove: list[Span] = []
    for i, other_p in enumerate(other_person):
        if other_text[i] in ents_text:
            labels = [entities[j].label for j, x in enumerate(ents_text)
                      if other_text[i] == x]
            if len(set(labels)) == 1:
                to_remove.append(other_p)
                index = ents_text.index(other_text[i])
                found.append(other_p)
                if entities[index].label in PERSON_ROLES:
                    found[-1].label = entities[index].label
    for o in to_remove:
        other_person.remove(o)
    return other_person, found, entities, known_person


def check_alias(names: list[Span]):
    """Split on '@'/'alias' — postprocessing_utils.py:250-262.
    Rows: [name_text, label, source_index]."""
    rows = []
    for i, n in enumerate(names):
        txt = _norm(n.text).strip()
        parts = re.split('@|alias', txt)
        if len(parts) > 1:
            rows.extend([[p.strip(), n.label, i] for p in parts])
        else:
            rows.append([txt, n.label, i])
    return rows


def separate_name(names: list[Span], only_first_last_name: bool):
    """postprocessing_utils.py:265-278."""
    rows = []
    for name, label, idx in check_alias(names):
        parts = name.split(' ')
        if len(parts) > 1:
            if not only_first_last_name:
                rows.append([parts[-1], label, idx])
                rows.append([' '.join(parts[:-1]), label, idx])
        else:
            rows.append([parts[0], label, idx])
    return rows


def remove_ambiguous_names(known_cleaned):
    """Name-parts mapping to >1 label are dropped
    (postprocessing_utils.py:281-298)."""
    by_name: dict[str, list[str]] = {}
    for name, label, _ in known_cleaned:
        by_name.setdefault(name, []).append(label)
    ambiguous = {n for n, ls in by_name.items() if len(set(ls)) > 1}
    left = [row for row in known_cleaned if row[0] not in ambiguous]
    return [row[0] for row in left], left


def map_name_wise_other_person(other_cleaned, known_cleaned):
    """postprocessing_utils.py:301-312 — returns [other_index, new_label]."""
    known_text, known_left = remove_ambiguous_names(known_cleaned)
    found = []
    for other in other_cleaned:
        if other[0] in known_text:
            found.append([other[2], known_left[known_text.index(other[0])][1]])
    return found


def other_person_coref_res(doc: Doc, strict_compat: bool = True) -> list[Span]:
    """postprocessing_utils.py:315-335 — the person-entity output set.

    ``strict_compat=False`` fixes the stale-loop-variable removal quirk:
    exactly the MATCHED persons are removed (they were re-labelled and
    appended to ``found``), so unrelated persons survive."""
    other_person, found, entities, known_person = map_exact_other_person(doc)
    known_cleaned = separate_name(known_person, only_first_last_name=False)
    other_cleaned = separate_name(other_person, only_first_last_name=True)
    oth = map_name_wise_other_person(other_cleaned, known_cleaned)
    o = None
    for o in oth:
        other_person[o[0]].label = o[1]
        found.append(other_person[o[0]])
    if strict_compat:
        # QUIRK (:327-328): the reference's removal loop reuses the stale
        # loop variable ``o`` — it removes the element at index o[0] (the
        # *last* match) len(oth) times from the shrinking list, dropping
        # unrelated persons.  Mirrored exactly, including the IndexError
        # when the index falls off the end (caught by the per-doc wrapper
        # like legal_ner.py:42).
        for _ in oth:
            other_person.remove(other_person[o[0]])
    else:
        for idx in sorted({m[0] for m in oth}, reverse=True):
            del other_person[idx]
    for person in other_person:
        if person not in found:
            found.append(person)
    found.extend(known_person)
    return found


# --------------------------------------------------------------------------
# Statute / provision linking (postprocessing_utils.py:356-821)
# --------------------------------------------------------------------------

_RE_CRPC = r'(?i)\b(((criminal|cr)\.*\s*(procedure|p)\.*\s*(c|code)\.*)|(code\s*of\s*criminal\s*procedure))\s*'
_RE_IPC = r'(?i)\b((i|indian)+\.*\s*(penal|p)\.*\s*(c|code))\.*'
_RE_CONS = r'(?i)\b((constitution)+\s*(of\s*india\s*)*)\b'
_RE_ITACT = r'(?i)\b((i\.*\s*t\.*\s*|income\s*\-*tax\s+)act\s*)\b'
_RE_MVACT = r'(?i)\b((m\.*\s*v\.*\s*)|(motor\s*\-*vehicle(s)*\s+)act\s*)\b'
_RE_IDACT = r'(?i)\b((i\.*\s*d\.*\s*)|(industrial\s*\-*dispute(s)*\s+)act\s*)\b'
_RE_SARFAESI = (r'(?i)\b((s\.*\s*a\.*\s*r\.*\s*f\.*\s*a\.*\s*e\.*\s*s\.*\s*i\.*\s*)|'
                r'(securitisation\s*and\s*reconstruction\s*of\s*financial\s*assets\s*'
                r'and\s*enforcement\s*of\s*security\s*interest\s+)act\s*)\b')

# Ordered (pattern, canonical) pairs — first match wins, same order as the
# if/elif cascade at postprocessing_utils.py:600-622.
STATUTE_CANON = [
    (_RE_CRPC, 'Criminal Procedure Code'),
    (_RE_IPC, 'Indian Penal Code'),
    (_RE_CONS, 'Constitution'),
    (_RE_ITACT, 'Income Tax Act'),
    (_RE_MVACT, 'Motor Vehicle Act'),
    (_RE_IDACT, 'Industrial Dispute Act'),
    (_RE_SARFAESI, 'Securitisation and Reconstruction of Financial Assets '
                   'and Enforcement of Securities Interest Act'),
]


def check_stat(text: str) -> str:
    """Statute dictionary lookup — postprocessing_utils.py:591-622."""
    for pat, canon in STATUTE_CANON:
        if re.search(pat, text):
            return canon
    return ''


_PAREN_RE = re.compile(r'\((.*?)\)')
_ACT_RE = re.compile(
    r"\b(([A-Z][A-Za-z'']*|\d{4})(?:\s+[A-Z][a-z'']*)*\s*(a|A)ct|\s*(a|A)ct)\b")


def create_unidentified_statutes(doc: Doc, strict_compat: bool = True):
    """Parenthetical alias discovery — postprocessing_utils.py:639-713.

    ``strict_compat=False`` fixes two list quirks: per-statute alias
    clusters EXTEND instead of resetting (moot today — one alias per
    statute upstream — but correct if that changes), and the discarded-
    span removal iterates a snapshot so no member is skipped."""
    statutes = [e for e in doc.ents if e.label == 'STATUTE']
    statutes_start_end = [(s.start, s.end) for s in statutes]

    # anchored probe instead of the reference's search over the whole
    # remaining text: the condition `search(after).span()[0] == 1` is
    # exactly "no complete paren opens at offset 0 and one opens at
    # offset 1" (a match of \((.*?)\) starts at every '(' that has a
    # later ')'), so two anchored .match calls decide it without the
    # O(len) text copy + scan per statute — the naive form is
    # O(statutes × doc_len) and dominated mega-judgment wall.
    text = doc.text
    alias_texts: dict[Span, list[str]] = {}
    for statute in statutes:
        p = statute.end_char
        if _PAREN_RE.match(text, p):
            continue
        m = _PAREN_RE.match(text, p + 1)
        if m:
            m1 = _ACT_RE.search(m.group())
            if m1:
                alias_texts.setdefault(statute, []).append(m1.group().strip())

    new_statutes: list[Span] = []
    new_clusters: dict[Span, list[Span]] = {}
    span_cache: dict[str, list[Span]] = {}   # alias string → its hits
    for statute, aliases in alias_texts.items():
        for alias in aliases:
            if alias in span_cache:
                spans = span_cache[alias]
            else:
                try:
                    hits = list(re.finditer(alias, text))
                except re.error:
                    hits = []
                spans = [doc.char_span(h.start(), h.end(), label='STATUTE',
                                       alignment_mode='expand')
                         for h in hits]
                spans = [s for s in spans if s is not None]
                span_cache[alias] = spans
            new_statutes.extend(spans)
            # QUIRK (:681-685): the reference's membership test compares the
            # alias *string* against Span dict keys, so it is always true and
            # the statute's list is reset on every alias (only the last
            # alias's spans survive).  Each statute contributes at most one
            # alias upstream, so plain reset-then-extend is the exact
            # behavior.  strict_compat=False accumulates instead.
            if strict_compat:
                new_clusters[statute] = list(spans)
            else:
                new_clusters.setdefault(statute, []).extend(spans)

    # containment via sorted ranges + prefix-max end (O((n+m) log n))
    # instead of the reference's all-pairs comprehension.  The original
    # discard loop (`for s in discarded: if s in new_statutes:
    # new_statutes.remove(s)`) nets out to "drop EVERY occurrence whose
    # value is contained in ≥1 statute range": each occurrence of a
    # value x lands in `discarded` once per containing range, so the
    # removals (min(count, count × ranges)) always exhaust the equal
    # occurrences — a filtered rebuild is value-identical.
    ranges = sorted(statutes_start_end)
    r_starts = [a for a, _ in ranges]
    pmax: list[int] = []
    for _, oe in ranges:
        pmax.append(max(pmax[-1], oe) if pmax else oe)

    def _contained(s: Span) -> bool:
        i = bisect_right(r_starts, s.start) - 1
        return i >= 0 and pmax[i] >= s.end

    discarded = {s for s in new_statutes if _contained(s)}
    new_statutes = [s for s in new_statutes if s not in discarded]

    old_clusters: dict[Span, list[Span]] = {}
    for sta, members in new_clusters.items():
        # QUIRK (:699-710): the reference removes from the list while
        # iterating it, skipping the element after each removal — iterate the
        # live list the same way.  strict_compat=False iterates a snapshot.
        for s in (members if strict_compat else list(members)):
            if s in discarded:
                members.remove(s)
                old_clusters.setdefault(sta, []).append(s)

    return new_clusters, new_statutes, old_clusters


def create_statute_clusters(doc: Doc, old_clusters, new_clusters,
                            strict_compat: bool = True):
    """postprocessing_utils.py:559-588 — canonical-keyed statute clusters.
    QUIRK (:567-576): the reference checks Span keys against text keys, so
    same-text statutes overwrite rather than extend; mirrored.
    ``strict_compat=False`` extends same-text clusters instead."""
    clusters: dict[str, list[Span]] = {}
    for c, members in old_clusters.items():
        if strict_compat:
            clusters[c.text] = list(members)
        else:
            clusters.setdefault(c.text, []).extend(members)
    for c, members in new_clusters.items():
        if strict_compat:
            clusters[c.text] = list(members)
        else:
            clusters.setdefault(c.text, []).extend(members)
    for statute in (e for e in doc.ents if e.label == 'STATUTE'):
        stat = check_stat(statute.text)
        if stat == '':
            continue
        clusters.setdefault(stat, []).append(statute)
    return clusters


def get_exact_match_pro_statute(doc: Doc, strict_compat: bool = True):
    """Sentence-window nearest-preceding-provision pairing
    (postprocessing_utils.py:356-392).

    ``strict_compat=False`` fixes the filtered-index quirk: the argmin is
    taken over (distance, position) of the QUALIFYING provisions and the
    matching provision itself is popped — the statute always pairs with
    its actual nearest preceding provision."""
    pro_statute: list[list] = []
    pro_left: list[Span] = []
    total_statutes: list[Span] = []
    for _sent, ents in doc.sents_with_ents():
        statutes = [e for e in ents if e.label == 'STATUTE']
        pros = [e for e in ents if e.label == 'PROVISION']
        total_statutes.extend(statutes)
        for statute in statutes:
            cands = [(statute.start - p.end, idx)
                     for idx, p in enumerate(pros)
                     if p.end <= statute.start]
            if cands:
                if strict_compat:
                    # QUIRK (:382-384): index into the *filtered* distance
                    # list is used against the *unfiltered* pros list.
                    nearest = [d for d, _ in cands]
                    ind = nearest.index(min(nearest))
                else:
                    ind = min(cands)[1]
                provision = pros.pop(ind)
                pro_statute.append([provision, statute])
        if pros:
            pro_left.extend(pros)
    return pro_statute, pro_left, total_statutes


_SEC_RE = re.compile(r'(?i)(section(s)*|article(s)*)')
_SUBSEC_RE_STATUTE = re.compile(r'(?i)((sub|sub-)section(s)*|clause(s)*|annexure(s)*)')
_SUBSEC_RE_PRO = re.compile(r'(?i)(((sub|sub-)\s*section(s)*)|clause(s)*|annexure(s)*)')


def _provision_segments(text: str):
    """Shared split rule: on literal 'of' anywhere, else on ,|and|/|or
    (postprocessing_utils.py:402-407)."""
    parts = re.split('of', text)
    if len(parts) > 1:
        return parts[1:]
    return re.split(',|and|/|or', text)


def separate_provision_get_pairs_statute(pro_statute):
    """postprocessing_utils.py:395-430."""
    matching: list[list] = []
    to_remove: list[list] = []
    for pro in pro_statute:
        for sec in _provision_segments(pro[0].text):
            if _SUBSEC_RE_STATUTE.search(sec):
                to_remove.append(pro)
                continue
            msec = _SEC_RE.search(sec)
            mbrace = re.search(r'\(', sec)
            if mbrace:
                sec = sec[:mbrace.start()]
            if msec:
                matching.append([sec[msec.end():].strip(), pro[1]])
            else:
                matching.append([sec.strip(), pro[1]])
    return to_remove, matching


def separate_provision_get_pairs_pro(pro_left):
    """postprocessing_utils.py:522-556 (adds the non-empty-segment guard)."""
    matching: list[list] = []
    for pro in pro_left:
        for sec in _provision_segments(pro.text):
            if _SUBSEC_RE_PRO.search(sec):
                continue
            msec = _SEC_RE.search(sec)
            mbrace = re.search(r'\(', sec)
            if mbrace:
                sec = sec[:mbrace.start()]
            if len(sec.strip()) > 0:
                if msec:
                    matching.append([sec[msec.end():].strip(), pro])
                else:
                    matching.append([sec.strip(), pro])
    return matching


def check_validity(provision: Span, statute: Span) -> bool:
    """postprocessing_utils.py:433-444 — article XOR constitution."""
    if 'article' in provision.text.lower():
        return 'constitution' not in statute.text.lower()
    return 'constitution' in statute.text.lower()


def map_pro_statute_on_heuristics(matching_pro_left, matching_pro_statute,
                                  pro_statute, total_statutes,
                                  strict_compat: bool = True):
    """Implicit-provision resolution — postprocessing_utils.py:447-500,
    including the ``pro_statute[-1]`` IndexError path on an empty list.

    ``strict_compat=False`` guards the two crash/wrap quirks: an empty
    ``pro_statute`` means append (no ``[-1]`` probe → no IndexError →
    the doc is not voided), and the validity walk stops at the list
    head instead of wrapping to ``total_statutes[-1]`` — a provision
    with no valid preceding statute is skipped rather than mispaired."""
    for pro_left in matching_pro_left:
        provision_to_find = pro_left[0]
        sta = [i for i, v in enumerate(matching_pro_statute)
               if v[0] == provision_to_find]
        j = 0
        for j, statute_i in enumerate(sta):
            if matching_pro_statute[statute_i][1].start > pro_left[1].end:
                break
        if len(sta) > 0:
            sta_index = j - 1 if j > 0 else 0
            statute = matching_pro_statute[sta[sta_index]]
            if (not strict_compat and not pro_statute) \
                    or pro_statute[-1][0] != pro_left[1]:
                pro_statute.append([pro_left[1], statute[1]])
            else:
                pro_statute.pop(-1)
                pro_statute.append([pro_left[1], statute[1]])
        else:
            i = 0
            for m, v in enumerate(total_statutes):
                if v.end > pro_left[1].end:
                    i = m
                    break
            if strict_compat:
                while check_validity(pro_left[1], total_statutes[i - 1]):
                    i = i - 1
            else:
                while i - 1 >= 0 and check_validity(pro_left[1],
                                                    total_statutes[i - 1]):
                    i = i - 1
                if i - 1 < 0:
                    continue  # no valid preceding statute — skip the pair
            if (not strict_compat and not pro_statute) \
                    or pro_statute[-1][0] != pro_left[1]:
                matching_pro_statute.append([pro_left[0], total_statutes[i - 1]])
                pro_statute.append([pro_left[1], total_statutes[i - 1], ''])
    return matching_pro_statute, pro_statute


def get_clusters(pro_statute):
    """postprocessing_utils.py:503-519 — split 3-tuples from exact pairs."""
    custom, clusters = [], []
    for pro in pro_statute:
        if len(pro) > 2:
            custom.append(pro)
            pro.pop(2)
        else:
            clusters.append(pro)
    for ent in custom:
        clusters.append((ent[0], ent[1]))
    return clusters


def seperate_provision(doc: Doc, clusters):
    """Compound provision splitting — postprocessing_utils.py:786-821."""
    new_clusters = []
    for cluster in clusters:
        provision, statute = cluster[0], cluster[1]
        section = re.split(',|and|/|or|&', provision.text)
        start = provision.start_char
        pro = provision.text
        keyword = section[0].split(' ')[0]
        # NOTE: keyword[-1] on an empty keyword raises IndexError exactly
        # as the reference does (postprocessing_utils.py:796) — the doc
        # then degrades via the per-doc except, mirroring the blanket
        # skip at legal_ner.py:42-47.
        if keyword[-1] == 's':
            keyword = keyword[:-1]
        combined = False
        for sec in section:
            sec_text = sec.strip()
            if len(sec_text) > 0:
                if (sec_text.replace(' ', '').isalpha()
                        or (not sec_text[0].isnumeric() and not sec_text[0].isalpha())):
                    combined = True
                    break
        if len(section) > 1 and not combined:
            for sec in section:
                ind = pro.find(sec)
                sect = doc.char_span(start + ind, start + ind + len(sec),
                                     'PROVISION', alignment_mode='expand')
                pro = pro[ind + len(sec):]
                start = start + ind + len(sec)
                if not sec.strip()[0].isalpha():
                    new_clusters.append((sect, statute, keyword + ' ' + sect.text))
                else:
                    new_clusters.append(
                        (sect, statute,
                         keyword + ' ' + ' '.join(sect.text.split(' ')[1:])))
        else:
            new_clusters.append((cluster[0], cluster[1], cluster[0].text))
    return new_clusters


ProvisionStatute = namedtuple(
    'ProvisionStatute',
    ['provision_entity', 'statute_entity',
     'normalised_provision_text', 'normalised_statute_text'])


def add_statute_head(clusters, stat_clusters):
    """postprocessing_utils.py:716-737 — normalised statute = cluster head.

    Set-based membership replaces the reference's two list scans (which
    are O(heads × clusters × acts) + O(clusters²) and dominated a
    mega-judgment's wall via millions of Span.__eq__ calls).  Same
    answers: ``cluster[1] in set(acts)`` is the identical predicate
    (Span hash is consistent with __eq__), and index-identity for
    ``done`` equals the reference's equality test — a cluster EQUAL to
    a done cluster has an equal statute span, so it matched the same
    head itself and is in ``done`` in both versions."""
    new_clusters, done = [], set()
    for head, acts in stat_clusters.items():
        acts_set = set(acts)
        for i, cluster in enumerate(clusters):
            if cluster[1] in acts_set:
                new_clusters.append(ProvisionStatute(cluster[0], cluster[1],
                                                     cluster[2], head))
                done.add(i)
    for i, cluster in enumerate(clusters):
        if i not in done:
            new_clusters.append(ProvisionStatute(cluster[0], cluster[1],
                                                 cluster[2], cluster[1].text))
    return new_clusters


def remove_unidentified_statutes(doc: Doc, new_statutes):
    """postprocessing_utils.py:625-636 — drop synthetic alias spans.
    (Set membership ≡ the reference's list membership: Span.__hash__ is
    consistent with __eq__.)"""
    drop = set(new_statutes)
    return [e for e in doc.ents if e not in drop]


def pro_statute_coref_resol(doc: Doc, strict_compat: bool = True):
    """postprocessing_utils.py:740-783 — the 9-step provision↔statute DAG."""
    new_clusters, new_statutes, old_clusters = create_unidentified_statutes(
        doc, strict_compat=strict_compat)
    old_entities = list(doc.ents)
    seen = set(old_entities)
    for ent in new_statutes:
        if ent not in seen:
            old_entities.append(ent)
            seen.add(ent)
    doc.ents = filter_spans(old_entities)

    stat_clusters = create_statute_clusters(doc, old_clusters, new_clusters,
                                            strict_compat=strict_compat)
    pro_statute, pro_left, total_statutes = get_exact_match_pro_statute(
        doc, strict_compat=strict_compat)
    to_remove, matching_pro_statute = separate_provision_get_pairs_statute(pro_statute)
    matching_pro_left = separate_provision_get_pairs_pro(pro_left)
    for pro in to_remove:
        if pro in pro_statute:
            pro_statute.remove(pro)
    matching_pro_statute, pro_statute = map_pro_statute_on_heuristics(
        matching_pro_left, matching_pro_statute, pro_statute, total_statutes,
        strict_compat=strict_compat)
    clusters = get_clusters(pro_statute)
    clusters = seperate_provision(doc, clusters)
    doc.ents = remove_unidentified_statutes(doc, new_statutes)
    new_pairs = add_statute_head(clusters, stat_clusters)
    return new_pairs, stat_clusters


def remove_overlapping_entities(ents, pro_sta_clusters):
    """postprocessing_utils.py:338-353."""
    final = [e for e in ents if e.label not in
             ['PETITIONER', 'RESPONDENT', 'LAWYER', 'JUDGE', 'OTHER_PERSON',
              'WITNESS', 'PROVISION']]
    present = set(final)
    for cluster in pro_sta_clusters:
        if cluster[0] not in present:
            final.append(cluster[0])
            present.add(cluster[0])
    return filter_spans(final)


# --------------------------------------------------------------------------
# Orchestration (postprocessing_utils.py:896-915 + legal_ner.py:42-47)
# --------------------------------------------------------------------------

@dataclass
class PostprocessResult:
    ents: list[Span]
    precedent_clusters: dict[Span, list[Span]] = field(default_factory=dict)
    statute_clusters: dict[str, list[Span]] = field(default_factory=dict)
    provision_statute_pairs: list[ProvisionStatute] = field(default_factory=list)
    ok: bool = True


def _validate_ents(ents: list[Span]) -> None:
    """spaCy's ``doc.ents`` setter semantics at postprocessing_utils.py:909:
    assigning entities where any token is covered more than once (overlap
    OR exact duplicate) raises ValueError, which the reference's blanket
    except (legal_ner.py:42-47) turns into skip-all-postprocessing — our
    per-doc ok=False degrade."""
    ordered = sorted(ents, key=lambda s: (s.start, s.end))
    for a, b in zip(ordered, ordered[1:]):
        if b.start < a.end:
            raise ValueError(
                f"conflicting doc.ents: [{a.start},{a.end}) overlaps "
                f"[{b.start},{b.end}) (spaCy E1010 semantics)")


def postprocess_doc(doc: Doc, strict_compat: bool = True) -> PostprocessResult:
    """Run the reference's full postprocessing DAG on one document.

    On any exception the document's raw entities are returned unmodified and
    ``ok=False`` — the per-doc analogue of the blanket except at
    legal_ner.py:42-47 (which skips postprocessing for the whole doc), so a
    single pathological document cannot void its Spark partition.

    ``strict_compat=True`` (default) mirrors every documented reference
    quirk byte-for-byte — the parity mode the P/R gate runs against.
    ``strict_compat=False`` runs the FIXED semantics for the quirks that
    are plainly bugs (SURVEY.md §7.3): non-stale person removal,
    filtered-index nearest-provision pairing, guarded ``pro_statute[-1]``
    and non-wrapping validity walk (no doc-voiding IndexError),
    non-empty-citation precedent absorption, accumulate-not-reset
    alias/statute clusters, snapshot iteration in alias re-bucketing —
    for users who want correct-rather-than-faithful triples.
    """
    raw_ents = [Span(e.start, e.end, e.start_char, e.end_char, e.text, e.label)
                for e in doc.ents]
    try:
        precedent_clusters = precedent_coref_resol(
            doc, strict_compat=strict_compat)
        other_person_ents = other_person_coref_res(
            doc, strict_compat=strict_compat)
        pro_sta_pairs, stat_clusters = pro_statute_coref_resol(
            doc, strict_compat=strict_compat)
        all_entities = remove_overlapping_entities(doc.ents, pro_sta_pairs)
        all_entities.extend(other_person_ents)
        _validate_ents(all_entities)
        doc.ents = all_entities
        return PostprocessResult(all_entities, precedent_clusters,
                                 stat_clusters, pro_sta_pairs, ok=True)
    except Exception:
        doc.ents = raw_ents
        return PostprocessResult(raw_ents, ok=False)

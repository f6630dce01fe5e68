"""Exact-parity unit tests for the postprocessing core, with goldens lifted
from the reference's README worked examples (FIXTURES.md §4)."""

from legal_ner_spark.core.docmodel import Doc, Span
from legal_ner_spark.core import postprocess as pp


def _doc_with_ents(text, ents_spec, hard_breaks=()):
    """ents_spec: list of (substring, label, occurrence_index)."""
    doc = Doc(text, hard_breaks=hard_breaks)
    ents = []
    for spec in ents_spec:
        sub, label = spec[0], spec[1]
        occ = spec[2] if len(spec) > 2 else 0
        start = -1
        for _ in range(occ + 1):
            start = text.index(sub, start + 1)
        sp = doc.char_span(start, start + len(sub), label=label)
        assert sp is not None, sub
        ents.append(sp)
    ents.sort(key=lambda s: s.start)
    doc.ents = ents
    return doc


# ---------------------------------------------------------------- statute dict

def test_check_stat_fixture_family():
    # FIXTURES.md statute_canon family
    assert pp.check_stat("I.P.C") == "Indian Penal Code"
    # README prose claims 'Penal code' clusters under IPC, but the code's
    # regex (postprocessing_utils.py:593) requires a leading i/indian — the
    # code is authoritative:
    assert pp.check_stat("Penal code") == ""
    assert pp.check_stat("Code of Criminal Procedure") == "Criminal Procedure Code"
    assert pp.check_stat("Crpc") == "Criminal Procedure Code"
    assert pp.check_stat("Constitution of India") == "Constitution"
    assert pp.check_stat("M.V. act") == "Motor Vehicle Act"
    assert pp.check_stat("sarfaesi act").startswith("Securitisation")
    assert pp.check_stat("Evidence Act") == ""


# ------------------------------------------------------------ precedent split

def test_split_precedents_variants():
    d = Doc("A B vs C D 2016 AIR 54. A B v. C D. E F versus G H. 2001 SCC 5.")
    ents = [d.char_span(0, 22, label="PRECEDENT"),
            d.char_span(24, 34, label="PRECEDENT")]
    breakup = pp.split_precedents(ents)
    ent0 = breakup[0]
    assert ent0[1] == "A B" and ent0[2] == "C D" and ent0[3].strip() == "2016 AIR 54"
    ent1 = breakup[1]
    assert ent1[1] == "A B" and ent1[2] == "C D" and ent1[3] == ""


# -------------------------------------------------- precedent greedy clusters

def test_precedent_cluster_readme_example():
    """README.md:182-183: citation + no-citation + supra mentions of Madhu
    Limaye all cluster; head is the longest member."""
    text = ("Madhu Limaye vs State of Mahrashtra 2016 AIR 54 was cited. "
            "We rely on Madhu Limaye vs State of Maharashtra here. "
            "Madhu Limaye's case (supra) was followed.")
    doc = _doc_with_ents(text, [
        ("Madhu Limaye vs State of Mahrashtra 2016 AIR 54", "PRECEDENT"),
        ("Madhu Limaye vs State of Maharashtra", "PRECEDENT"),
        ("Madhu Limaye", "OTHER_PERSON", 2),  # the supra site
    ])
    supra_person = doc.ents[-1]
    assert supra_person.label == "OTHER_PERSON"
    clusters = pp.precedent_coref_resol(doc)
    assert len(clusters) == 1
    head, members = next(iter(clusters.items()))
    assert head.text == "Madhu Limaye vs State of Mahrashtra 2016 AIR 54"
    assert len(members) == 3
    # supra relabeled PRECEDENT in doc.ents (postprocessing_utils.py:190-196)
    assert supra_person.label == "PRECEDENT"


def test_precedent_cluster_edit_distance_threshold():
    text = "A vs B. Axxxxxxx vs B."
    doc = _doc_with_ents(text, [("A vs B", "PRECEDENT"),
                                ("Axxxxxxx vs B", "PRECEDENT")])
    breakup = pp.split_precedents([e for e in doc.ents])
    clusters = pp.create_precedent_clusters(breakup, threshold=5)
    # distance 7 >= 5 → two clusters
    assert len(clusters) == 2


# ------------------------------------------------------------ provision link

def test_provision_statute_readme_pairs():
    """README.md:203-204: (Section 369, Crpc) → ('Section 369',
    'Criminal Procedure Code')."""
    text = ("The accused moved under Section 369 of the Crpc before this court. "
            "Later Section 424 of the Crpc was pressed.")
    doc = _doc_with_ents(text, [
        ("Section 369", "PROVISION"), ("Crpc", "STATUTE", 0),
        ("Section 424", "PROVISION"), ("Crpc", "STATUTE", 1),
    ])
    pairs, stat_clusters = pp.pro_statute_coref_resol(doc)
    got = [(p.provision_entity.text, p.statute_entity.text,
            p.normalised_provision_text, p.normalised_statute_text)
           for p in pairs]
    assert ("Section 369", "Crpc", "Section 369", "Criminal Procedure Code") in got
    assert ("Section 424", "Crpc", "Section 424", "Criminal Procedure Code") in got
    assert stat_clusters["Criminal Procedure Code"]


def test_compound_provision_split():
    """FIXTURES.md provision_link: 'Sections 147, 148 and 149 of IPC'."""
    text = "Charged under Sections 147, 148 and 149 of the I.P.C. in this case."
    doc = _doc_with_ents(text, [
        ("Sections 147, 148 and 149", "PROVISION"), ("I.P.C.", "STATUTE"),
    ])
    pairs, _ = pp.pro_statute_coref_resol(doc)
    norms = sorted(p.normalised_provision_text for p in pairs)
    assert norms == ["Section 147", "Section 148", "Section 149"]
    assert all(p.normalised_statute_text == "Indian Penal Code" for p in pairs)


def test_implicit_provision_resolved_by_same_number():
    """pro_left path (a): same normalized number seen elsewhere with a statute
    (postprocessing_utils.py:454-466)."""
    text = ("He was charged under Section 302 of the Indian Penal Code first. "
            "Section 302 was again pressed in the second charge.")
    doc = _doc_with_ents(text, [
        ("Section 302", "PROVISION", 0), ("Indian Penal Code", "STATUTE"),
        ("Section 302", "PROVISION", 1),
    ])
    pairs, _ = pp.pro_statute_coref_resol(doc)
    assert len(pairs) == 2
    assert all(p.normalised_statute_text == "Indian Penal Code" for p in pairs)


def test_article_constitution_validity_walkback():
    """pro_left path (b): nearest prior statute walked back through
    check_validity (postprocessing_utils.py:486-492) — an Article must not
    bind to a non-Constitution statute."""
    # an exact pair must exist first: with pro_statute empty the reference
    # itself IndexErrors at postprocessing_utils.py:495 (covered by
    # test_postprocess_doc_isolates_failures)
    text = ("He was charged under Section 302 of the Indian Penal Code. "
            "The writ invoked the Constitution of India as amended. "
            "Article 226 was relied upon at the hearing.")
    doc = _doc_with_ents(text, [
        ("Section 302", "PROVISION"),
        ("Indian Penal Code", "STATUTE"),
        ("Constitution of India", "STATUTE"),
        ("Article 226", "PROVISION"),
    ])
    pairs, _ = pp.pro_statute_coref_resol(doc)
    art = [p for p in pairs if p.normalised_provision_text == "Article 226"]
    assert art and art[0].statute_entity.text == "Constitution of India"


# ---------------------------------------------------------------- alias flow

def test_alias_discovery_and_statute_clusters():
    """FIXTURES.md alias_discovery: '(herein MV Act)' promotes later bare
    alias occurrences to STATUTE and clusters them under the long form."""
    text = ("The claim arose under the Motor Vehicles Act, 1988 (MV Act) as "
            "amended. The MV Act provides for compensation. "
            "Compensation under the MV Act was enhanced.")
    doc = _doc_with_ents(text, [("Motor Vehicles Act, 1988", "STATUTE")])
    pairs, stat_clusters = pp.pro_statute_coref_resol(doc)
    assert "Motor Vehicles Act, 1988" in stat_clusters
    alias_texts = [s.text for s in stat_clusters["Motor Vehicles Act, 1988"]]
    assert alias_texts.count("MV Act") >= 2


# -------------------------------------------------------------- role coref

def test_exact_other_person_relabel_readme():
    """README.md §4: 'Amit Kumar' PETITIONER in preamble, OTHER_PERSON later
    → PETITIONER everywhere."""
    text = ("Amit Kumar .... Petitioner filed this appeal. "
            "The evidence of Amit Kumar was recorded by the court.")
    doc = _doc_with_ents(text, [
        ("Amit Kumar", "PETITIONER", 0),
        ("Amit Kumar", "OTHER_PERSON", 1),
    ])
    persons = pp.other_person_coref_res(doc)
    labels = {(p.start_char, p.text): p.label for p in persons}
    assert all(v == "PETITIONER" for v in labels.values())


def test_partial_name_relabel_single_token():
    """Partial-name join: single-token OTHER_PERSON matches an unambiguous
    known-person name part (postprocessing_utils.py:301-312)."""
    text = ("Rajesh Verma .... Respondent appeared in person. "
            "It was Rajesh who moved the application.")
    doc = _doc_with_ents(text, [
        ("Rajesh Verma", "RESPONDENT"),
        ("Rajesh", "OTHER_PERSON", 1),
    ])
    persons = pp.other_person_coref_res(doc)
    single = [p for p in persons if p.text == "Rajesh"]
    assert single and single[0].label == "RESPONDENT"


def test_ambiguous_name_left_unchanged():
    text = ("Rajesh Verma .... Petitioner here. Rajesh Gupta .... Respondent "
            "there. It was Rajesh who appeared before the court.")
    doc = _doc_with_ents(text, [
        ("Rajesh Verma", "PETITIONER"),
        ("Rajesh Gupta", "RESPONDENT"),
        ("Rajesh", "OTHER_PERSON", 2),
    ])
    persons = pp.other_person_coref_res(doc)
    single = [p for p in persons if p.text == "Rajesh"]
    assert single and single[0].label == "OTHER_PERSON"


# ------------------------------------------------------------ full DAG guard

def test_postprocess_doc_isolates_failures():
    """A doc whose pro_statute state triggers the reference's IndexError
    (empty pro_statute with an orphan provision, postprocessing_utils.py:468)
    degrades to raw entities with ok=False instead of raising."""
    text = "Section 999 was cited without any statute anywhere near it."
    doc = _doc_with_ents(text, [("Section 999", "PROVISION")])
    res = pp.postprocess_doc(doc)
    assert res.ok is False
    assert [e.text for e in res.ents] == ["Section 999"]


def test_duplicate_final_ents_degrade_like_reference():
    """The reference's ``nlp_doc.ents = all_entities`` raises ValueError on
    duplicate/overlapping spans (spaCy E1010) and the blanket except skips
    postprocessing — our per-doc equivalent must reject them, not silently
    keep a mangled entity list."""
    import pytest
    from legal_ner_spark.core.docmodel import Span
    from legal_ner_spark.core.postprocess import _validate_ents

    with pytest.raises(ValueError):
        _validate_ents([Span(0, 2, 0, 9, "Raju Amit", "PETITIONER"),
                        Span(0, 2, 0, 9, "Raju Amit", "PETITIONER")])
    with pytest.raises(ValueError):
        _validate_ents([Span(0, 3, 0, 12, "a b c", "ORG"),
                        Span(2, 4, 8, 16, "c d", "GPE")])
    # non-overlapping spans are fine
    _validate_ents([Span(0, 2, 0, 9, "x", "ORG"),
                    Span(2, 4, 10, 15, "y", "GPE")])


def test_model_tagger_chunk_bounds_cover_everything():
    """Chunking must cover the full text with no gaps/overlaps and split at
    whitespace (no token straddles a chunk edge) — a truncating tagger
    would drop every entity past the limit."""
    from legal_ner_spark.core.model_tagger import chunk_bounds
    text = ("word " * 5000).strip()
    bounds = chunk_bounds(text, 1000)
    assert bounds[0][0] == 0 and bounds[-1][1] == len(text)
    for (s1, e1), (s2, _e2) in zip(bounds, bounds[1:]):
        assert e1 == s2                                 # contiguous
    for (s, e) in bounds:                               # EVERY chunk incl. last
        assert e - s <= 1000
        assert e == len(text) or text[e] == " "         # whitespace split
    assert chunk_bounds("", 100) == []
    assert chunk_bounds("short", 100) == [(0, 5)]
    # pathological: no whitespace at all — hard split, still full coverage
    assert chunk_bounds("x" * 2500, 1000) == [(0, 1000), (1000, 2000),
                                              (2000, 2500)]


def test_statute_rule_word_boundaries():
    """A vocabulary surface must not match as a prefix inside a longer
    word (char_span expand would snap to a bogus statute span), while
    dot-terminated abbreviations still match — the reason the rule ends
    with (?!\\w) rather than \\b."""
    from legal_ner_spark.core.tagger import tag_region

    def statutes(txt):
        return [txt[s:e] for (s, e, lab) in tag_region(txt, "judgment")
                if lab == "STATUTE"]

    assert statutes("He cited the Indian Penal Code today.") == ["Indian Penal Code"]
    assert statutes("He cited the Indian Penal Codes today.") == []
    assert statutes("Under I.P.C. section rules.") == ["I.P.C."]
    assert statutes("Constitutional matters differ.") == []
    assert statutes("Indian Penal Code, 1860 applies.") == ["Indian Penal Code, 1860"]


# ------------------------------------------------------- strict_compat toggle

def test_strict_compat_stale_removal_loop_both_behaviors():
    """The reference's stale-loop-variable removal (postprocessing_utils
    .py:327-328) drops an UNRELATED person once two OTHER_PERSONs match
    known names; strict_compat=True mirrors that byte-for-byte,
    strict_compat=False removes exactly the matched persons."""
    text = "Ramesh Kumar filed. Ramesh spoke. Kumar agreed. Ganesh watched."
    spec = [("Ramesh Kumar", "PETITIONER"),
            ("Ramesh", "OTHER_PERSON", 1),
            ("Kumar", "OTHER_PERSON", 1),
            ("Ganesh", "OTHER_PERSON")]
    strict = pp.other_person_coref_res(_doc_with_ents(text, spec))
    fixed = pp.other_person_coref_res(_doc_with_ents(text, spec),
                                      strict_compat=False)
    assert "Ganesh" not in {s.text for s in strict}          # quirk: dropped
    fixed_by_text = {s.text: s.label for s in fixed}
    assert fixed_by_text.get("Ganesh") == "OTHER_PERSON"     # fix: survives
    # the genuinely matched persons behave the same in both modes
    for res in (strict, fixed):
        by_text = {s.text: s.label for s in res}
        assert by_text["Ramesh"] == "PETITIONER"
        assert by_text["Kumar"] == "PETITIONER"


def test_strict_compat_empty_pro_statute_guard_both_behaviors():
    """A provision whose only statute comes LATER leaves pro_statute
    empty; the reference's ``pro_statute[-1]`` probe raises and voids the
    whole doc (ok=False).  strict_compat=False guards it: postprocessing
    completes (ok=True) and the unmatchable pair is skipped."""
    text = "Section 5 applies here. The Indian Penal Code governs."
    spec = [("Section 5", "PROVISION"), ("Indian Penal Code", "STATUTE")]
    strict = pp.postprocess_doc(_doc_with_ents(text, spec))
    assert strict.ok is False                                 # quirk: voided
    fixed = pp.postprocess_doc(_doc_with_ents(text, spec),
                               strict_compat=False)
    assert fixed.ok is True                                   # fix: completes
    assert fixed.provision_statute_pairs == []


def test_strict_compat_empty_citation_precedent_absorption():
    """Two citation-less, party-less precedents: the reference's vacuous
    ``cit != None`` guard glues them into one cluster on ''==''
    (postprocessing_utils.py:109); strict_compat=False requires a real
    citation, so they stay singletons."""
    d = Doc("In re Alpha Matter. In re Beta Matter.")
    a = d.char_span(0, 18, label="PRECEDENT")
    b = d.char_span(20, 37, label="PRECEDENT")
    breakup = [(a, None, None, ''), (b, None, None, '')]
    strict = pp.create_precedent_clusters(breakup)
    assert [len(v) for v in strict.values()] == [2]           # quirk: merged
    fixed = pp.create_precedent_clusters(breakup, strict_compat=False)
    assert sorted(len(v) for v in fixed.values()) == [1, 1]   # fix: separate

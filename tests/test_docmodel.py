"""Unit tests for the span/token model — filter_spans parity is the
load-bearing behavior (SURVEY.md §7.3 'filter_spans parity')."""

from legal_ner_spark.core.docmodel import Doc, Span, filter_spans, levenshtein


def mk(doc, s, e, label="X"):
    return doc.char_span(s, e, label=label)


def test_tokenization_and_char_span_expand():
    d = Doc("Section 302 of the Indian Penal Code.")
    sp = d.char_span(0, 11, label="PROVISION")
    assert sp.text == "Section 302"
    assert len(sp) == 2
    # mid-token boundaries expand to covering tokens
    sp2 = d.char_span(2, 9, label="X")
    assert sp2.text == "Section 302"


def test_filter_spans_longest_wins():
    d = Doc("State Bank of India branch")
    long = mk(d, 0, 19)     # State Bank of India
    short = mk(d, 6, 10)    # Bank
    assert filter_spans([short, long]) == [long]


def test_filter_spans_equal_length_earlier_start_wins():
    d = Doc("alpha beta gamma")
    a = mk(d, 0, 10)   # alpha beta
    b = mk(d, 6, 16)   # beta gamma
    kept = filter_spans([b, a])
    assert kept == [a]


def test_filter_spans_full_tie_first_seen_wins():
    d = Doc("alpha beta")
    a = mk(d, 0, 10, "A")
    b = mk(d, 0, 10, "B")
    assert filter_spans([a, b])[0].label == "A"
    assert filter_spans([b, a])[0].label == "B"


def test_filter_spans_result_sorted_by_start():
    d = Doc("one two three four five")
    s3 = mk(d, 8, 13)
    s1 = mk(d, 0, 3)
    kept = filter_spans([s3, s1])
    assert [k.start_char for k in kept] == [0, 8]


def test_sentence_split_and_hard_breaks():
    d = Doc("First sentence. Second one? Third\n\nFourth block.")
    assert len(d.sents) == 4
    d2 = Doc("abcdef ghijkl", hard_breaks=(7,))
    assert len(d2.sents) == 2


def test_levenshtein():
    assert levenshtein("", "abc") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("Maharashtra", "Mahrashtra") == 1


def test_span_equality_and_hash_stable_under_relabel():
    a = Span(0, 2, 0, 10, "alpha beta", "A")
    b = Span(0, 2, 0, 10, "alpha beta", "A")
    assert a == b and hash(a) == hash(b)
    d = {a: 1}
    a.label = "B"           # reference relabels spans stored in dicts
    assert a in d           # hash ignores label
    assert a != b           # equality does not

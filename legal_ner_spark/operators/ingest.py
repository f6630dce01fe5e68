"""Ingest-normalize stage — the reference's HTML-era cleanup regexes
(data_preparation.py:175-181, 226-252) as a Catalyst `regexp_replace` chain,
plus the span-export serializations (§2.1).

At 10^12 scale ingestion happens upstream (the corpus is already in
Iceberg); this stage is the optional text-hygiene pass applied to raw text
spans before extraction, entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# order matters — mirrors the reference's sequential re.sub chain
_CLEANUP = [
    # collapse runs of whitespace except trailing (data_preparation.py:175)
    (r"\s+(?!\s*$)", " "),
    # re-insert sentence-break blank lines after . " ? (:177)
    (r"([.\"?])\n", "$1 \n\n"),
    # collapse 3+ newlines (:181 / :232)
    (r"\n{3,}", "\n\n"),
]

_FOOTERS = [
    # known footer/header patterns (data_preparation.py:239-246)
    r"http://www\.judis\.nic\.in(\s*?\x0c\s*?)?",
    r"(::: Uploaded on - \d\d/\d\d/\d\d\d\d\s+)?::: Downloaded on - .{5,50}:::",
    r"https://www\.mhc\.tn\.gov\.in/judis/(\s*?\x0c\s*?)?",
    # e-signature footer (:244-245) — the reference applies DOTALL +
    # IGNORECASE via re flags; Java regex takes them inline as (?si)
    r"(?si)Signature Not Verified Signed By:.{5,100}Signing Date:"
    r"\d\d\.\d\d\.\d\d\d\d(.{1,50}Page \d+\s*?! of \d+\s*?!\s*?\d\d:\d\d:\d\d)?",
]


def clean_judgment_text(col: Column) -> Column:
    """Whitespace/sentence-break normalization + footer removal as one
    codegen'd expression chain."""
    out = col
    for pat in _FOOTERS:
        out = F.regexp_replace(out, pat, "")
    for pat, rep in _CLEANUP:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def strip_footers(col: Column) -> Column:
    """Footer/header removal + trim ONLY — the html parse path applies
    whitespace normalization per fragment (pre exempted), so a global
    collapse here would destroy the pre layout the reference preserves
    (data_preparation.py:227: `if not ...startswith('pre_')`)."""
    out = col
    for pat in _FOOTERS:
        out = F.regexp_replace(out, pat, "")
    return F.trim(out)


# One alternative per tag kind — no backreference (`</\1>`), so the SAME
# pattern runs under Java regex (Spark) and RE2 (the DuckDB oracle).  The
# id prefix may be any of the three (the reference checks the id prefix
# independently of the tag name, data_preparation.py:214-216).
_ID = r'(?:p_|blockquote_|pre_)'
_HTML_FRAGMENT_RE = "|".join(
    rf'(?s)<{t}\b[^>]*\bid="{_ID}[^"]*"[^>]*>.*?</{t}>'
    for t in ("p", "blockquote", "pre"))
# hidden_text spans are ALWAYS dropped: check_hidden_text_is_invalid is
# constant True (data_preparation.py:194-201 — SURVEY §2.1 quirk).
# One alternative per tag kind (same backreference-free device as
# _HTML_FRAGMENT_RE, so the identical pattern runs under Java regex and
# the oracle's RE2): the close tag must NAME-match the open tag, so a
# hidden span containing nested OTHER-tag markup (<span class=
# "hidden_text">A <b>B</b> C</span>) drops whole, like BeautifulSoup.
# Known limitation: a hidden element nesting the SAME tag kind still
# stops at the inner close (regex cannot count); the trailing generic
# alternative keeps unusual tag kinds at least first-close dropped.
_HIDDEN_TAGS = ("span", "div", "p", "a", "b", "i", "u", "em", "strong",
                "font", "sup", "sub")
_HIDDEN_RE = "|".join(
    [rf'(?s)<{t}\b[^>]*\bclass="[^"]*hidden_text[^"]*"[^>]*>.*?</{t}>'
     for t in _HIDDEN_TAGS]
    + [r'(?s)<[^>]*\bclass="[^"]*hidden_text[^"]*"[^>]*>.*?</[^>]+>'])
_TAG_RE = r"<[^>]+>"
# the entity subset BeautifulSoup would unescape that occurs in judgment
# HTML; amp LAST so '&amp;lt;' does not double-unescape
_ENTITIES = [("&nbsp;", " "), ("&quot;", '"'), ("&#39;", "'"),
             ("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&")]


def _sql_str(s: str) -> str:
    """Embed a LITERAL string (no escape processing wanted)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def _sql_pat(p: str) -> str:
    """Embed a regex pattern as a SQL string literal: the SQL parser
    processes escapes, so every backslash doubles."""
    return "'" + p.replace("\\", "\\\\").replace("'", "''") + "'"


def _unescape_expr(e: str) -> str:
    for ent, rep in _ENTITIES:
        e = f"replace({e}, '{ent}', {_sql_str(rep)})"
    return e


def _strip_markup_expr(e: str) -> str:
    return (f"regexp_replace(regexp_replace({e}, {_sql_pat(_HIDDEN_RE)}, ''), "
            f"{_sql_pat(_TAG_RE)}, '')")


def _collapse_expr(e: str) -> str:
    """Non-pre fragment layout normalization (data_preparation.py:227-232):
    collapse whitespace runs except the trailing one (Java lookahead;
    the oracle uses the RE2-safe rtrim-collapse-reappend equivalent),
    sentence-break blank lines after . \" ?, then squash newline runs."""
    e = f"regexp_replace({e}, {_sql_pat(_WS_RUN_RE)}, ' ')"
    e = f"regexp_replace({e}, {_sql_pat(_SENT_BREAK_RE)}, '$1 \\n\\n')"
    e = f"regexp_replace({e}, {_sql_pat(_NL_RUN_RE)}, '\\n\\n')"
    return e


_WS_RUN_RE = r"\s+(?!\s*$)"
_SENT_BREAK_RE = r"([.\"?])\n"
_NL_RUN_RE = r"\n{2,}"


def html_fragments_expr(col_name: str) -> str:
    """SQL expression: ordered array of raw qualifying tag fragments."""
    return (f"regexp_extract_all({col_name}, "
            f"{_sql_pat(_HTML_FRAGMENT_RE)}, 0)")


def html_to_text(col_name: str = "html") -> Column:
    """Judgment text from raw IndianKanoon-style HTML — the Spark-first
    re-expression of the reference's fetch-side parse
    (data_preparation.py:202-254, minus the network GET, which at 10^12
    scale happens upstream of the Iceberg corpus):

    1. keep only ``p``/``blockquote``/``pre`` fragments whose id starts
       with ``p_``/``blockquote_``/``pre_`` (document order preserved);
    2. drop ``hidden_text`` spans (constant-True validity quirk), strip
       the remaining markup, unescape the common entities;
    3. for non-``pre`` fragments only: collapse whitespace runs (except
       trailing), re-insert sentence-break blank lines after ``. " ?``,
       collapse newline runs — ``pre`` fragments keep their layout
       (data_preparation.py:227-232);
    4. concat, strip the known footer/header patterns, trim
       (``clean_judgment_text``).

    One Catalyst expression tree over regexp/replace — per-fragment work
    runs in a ``transform`` lambda (cheap: a few regexes per fragment),
    no Python anywhere in the path."""
    pre_branch = _unescape_expr(_strip_markup_expr("x"))
    nonpre_branch = _unescape_expr(_collapse_expr(_strip_markup_expr("x")))
    assembled = (f"array_join(transform({html_fragments_expr(col_name)}, "
                 f"x -> CASE WHEN x LIKE '<pre%' THEN {pre_branch} "
                 f"ELSE {nonpre_branch} END), '')")
    return strip_footers(F.expr(assembled))


def parse_html_corpus(df: DataFrame, html_col: str = "html",
                      id_col: str = "doc_id") -> DataFrame:
    """(doc_id, html) → (doc_id, text): the batch ingest front door for
    raw crawled judgment pages."""
    return df.select(F.col(id_col).alias("doc_id"),
                     html_to_text(html_col).alias("text"))


def normalize_corpus(corpus: DataFrame) -> DataFrame:
    """Apply text hygiene to the text spans of a corpus, preserving media
    spans and span order untouched (the invariant applies to media spans;
    text content is what this stage exists to fix)."""
    return corpus.withColumn(
        "spans",
        F.expr(
            "transform(spans, s -> named_struct("
            "'kind', s.kind, "
            "'text', CASE WHEN s.kind = 'text' THEN {c} ELSE s.text END, "
            "'media_ref', s.media_ref, 'offset', s.offset))".format(
                c="trim(regexp_replace(regexp_replace(s.text, "
                  r"'\\s+(?!\\s*$)', ' '), '\\n{3,}', '\n\n'))")))


def json_span_export(mentions: DataFrame) -> DataFrame:
    """Per-entity JSON records `{start, end, text, labels[], id}`
    (data_preparation.py:264-281) — uuid4 replaced by a deterministic
    sha2(doc_id, ent_id) for reproducibility (SURVEY.md §2.1)."""
    return mentions.select(
        "doc_id",
        F.to_json(F.struct(
            F.col("start_char").alias("start"),
            F.col("end_char").alias("end"),
            F.col("text").alias("text"),
            F.array(F.col("label")).alias("labels"),
            F.sha2(F.concat_ws("|", "doc_id", "ent_id"), 256).alias("id"),
        )).alias("annotation"))

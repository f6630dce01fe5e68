"""Fuzzy entity linking: mention strings -> canonical dictionary entries.

The reference links statutes by a hand-built regex cascade
(postprocessing_utils.py:591-622 — mirrored in core/postprocess.py
STATUTE_CANON).  Regexes catch the known abbreviation families but not
misspellings or OCR noise; this operator adds the standard complementary
tier: q-gram (character trigram) Jaccard similarity against the canonical
dictionary, the classic blocking-friendly fuzzy matcher.

Scale shape: the dictionary is small (thousands of canonical entities) —
its exploded trigram table is BROADCAST; the corpus side is deduplicated
mention strings, exploded to distinct trigrams.  The only shuffle is the
(mention, candidate) partial-count aggregation, whose volume is bounded by
trigram co-occurrence (blocking), never |mentions| x |dictionary|.  The
best-candidate window partitions by mention — no global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def norm_for_match(col):
    """lower, non-alphanumeric runs -> single space, trim — identical on
    the DuckDB oracle side so trigram sets cannot drift."""
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "))


def _trigrams(ns_col: str):
    # distinct character 3-grams of the normalized string (1-based substr)
    return F.array_distinct(F.expr(
        f"transform(sequence(1, length({ns_col}) - 2),"
        f" i -> substring({ns_col}, i, 3))"))


def trigram_link(mentions: DataFrame, dictionary: DataFrame,
                 mention_col: str = "mention", entity_col: str = "entity",
                 threshold: float = 0.3) -> DataFrame:
    """Link each distinct mention string to its best dictionary entity by
    Jaccard similarity of distinct character trigrams (normalized form).

    Returns (mention, entity, score) — one row per mention that clears
    ``threshold``; ties broken by entity name ascending so the result is
    deterministic across engines and parallelism levels.  Mentions shorter
    than 3 normalized chars have no trigrams and never link (the regex
    tier owns acronyms like 'IPC')."""
    m = (mentions.select(F.col(mention_col).alias("mention")).distinct()
         .withColumn("_nm", norm_for_match(F.col("mention")))
         .filter(F.length("_nm") >= 3)
         .withColumn("_tg", _trigrams("_nm"))
         .withColumn("m_sz", F.size("_tg")))
    d = (dictionary.select(F.col(entity_col).alias("entity")).distinct()
         .withColumn("_nd", norm_for_match(F.col("entity")))
         .filter(F.length("_nd") >= 3)
         .withColumn("_tg", _trigrams("_nd"))
         .withColumn("e_sz", F.size("_tg")))
    me = m.select("mention", "m_sz", F.explode("_tg").alias("tg"))
    de = d.select("entity", "e_sz", F.explode("_tg").alias("tg"))
    inter = (me.join(F.broadcast(de), "tg")
             .groupBy("mention", "m_sz", "entity", "e_sz")
             .agg(F.count(F.lit(1)).alias("inter")))
    scored = inter.withColumn(
        "score",
        F.col("inter") / (F.col("m_sz") + F.col("e_sz") - F.col("inter")))
    w = Window.partitionBy("mention").orderBy(F.desc("score"), F.asc("entity"))
    return (scored.filter(F.col("score") >= threshold)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("mention", "entity",
                    F.round("score", 4).alias("score")))


def sorted_neighborhood_pairs(records: DataFrame, key_col: str,
                              id_col: str, window: int = 3,
                              max_edit: int = 3) -> DataFrame:
    """Sorted-neighborhood entity resolution (Hernández & Stolfo '95):
    records sorted by a normalized key; each record is compared only to
    its ``window`` lexical successors; survivors are pairs with edit
    distance ≤ ``max_edit``.

    The global LEXICAL rank is computed WITHOUT a global sort: the
    2-char prefix of the normalized key is itself a lexical range, so
    rank = row_number within the prefix bucket + the cumulative count of
    lexically-earlier buckets (the tiny bucket-totals table again).
    Neighbor candidates come from an equi-join on rank÷window blocks
    (each left row probes its own and the next block — every pair at
    distance ≤ window falls in one of the two), so the plan is
    projection + two hash joins, never a rank-range theta join.  Skew
    bound: a prefix bucket holds at most the records sharing 2 leading
    chars — for name data, orders of magnitude below corpus size
    (document and cap like lsh max_bucket if an adversarial corpus
    concentrates)."""
    from pyspark.sql import Window as W
    r = (records.select(F.col(id_col).alias("rid"),
                        F.col(key_col).alias("key")).distinct()
         .withColumn("nk", norm_for_match(F.col("key")))
         .filter(F.length("nk") > 0)
         .withColumn("_b", F.substring("nk", 1, 2)))
    btot = r.groupBy("_b").agg(F.count(F.lit(1)).alias("cnt"))
    wb = W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
    boff = btot.withColumn("off", F.coalesce(F.sum("cnt").over(wb),
                                             F.lit(0)))
    wl = W.partitionBy("_b").orderBy("nk", "rid")
    ranked = (r.join(F.broadcast(boff.select("_b", "off")), "_b")
              .withColumn("rank", F.row_number().over(wl) + F.col("off"))
              .select("rid", "key", "nk", "rank"))
    left = ranked.select(F.col("rid").alias("id_a"),
                         F.col("key").alias("key_a"),
                         F.col("nk").alias("nk_a"),
                         F.col("rank").alias("ra"),
                         F.explode(F.array(
                             F.floor(F.col("rank") / window),
                             F.floor(F.col("rank") / window) + 1))
                         .alias("blk"))
    right = ranked.select(F.col("rid").alias("id_b"),
                          F.col("key").alias("key_b"),
                          F.col("nk").alias("nk_b"),
                          F.col("rank").alias("rb"),
                          F.floor(F.col("rank") / window).alias("blk"))
    cand = (left.join(right, "blk")
            .filter((F.col("rb") > F.col("ra"))
                    & (F.col("rb") - F.col("ra") <= window))
            .drop("blk").distinct())
    return (cand.filter(F.levenshtein("nk_a", "nk_b") <= max_edit)
            .select("id_a", "id_b", "key_a", "key_b",
                    F.levenshtein("nk_a", "nk_b").cast("int")
                    .alias("edit_distance")))

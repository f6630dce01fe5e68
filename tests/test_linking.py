"""Fuzzy entity linking (trigram-Jaccard) + stratified sampling."""

from pyspark.sql import functions as F

from legal_ner_spark.operators import linking, textprep


def _dict_df(spark):
    return spark.createDataFrame(
        [("Indian Penal Code",), ("Criminal Procedure Code",),
         ("Income Tax Act",), ("Motor Vehicle Act",)], "entity string")


def test_trigram_link_typos_link_junk_does_not(spark):
    m = spark.createDataFrame(
        [("Indain Penal Code",), ("Income-Tax Act 1961",),
         ("Bananas Act",), ("ipc",)], "mention string")
    out = {r.mention: r for r in
           linking.trigram_link(m, _dict_df(spark)).collect()}
    assert out["Indain Penal Code"].entity == "Indian Penal Code"
    assert out["Income-Tax Act 1961"].entity == "Income Tax Act"
    assert "Bananas Act" not in out          # below threshold
    assert "ipc" not in out                  # < 3 normalized chars

def test_trigram_link_exact_match_scores_one_and_ties_break_by_name(spark):
    m = spark.createDataFrame([("Income Tax Act",)], "mention string")
    d = spark.createDataFrame(
        [("Income Tax Act",), ("Income Tax Act Amendment",)], "entity string")
    rows = linking.trigram_link(m, d, threshold=0.1).collect()
    assert len(rows) == 1                     # best-1 per mention
    assert rows[0].entity == "Income Tax Act" and rows[0].score == 1.0


def test_trigram_link_parallelism_invariant(spark):
    m = spark.createDataFrame(
        [(f"Indian Penal Code {i}",) for i in range(50)]
        + [("Motor Vehical Act",)], "mention string")
    a = linking.trigram_link(m, _dict_df(spark)).orderBy("mention").collect()
    b = (linking.trigram_link(m.repartition(17), _dict_df(spark))
         .orderBy("mention").collect())
    assert a == b


def test_stratified_sample_quota_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 10 else "fr") for i in range(200)],
        "doc_id bigint, lang string")
    s = textprep.stratified_sample(df, "lang", "doc_id", 5)
    counts = {r.lang: r.n for r in
              s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 5, "fr": 5}
    s2 = textprep.stratified_sample(df.repartition(7), "lang", "doc_id", 5)
    assert sorted(map(tuple, s.collect())) == sorted(map(tuple, s2.collect()))
    # stratum smaller than k: returned whole, never padded
    tiny = spark.createDataFrame([(1, "de"), (2, "de")],
                                 "doc_id bigint, lang string")
    assert textprep.stratified_sample(tiny, "lang", "doc_id", 5).count() == 2


def test_mixture_sample_upsamples_tail(spark):
    """alpha=0.5: the tail stratum's sampled share exceeds its raw share."""
    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id bigint, lang string")
    s = textprep.mixture_sample(df, "lang", "doc_id", 100, alpha=0.5)
    got = {r.lang: r.n for r in
           s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # raw share of 'small' is 10%; sqrt weights give 10/(30+10) = 25%
    assert got["small"] / (got["small"] + got["big"]) > 0.15
    # alpha=1 reproduces the raw proportions
    s1 = textprep.mixture_sample(df, "lang", "doc_id", 100, alpha=1.0)
    got1 = {r.lang: r.n for r in
            s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got1["small"] <= 10


def test_hash_split_stable_under_insertion(spark):
    """An id's split never changes when other rows appear — the property
    that makes hash splits leak-proof across dataset versions."""
    a = spark.createDataFrame([(i,) for i in range(100)], "doc_id bigint")
    b = spark.createDataFrame([(i,) for i in range(500)], "doc_id bigint")
    sa = {r.doc_id: r.split for r in
          textprep.hash_split(a, "doc_id").collect()}
    sb = {r.doc_id: r.split for r in
          textprep.hash_split(b, "doc_id").collect()}
    assert all(sb[k] == v for k, v in sa.items())
    from collections import Counter
    c = Counter(sb.values())
    assert c["train"] > c["valid"] and c["train"] > c["test"]
    assert set(c) == {"train", "valid", "test"}


def test_sorted_neighborhood_window_and_verify(spark):
    from legal_ner_spark.operators import linking
    rows = [("r1", "Madhu Limaye vs State"),
            ("r2", "Madhu Limaye v. State"),      # adjacent, edit 0 after norm? no: 'vs' vs 'v'
            ("r3", "Madhu Limaye versus State"),  # nearby, larger edit
            ("r4", "Zoltan Varga vs Union"),      # far in sort order
            ("r5", "Zoltan Varga vs Union")]      # exact dup of r4
    df = spark.createDataFrame(rows, "rid string, name string")
    out = linking.sorted_neighborhood_pairs(
        df, key_col="name", id_col="rid", window=2, max_edit=4)
    got = {frozenset((r.id_a, r.id_b)): r.edit_distance
           for r in out.collect()}
    assert got[frozenset(("r1", "r2"))] == 1       # 'vs' ↔ 'v'
    assert got[frozenset(("r4", "r5"))] == 0       # exact dup
    assert got[frozenset(("r1", "r3"))] == 4       # 'vs' ↔ 'versus'
    assert frozenset(("r2", "r3")) not in got      # edit 5 > max_edit
    assert not any(p >= {"r4", "r1"} for p in got)  # far apart in order
    # parallelism invariance
    out2 = linking.sorted_neighborhood_pairs(
        df.repartition(7), key_col="name", id_col="rid",
        window=2, max_edit=4)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, out2.collect()))


def test_sorted_neighborhood_empty_and_singleton(spark):
    from legal_ner_spark.operators import linking
    empty = spark.createDataFrame([], "rid string, name string")
    assert linking.sorted_neighborhood_pairs(
        empty, key_col="name", id_col="rid").count() == 0
    one = spark.createDataFrame([("r1", "Solo Case")], "rid string, name string")
    assert linking.sorted_neighborhood_pairs(
        one, key_col="name", id_col="rid").count() == 0
    # keys that normalize to empty are dropped, not paired
    junk = spark.createDataFrame([("r1", "!!!"), ("r2", "???")],
                                 "rid string, name string")
    assert linking.sorted_neighborhood_pairs(
        junk, key_col="name", id_col="rid").count() == 0


def test_mixture_sample_single_stratum_and_empty(spark):
    from legal_ner_spark.operators import textprep
    one = spark.createDataFrame([(i, "en") for i in range(30)],
                                "doc_id bigint, lang string")
    s = textprep.mixture_sample(one, "lang", "doc_id", 10)
    assert s.count() == 10                      # whole quota to one stratum
    empty = spark.createDataFrame([], "doc_id bigint, lang string")
    assert textprep.mixture_sample(empty, "lang", "doc_id", 10).count() == 0

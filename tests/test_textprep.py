"""Training-corpus prep operators: contamination, PII redaction, shard
packing (distributed prefix-sum correctness vs a plain Python cumsum)."""

from pyspark.sql import functions as F

from legal_ner_spark.operators import textprep


def test_contamination_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(0, "the quick brown fox sat still"),          # shares 2 shingles
         (1, "completely unrelated content entirely here")],
        ["doc_id", "text"])
    got = {r.doc_id: (r.n_hits, r.contamination)
           for r in textprep.contamination(docs, bench, n=3).collect()}
    assert got[0][0] == 2 and got[0][1] > 0
    assert got[1] == (0, 0.0)


def test_pii_redact_counts_and_text(spark):
    docs = spark.createDataFrame(
        [(0, "mail a.b@c.org and dial 1234567 now"),
         (1, "clean text 12345")],
        ["doc_id", "text"])
    rows = {r.doc_id: r for r in textprep.pii_redact(docs).collect()}
    assert rows[0].clean_text == "mail <EMAIL> and dial <NUM> now"
    assert rows[0].n_emails == 1 and rows[0].n_numbers == 1
    assert rows[1].clean_text == "clean text 12345"   # 5 digits: below cutoff
    assert rows[1].n_emails == 0 and rows[1].n_numbers == 0


def test_pii_redact_is_case_insensitive(spark):
    """A PII scrubber that only matches lowercase leaks the PII it claims
    to remove — uppercase/mixed-case emails must redact fully."""
    docs = spark.createDataFrame(
        [(0, "Reach John.Doe@Example.COM today")], ["doc_id", "text"])
    row = textprep.pii_redact(docs).collect()[0]
    assert row.clean_text == "Reach <EMAIL> today"
    assert row.n_emails == 1


def test_prepare_training_corpus_composition(spark):
    """quality filter drops junk, dedup keeps the lowest doc_id, shard
    packing runs over survivors only."""
    good = "clean words " * 30
    docs = spark.createDataFrame(
        [(0, good), (1, good),                      # dup pair: keep 0
         (2, "?!#. ..! ,,"),                        # junk: quality ~0
         (3, "another perfectly clean document " * 10)],
        ["doc_id", "text"])
    out = {r.doc_id: r for r in textprep.prepare_training_corpus(
        docs, min_quality=0.3, token_budget=50, bucket_size=10).collect()}
    assert set(out) == {0, 3}                       # 1 deduped, 2 filtered
    assert out[0].quality >= 0.3 and out[3].quality >= 0.3
    assert out[0].shard_id == 0 and out[3].shard_id >= 1


def test_pack_shards_property_random_sizes(spark):
    """Distributed prefix-sum == serial cumsum for arbitrary token counts,
    budgets, and bucket sizes (including bucket_size > n_docs and
    budget smaller than one doc)."""
    import random
    rng = random.Random(3)
    for trial in range(3):
        n = rng.randint(1, 120)
        budget = rng.choice([7, 50, 1000])
        bucket = rng.choice([1, 8, 500])
        toks = [rng.randint(1, 30) for _ in range(n)]
        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * toks[i])) for i in range(n)],
            ["doc_id", "text"])
        got = {r.doc_id: r.shard_id for r in textprep.pack_shards(
            docs, token_budget=budget, bucket_size=bucket).collect()}
        cum = 0
        for i in range(n):
            assert got[i] == cum // budget, (trial, i, budget, bucket)
            cum += toks[i]


def test_pack_shards_matches_serial_cumsum(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (5 + i % 7))) for i in range(250)],
        ["doc_id", "text"])
    got = {r.doc_id: (r.n_tokens, r.shard_id)
           for r in textprep.pack_shards(
               docs, token_budget=100, bucket_size=32).collect()}
    cum = 0
    for i in range(250):
        n = 5 + i % 7
        assert got[i] == (n, cum // 100), (i, got[i], cum)
        cum += n
    # shards are contiguous in doc_id order and ~budget-sized
    shard_ids = [got[i][1] for i in range(250)]
    assert shard_ids == sorted(shard_ids)
    assert shard_ids[-1] == (cum - (5 + 249 % 7)) // 100


def test_pack_shards_raises_on_non_numeric_ids(spark):
    """Non-castable doc_ids must RAISE, not silently drop rows (silent
    loss is the wrong failure mode for a training-data pipeline)."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException
    bad = spark.createDataFrame(
        [("1", "alpha beta"), ("doc-x", "gamma delta")], ["doc_id", "text"])
    with pytest.raises((Py4JJavaError, PySparkException)) as ei:
        textprep.pack_shards(bad, token_budget=10, bucket_size=2).collect()
    assert "pack_shards" in str(ei.value)

def _mix_docs(spark, n=400):
    rows = [(i, f"text {i}", ["en", "de", "zh"][i % 3]) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_sample_corpus_deterministic_and_stratified(spark):
    """Same input + salt ⇒ identical sample; rates steer strata
    independently (rate 0 drops the stratum entirely, rate 1 keeps it)."""
    docs = _mix_docs(spark)
    rates = {"en": 1.0, "de": 0.5, "zh": 0.0}
    a = textprep.sample_corpus(docs, rates, salt="s").collect()
    b = textprep.sample_corpus(docs, rates, salt="s").collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
    by_stratum = {}
    for r in a:
        by_stratum.setdefault(r.stratum, set()).add(r.doc_id)
    assert len(by_stratum.get("en", set())) == 134          # all of en
    assert "zh" not in by_stratum                           # rate 0
    n_de = len(by_stratum.get("de", set()))
    assert 0 < n_de < 133                                   # strictly sampled


def test_sample_corpus_prefix_property(spark):
    """Sampling at r2 < r1 with the same salt selects an exact SUBSET of
    the r1 sample (threshold prefix) — the property that makes mixture
    reweighting replayable without the original corpus."""
    docs = _mix_docs(spark)
    big = {r.doc_id for r in textprep.sample_corpus(
        docs, {"en": 0.8, "de": 0.8, "zh": 0.8}, salt="s").collect()}
    small = {r.doc_id for r in textprep.sample_corpus(
        docs, {"en": 0.3, "de": 0.3, "zh": 0.3}, salt="s").collect()}
    assert small < big


def test_sample_corpus_salt_gives_independent_samples(spark):
    docs = _mix_docs(spark)
    rates = {"en": 0.5, "de": 0.5, "zh": 0.5}
    a = {r.doc_id for r in textprep.sample_corpus(docs, rates, salt="x").collect()}
    b = {r.doc_id for r in textprep.sample_corpus(docs, rates, salt="y").collect()}
    assert a != b                     # different split identities
    assert a and b


def test_sample_corpus_plan_has_no_exchange(spark):
    """The sampler must stay a scan-local projection+filter: any Exchange
    in the plan would mean the mixing primitive shuffles 10^12 rows."""
    docs = _mix_docs(spark, n=50)
    plan = (textprep.sample_corpus(docs, {"en": 0.5}, salt="s")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan[:2000]


def test_bm25_matches_hand_computed_scores(spark):
    """4-doc fixture where every BM25 ingredient (tf, df, dl, avgdl, the
    Lucene idf) is computed independently in Python and compared to 4
    decimals; also checks the no-match doc is absent and ranking order."""
    import math
    from legal_ner_spark.operators import search
    rows = [
        (0, "join join merge alpha beta"),        # dl 5: join tf2, merge tf1
        (1, "join gamma delta epsilon"),          # dl 4: join tf1
        (2, "merge merge merge zeta"),            # dl 4: merge tf3
        (3, "nothing relevant here at all okay"), # dl 6: no match
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.bm25
           for r in search.bm25_topk(docs, ["join", "merge"], k=10)
           .collect()}
    n, avgdl, k1, b = 4, 19 / 4, 1.2, 0.75
    idf = {"join": math.log((n - 2 + 0.5) / (2 + 0.5) + 1),
           "merge": math.log((n - 2 + 0.5) / (2 + 0.5) + 1)}

    def s(tf, dl, t):
        return idf[t] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp = {0: round(s(2, 5, "join") + s(1, 5, "merge"), 4),
           1: round(s(1, 4, "join"), 4),
           2: round(s(3, 4, "merge"), 4)}
    assert got == exp
    ordered = sorted(got, key=lambda d: (-got[d], d))
    assert ordered[0] == 0   # two terms + tf 2 must outrank single hits


def test_bm25_topk_cut_is_deterministic(spark):
    """k smaller than the hit count must keep the highest rounded scores
    with doc_id as the tie-break (cross-engine reproducible cut)."""
    from legal_ner_spark.operators import search
    rows = [(i, "join filler" + " pad" * (i % 3)) for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = search.bm25_topk(docs, ["join"], k=4).collect()
    assert len(out) == 4
    scores = [r.bm25 for r in out]
    assert scores == sorted(scores, reverse=True)
    # identical (score, doc_id) ordering on a re-run
    again = search.bm25_topk(docs, ["join"], k=4).collect()
    assert [(r.doc_id, r.bm25) for r in out] == \
        [(r.doc_id, r.bm25) for r in again]


def test_check_constraints_counts_planted_violations(spark):
    """Planted dirty rows must be counted per check with exact rates,
    and the whole row-local battery must stay a single-scan aggregate
    (no Exchange of data rows in the plan)."""
    from legal_ner_spark.operators import quality
    rows = [(1, "ok", 5), (2, "", 7), (None, "ok", -1), (4, None, 0)]
    df = spark.createDataFrame(rows, ["id", "txt", "v"])
    out = {r.check_name: (r.n_violations, r.violation_rate)
           for r in quality.check_constraints(df, {
               "id_null": F.col("id").isNull(),
               "txt_empty": F.col("txt").isNull()
                            | (F.length("txt") == 0),
               "v_negative": F.col("v") < 0,
           }).collect()}
    assert out == {"id_null": (1, 0.25), "txt_empty": (2, 0.5),
                   "v_negative": (1, 0.25)}


def test_check_unique_excess_copies(spark):
    from legal_ner_spark.operators import quality
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,), (3,)], ["k"])
    r = quality.check_unique(df, ["k"]).collect()[0]
    # 3 copies of 1 (+2 excess) and 2 of 3 (+1) over 6 rows
    assert (r.check_name, r.n_violations, r.violation_rate) \
        == ("unique_k", 3, 0.5)
    clean = quality.check_unique(
        spark.createDataFrame([(1,), (2,)], ["k"]), ["k"]).collect()[0]
    assert (clean.n_violations, clean.violation_rate) == (0, 0.0)


def test_text_index_serves_identically_and_prunes_partitions(spark,
                                                             tmp_path):
    """The materialized inverted index must (a) serve the exact same
    top-k as the inline scorer and (b) read ONLY the query terms' hash
    buckets — PartitionFilters on bucket in the postings scan."""
    from legal_ner_spark.operators import search
    rows = [(i, f"join merge alpha{i % 7} beta{i % 5} gamma pad pad")
            for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    path = str(tmp_path / "tidx")
    search.build_text_index(docs, path, n_buckets=16)
    inline = [(r.doc_id, r.bm25)
              for r in search.bm25_topk(docs, ["join", "gamma"], k=15)
              .collect()]
    served_df = search.query_text_index(spark, path, ["join", "gamma"],
                                        k=15, n_buckets=16)
    assert [(r.doc_id, r.bm25) for r in served_df.collect()] == inline
    plan = served_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan[:2000]
    pf = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "bucket" in pf, pf


def test_text_index_append_compact_equals_rebuild(spark, tmp_path):
    """Incremental BM25: build over batch 1, append batches 2 and 3 —
    the segmented index must serve EXACTLY what a rebuilt index (and
    the inline scorer) serve, because tf/dl/df/(n_docs, avgdl) all fold
    across segments; a replayed batch_tag replaces its segment;
    compaction changes no answer and keeps partition pruning; appends
    keep working after the flip."""
    from legal_ner_spark.operators import search
    rows = [(i, f"join merge alpha{i % 7} beta{i % 5} gamma pad pad")
            for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    b1 = docs.filter("doc_id < 80")
    b2 = docs.filter("doc_id >= 80 and doc_id < 140")
    b3 = docs.filter("doc_id >= 140")
    want = [(r.doc_id, r.bm25)
            for r in search.bm25_topk(docs, ["join", "gamma"], k=15)
            .collect()]

    path = str(tmp_path / "tidx")
    search.build_text_index(b1, path, n_buckets=16)
    search.append_text_index(b2, path, n_buckets=16)
    for _ in range(2):  # replay: same tag overwrites, not doubles
        search.append_text_index(b3, path, batch_tag="b3")

    def served():
        return [(r.doc_id, r.bm25)
                for r in search.query_text_index(
                    spark, path, ["join", "gamma"], k=15).collect()]

    assert served() == want
    man = search.compact_text_index(spark, path)
    assert man["snapshot"] and len(man["segments"]) == 1
    assert served() == want
    # pruning still reaches the compacted postings scan
    df = search.query_text_index(spark, path, ["join", "gamma"], k=15)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in \
        plan.split("PartitionFilters")[1].splitlines()[0]
    # still appendable after the flip: re-adding nothing changes nothing
    search.append_text_index(b3.limit(0), path)
    assert served() == want


def test_profile_table_counts_nulls_distincts_and_types(spark):
    """Planted nulls and duplicates must show up exactly; min/max render
    for string and integral columns, NULL for doubles (float formatting
    is not engine-portable)."""
    from legal_ner_spark.operators.quality import profile_table
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "a", None), (3, None, 1.0), (3, "bb", 1.0)],
        "k bigint, s string, x double")
    prof = {r.col_name: r for r in profile_table(df).collect()}
    assert prof["k"].n_rows == 4 and prof["k"].n_nulls == 0
    assert prof["k"].n_distinct == 3
    assert (prof["k"].min_s, prof["k"].max_s) == ("1", "3")
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    assert (prof["s"].min_s, prof["s"].max_s) == ("a", "bb")
    assert prof["s"].avg_len == round((1 + 1 + 2) / 3, 4)
    assert prof["x"].n_distinct == 2
    assert prof["x"].min_s is None and prof["x"].avg_len is None


def test_weighted_sample_favors_weight_and_is_reproducible(spark):
    """A 100x-weight group must dominate the draw, the draw must be
    identical run to run (md5 uniforms, not RNG state), and k rows come
    back whenever enough positive-weight rows exist."""
    from pyspark.sql import functions as F
    from legal_ner_spark.operators.textprep import weighted_sample
    df = spark.range(4000).select(
        F.col("id"),
        F.when(F.col("id") < 2000, 1.0).otherwise(100.0).alias("w"))
    got1 = sorted(r.id for r in weighted_sample(df, "w", "id",
                                                k=200).collect())
    got2 = sorted(r.id for r in weighted_sample(df, "w", "id",
                                                k=200).collect())
    assert got1 == got2 and len(got1) == 200
    heavy = sum(1 for i in got1 if i >= 2000)
    assert heavy >= 180
    # zero/negative weights are never drawn
    df0 = df.withColumn("w", F.when(F.col("id") % 2 == 0, -1.0)
                        .otherwise(0.0))
    assert weighted_sample(df0, "w", "id", k=10).count() == 0


def test_chunk_windows_coverage_and_overlap(spark, tmp_path):
    """Every token position is covered; consecutive chunks overlap by
    window - stride; a short doc yields exactly one whole-doc chunk."""
    import os
    from legal_ner_spark import queries
    long_text = " ".join(f"t{i}" for i in range(150))
    short_text = "a b c"
    df = spark.createDataFrame([(1, long_text, "en", "s", 1),
                                (2, short_text, "en", "s", 1)],
                               "doc_id bigint, text string, lang string,"
                               " source string, n_chars bigint")
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = queries.QUERIES["chunk_windows"](spark, d).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == short_text
    cs = sorted(by_doc[1], key=lambda r: r.chunk_ix)
    # 150 tokens, W=64, S=48 -> chunks at 0/48/96: 1+ceil((150-64)/48)=3
    assert [c.chunk_ix for c in cs] == [0, 1, 2]
    assert cs[0].n_tokens == 64 and cs[-1].n_tokens == 150 - 96
    # coverage: union of [ix*48, ix*48+n) covers [0, 150)
    covered = set()
    for c in cs:
        covered.update(range(c.chunk_ix * 48, c.chunk_ix * 48 + c.n_tokens))
    assert covered == set(range(150))
    # overlap: chunk 1 starts 16 tokens before chunk 0 ends
    assert cs[0].chunk_text.split()[48:] == cs[1].chunk_text.split()[:16]


def test_curation_pipeline_each_gate_fires(spark):
    """Planted corpus where every curation stage drops exactly one doc:
    20 is non-English (no stop-token mass), 21 is too low quality
    (punctuation soup), 23 duplicates 22's token SET (order shuffled —
    the fingerprint gate, keeper = lower id), 24 is a verbatim copy of
    the benchmark doc (contamination 1.0), and 25 survives everything.
    Stage features on the survivors must match hand computation."""
    base = "the quick brown fox jumps over a lazy dog in the sunny park"
    rows = [
        (0, base),                                        # benchmark doc
        (20, "lorem ipsum dolor sit amet consectetur adipiscing elit " * 3),
        (21, "!!!!!!!!! " * 12 + "the a"),   # quality 0.019 < 0.1
        (22, "the court held that a statute applies to the appeal today"),
        (23, "today the appeal applies that a statute held to the court"),
        (24, base),
        (25, "the judge ruled on a motion and the case is closed now"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in textprep.curation_pipeline(
        docs.filter("doc_id >= 20"), docs.filter("doc_id < 20"),
        ["the", "a", "of", "and", "to", "in", "is", "on"],
        min_quality=0.1).collect()}
    assert set(out) == {22, 25}
    r22 = out[22]
    assert r22.n_tokens == 11
    assert abs(r22.stop_ratio - round(4 / 11, 4)) < 1e-9
    assert abs(r22.quality - 0.11) < 1e-9    # least(11/100,1) * (1 - 0)
    assert r22.contamination == 0.0
    # 25 shares zero 3-gram shingles with the benchmark despite common
    # stopwords (3-grams need three consecutive shared tokens)
    assert out[25].contamination == 0.0


def test_curation_pipeline_short_doc_contamination_zero(spark):
    """A surviving doc shorter than the shingle width has no shingles;
    it must come through with contamination 0, not be dropped by the
    left-join (the no-shingle edge the composition pins)."""
    rows = [(0, "the quick brown fox jumps"),
            (20, "the a")]  # 2 tokens < shingle width 3: zero shingles
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = textprep.curation_pipeline(
        docs.filter("doc_id >= 20"), docs.filter("doc_id < 20"),
        ["the", "a", "of", "and", "to", "in", "is", "on"],
        min_quality=0.0).collect()
    assert len(out) == 1 and out[0].doc_id == 20
    assert out[0].contamination == 0.0


def test_gopher_rules_each_rule_fires(spark):
    """One doc per rule violation + one clean doc; every per-rule verdict
    and the conjunction must identify exactly its target."""
    long_clean = " ".join(
        ["the cattle and a doggie always sitting with that carpet "
         "to be of usefulness in here"] * 3)
    docs = spark.createDataFrame(
        [(0, long_clean),                            # passes everything
         (1, "the a of to and short"),               # < min_words
         (2, "the of " + "x " * 58),                 # mean word len < 3
         (3, long_clean + " ### ... ### ... ### ... ### ... ### ..."),
         (4, "the of " + "1234 " * 58),              # alpha frac < 0.8
         (5, "zz yy xx ww vv " * 12)],               # no stopwords
        ["doc_id", "text"])
    rows = {r.doc_id: r for r in textprep.gopher_rules(
        docs, min_words=30).collect()}
    assert rows[0].pass_all == 1
    assert rows[1].r_word_count == 0 and rows[1].pass_all == 0
    assert rows[2].r_mean_word_len == 0 and rows[2].pass_all == 0
    assert rows[3].r_symbol_ratio == 0 and rows[3].pass_all == 0
    assert rows[4].r_alpha_words == 0 and rows[4].pass_all == 0
    assert rows[5].r_stopwords == 0 and rows[5].pass_all == 0
    # features are measured, not just gated
    assert rows[1].n_words == 6
    assert rows[5].stop_hits == 0 and rows[0].stop_hits >= 2


def test_dsir_weights_prefer_target_like_docs(spark):
    """A doc drawn from the target phrase scores strictly above an
    off-distribution doc of the same length; n_grams = 2·len − 1
    (unigrams + bigrams)."""
    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta " * 8) for i in range(4)],
        ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta alpha beta gamma delta"),
         (1, "zeta eta theta iota kappa lambda mu nu")],
        ["doc_id", "text"])
    w = {r.doc_id: r for r in textprep.dsir_weights(docs, target).collect()}
    assert w[0].logw > w[1].logw
    assert w[0].n_grams == 2 * 8 - 1 and w[1].n_grams == 2 * 8 - 1


def test_dsir_resample_gumbel_topk_deterministic(spark):
    """k rows, a subset of the weight table, identical across runs, and
    biased toward the target-like half of the corpus."""
    # target large enough that real counts dominate the alpha*B smoothing
    # mass (the docstring's distributional-estimate requirement)
    target = spark.createDataFrame(
        [(1000 + i, "alpha beta gamma delta epsilon " * 6)
         for i in range(40)],
        ["doc_id", "text"])
    rows = ([(i, "alpha beta gamma delta epsilon " * 4)
             for i in range(20)]
            + [(i, f"noise{i} junk{i} other{i} words{i} stray{i} " * 4)
               for i in range(20, 40)])
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got1 = textprep.dsir_resample(docs, target, k=10).collect()
    got2 = textprep.dsir_resample(docs, target, k=10).collect()
    assert [r.doc_id for r in got1] == [r.doc_id for r in got2]
    assert len(got1) == 10
    picked = {r.doc_id for r in got1}
    assert len(picked & set(range(20))) >= 8   # exp(logw) gap dominates
    keys = [r.gumbel_key for r in got1]
    assert keys == sorted(keys, reverse=True)


def test_gopher_repetition_interval_union_exact(spark):
    """Hand-computed fixtures: full coverage, partial overlap union
    (chars under several duplicated grams count once), and a clean doc."""
    docs = spark.createDataFrame(
        [(0, "a b c a b c a b c"),   # every 3-gram duplicated: union = all
         (1, "p q p q p q x"),       # dup 3-grams cover [0,11) of 13 chars
         (2, "alpha beta gamma delta epsilon")],   # no repetition
        ["doc_id", "text"])
    rows = {r.doc_id: r for r in textprep.gopher_repetition(
        docs, top_n=2, dup_n=3).collect()}
    assert rows[0].dup_ngram_frac == 1.0
    # top 2-gram: "a b" and "b c" both x3, len 3; gram-desc tie-break
    assert rows[0].top_ngram_frac == round(3 * 3 / 17, 4)
    # union of [0,5) [2,7) [4,9) [6,11) = 11 chars of 13
    assert rows[1].dup_ngram_frac == round(11 / 13, 4)
    assert rows[2].dup_ngram_frac == 0.0 and rows[2].r_dup_ngram == 1
    assert rows[0].pass_all == 0 and rows[0].r_dup_ngram == 0


def test_bounded_topk_equals_stratified_sample(spark):
    """skew.bounded_topk_per_key is output-IDENTICAL to
    stratified_sample (same md5 rank key, same id tie-break) on uniform
    keys, on a 90%-one-key skew, and when k exceeds a group."""
    from legal_ner_spark.operators.skew import bounded_topk_per_key
    base = (spark.range(4000)
            .withColumn("key", F.when(F.col("id") % 10 < 9, F.lit("hot"))
                        .otherwise((F.col("id") % 13).cast("string"))))
    for df, k in ((base, 37), (base.filter("id < 40"), 37)):
        a = textprep.stratified_sample(df, "key", "id", k, salt="bt")
        b = bounded_topk_per_key(df, "key", "id", k, salt="bt")
        ra = sorted((r.key, r.id) for r in a.collect())
        rb = sorted((r.key, r.id) for r in b.collect())
        assert ra == rb and ra


def test_source_quota_sample_caps_per_source(spark):
    """Exactly quota docs per source survive (fewer iff the source is
    smaller), and the draw is deterministic across runs."""
    docs = spark.createDataFrame(
        [(i, f"src{i % 3}" if i < 30 else "src_small")
         for i in range(32)], ["doc_id", "source"])
    out = textprep.source_quota_sample(docs, quota=4)
    per = {r.source: r.n for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {"src0": 4, "src1": 4, "src2": 4, "src_small": 2}
    again = sorted(r.doc_id for r in
                   textprep.source_quota_sample(docs, quota=4).collect())
    assert again == sorted(r.doc_id for r in out.collect())


def test_quality_classifier_paths_equal_and_gate_splits(spark):
    """The zero-shuffle hash-weight path and the broadcast trained-
    weights path (weights = the materialized default table) score every
    doc identically; the 0.5 gate splits a real corpus both ways; an
    empty-text doc still scores (token [''], no NaN)."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(120)
    a = textprep.quality_classifier(docs)
    w = textprep.default_classifier_weights(spark)
    b = textprep.quality_classifier(docs, weights=w)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) == 120
    keeps = {r.keep for r in a.collect()}
    assert keeps == {0, 1}
    empty = spark.createDataFrame([(7, "")], ["doc_id", "text"])
    r = textprep.quality_classifier(empty).collect()[0]
    assert r.n_tokens == 1 and r.score == r.score  # not NaN

"""Training-corpus preparation operators (beyond the reference surface).

Three ops every large-scale training-data pipeline needs in front of a
tokenizer, all pure DataFrame / JVM-side:

- ``contamination`` — flag corpus docs sharing word n-gram shingles with a
  benchmark/eval set.  The benchmark side is tiny by construction (eval
  sets are thousands of docs, the corpus is 10^12) → distinct benchmark
  shingles broadcast; the corpus side never shuffles.
- ``pii_redact`` — regex redaction of emails / long digit runs with
  per-doc hit counts; a pure projection (whole-stage codegen, no shuffle).
- ``pack_shards`` — deterministic token-budget shard assignment via a
  distributed prefix-sum: per-bucket token totals get an exclusive
  running offset, docs get a bucket-local cumulative sum under a window
  partitioned by bucket.  The per-doc cumsum never runs globally; the
  ONE remaining global ordering is over the bucket-totals table
  (|corpus| / bucket_size rows), so ``bucket_size`` is the scale knob:
  at 10^12 docs set it ~10^6 so the totals table (~10^6 rows) fits a
  single task comfortably — or recurse the same construction once more
  for another 10^6x headroom.  Precondition: ``doc_id`` castable to
  bigint (non-numeric ids null out of the bucket join and would be
  silently dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingle_rows

EMAIL_RE = r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
LONGNUM_RE = r"\d{6,}"


def contamination(docs: DataFrame, benchmark: DataFrame, n: int = 3,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc count + ratio of word n-gram shingles that also occur in
    ``benchmark``.  ONE pass over the corpus-side shingle table: left join
    against the broadcast distinct benchmark shingles (map-side, no
    shuffle of the big side), then a single groupBy(doc_id) computing both
    the total and the hit count — the 10^12-doc side is shuffled exactly
    once.  Docs with fewer than ``n`` tokens have no shingles and are
    absent from the output (same as the SQL oracle)."""
    bench_sh = (shingle_rows(benchmark, id_col=id_col, text_col=text_col, n=n)
                .select("shingle").distinct()
                .withColumn("hit", F.lit(1)))
    doc_sh = shingle_rows(docs, id_col=id_col, text_col=text_col, n=n)
    return (doc_sh.join(F.broadcast(bench_sh), "shingle", "left")
            .groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_shingles"),
                 F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint")
                 .alias("n_hits"))
            .withColumn("contamination",
                        F.round(F.col("n_hits") / F.col("n_shingles"), 4))
            .select("doc_id", "n_shingles", "n_hits", "contamination"))


def sample_corpus(docs: DataFrame, rates: dict[str, float],
                  strat_col: str = "lang", id_col: str = "doc_id",
                  default_rate: float = 0.0, salt: str = "") -> DataFrame:
    """Deterministic hash-stratified sampling — the data-MIXING primitive
    of a training-corpus pipeline (per-language / per-source keep rates,
    e.g. upweight en, downsample crawl dupes).

    keep ⇔ md5(salt ∥ doc_id) first-8-hex-digits, as an integer mod 1e6,
    < rate(stratum)·1e6.  Three properties a `rand()` sample lacks, all
    load-bearing at 10^12 docs:

    - **reproducible under retry/resume** — the keep decision is a pure
      function of the row, so a recomputed task (or a resumed run over
      remaining partitions, plans/ledger.py) selects the identical set;
    - **composable** — sampling at r1 then r2 with the same salt yields
      exactly the min(r1, r2) sample (prefix property of the threshold),
      so mixture reweighting never needs the original corpus;
    - **zero-shuffle** — a constant-folded CASE over the stratum column +
      a filter: stays inside one WholeStageCodegen span of the scan, no
      exchange, trivially 100 TB-safe.

    Distinct ``salt`` values give independent samples (held-out splits).
    Emits (doc_id, stratum, sample_key) for audit; sample_key ∈ [0, 1e6).
    """
    rate_expr = F.lit(float(default_rate))
    for value, rate in sorted(rates.items()):
        rate_expr = F.when(F.col(strat_col) == value,
                           F.lit(float(rate))).otherwise(rate_expr)
    key = (F.conv(F.substring(F.md5(F.concat(F.lit(salt),
                                             F.col(id_col).cast("string"))),
                              1, 8), 16, 10)
           .cast("bigint") % 1_000_000)
    return (docs.withColumn("sample_key", key)
            .filter(F.col("sample_key") < rate_expr * 1_000_000)
            .select(F.col(id_col).alias("doc_id"),
                    F.col(strat_col).alias("stratum"), "sample_key"))


def pii_redact(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Redact emails and ≥6-digit runs; emit hit counts for monitoring.
    Pure projection — Catalyst keeps it inside one codegen span."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_replace(F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
                         LONGNUM_RE, "<NUM>").alias("clean_text"),
        # lit-pattern form, not expr(): a backslash inside a SQL string
        # literal would be eaten by the SQL parser before reaching the regex
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
        .cast("int").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(LONGNUM_RE), F.lit(0)))
        .cast("int").alias("n_numbers"))


def prepare_training_corpus(docs: DataFrame, min_quality: float = 0.3,
                            token_budget: int = 2000,
                            bucket_size: int = 100,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """The composed training-data front door: quality filter → exact-dedup
    (keep the lowest doc_id per content hash) → token-budget shard
    packing over the survivors.  One content-hash shuffle (the dedup
    window) + the pack_shards prefix-sum machinery; everything else is
    map-side.  Returns (doc_id, quality, n_tokens, shard_id)."""
    n_tok = F.size(F.split(text_col, " "))
    punct = F.length(F.regexp_replace(text_col, "[a-z0-9 ]", ""))
    scored = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(text_col).alias("text"),
        F.round(F.least(n_tok / F.lit(100.0), F.lit(1.0))
                * (1 - punct / F.length(text_col)), 4).alias("quality"))
    kept = scored.filter(F.col("quality") >= min_quality)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (kept.withColumn("_rn", F.row_number().over(w))
               .filter("_rn = 1").drop("_rn"))
    packed = pack_shards(deduped, token_budget=token_budget,
                         bucket_size=bucket_size, id_col="doc_id",
                         text_col="text")
    return (packed.join(deduped.select("doc_id", "quality"), "doc_id")
            .select("doc_id", "quality", "n_tokens", "shard_id"))


def pack_shards(docs: DataFrame, token_budget: int = 2000,
                bucket_size: int = 100, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Assign each doc to a training shard so shards hold ~``token_budget``
    whitespace tokens, preserving doc_id order (shard_id = start-offset
    div budget — the streaming-packing approximation of bin packing).

    Distributed prefix-sum: bucket = doc_id div ``bucket_size``; the
    global cumulative offset is computed once over the per-bucket totals
    (a table ``bucket_size``× smaller than the corpus) and broadcast back;
    the per-doc cumsum window is partitioned by bucket.

    ``doc_id`` must cast to bigint (the packing order is numeric).  A
    non-castable or null id RAISES instead of silently nulling out of the
    bucket join — silent row loss is the wrong failure mode for a
    training-data pipeline; corpora with opaque string ids should first
    assign a numeric ordering key (e.g. zipWithIndex at ingest or a
    monotonic Iceberg sequence) and pack on that."""
    # try_cast + explicit raise: uniform loud failure whether or not the
    # deployment runs ANSI mode (a plain cast silently nulls with ANSI off)
    casted = F.col(id_col).try_cast("bigint")
    toks = docs.select(
        F.when(casted.isNull(),
               F.raise_error(F.concat(
                   F.lit(f"pack_shards: {id_col} not castable to bigint: "),
                   F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")))))
        .otherwise(casted).alias("doc_id"),
        F.size(F.split(text_col, r"\s+")).cast("bigint").alias("n_tokens"))
    toks = toks.withColumn(
        "bucket", F.floor(F.col("doc_id") / bucket_size).cast("bigint"))
    btot = toks.groupBy("bucket").agg(F.sum("n_tokens").alias("btot"))
    wb = (Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1))
    boff = btot.withColumn(
        "boffset", F.coalesce(F.sum("btot").over(wb), F.lit(0)))
    w = (Window.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (toks.join(F.broadcast(boff.select("bucket", "boffset")), "bucket")
            .withColumn("cum", F.col("boffset") + F.sum("n_tokens").over(w))
            .select("doc_id", "n_tokens",
                    F.floor((F.col("cum") - F.col("n_tokens")) / token_budget)
                    .cast("bigint").alias("shard_id")))


def weighted_sample(df: DataFrame, weight_col: str, id_col: str,
                    k: int, salt: str = "ws1") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): rank key = ln(u)/w with u an md5-derived uniform in
    (0,1) — u^(1/w) order-equivalent — and take the top k.  Inclusion
    probability tracks the weight (the data-mixing knob: sample long /
    high-quality docs more), and because u comes from the same
    engine-neutral hash family as `sample_corpus`, the draw is
    reproducible under retry/resume and replayable by the DuckDB oracle.
    Plan shape: projection + TakeOrderedAndProject — no shuffle beyond
    the top-k collect; rows with weight ≤ 0 are excluded (ln(u)/w would
    flip sign).  Ties (impossible-in-practice equal keys) break on the
    id for full determinism."""
    u = ((F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        1, 8), 16, 10).cast("double") + 1.0) / 4294967297.0)
    key = F.log(u) / F.col(weight_col).cast("double")
    return (df.filter(F.col(weight_col) > 0)
            .withColumn("__k", key)
            .orderBy(F.desc("__k"), F.col(id_col))
            .limit(k)
            .drop("__k"))


def stratified_sample(df: DataFrame, strata_col: str, id_col: str,
                      k_per_stratum: int, salt: str = "ss1") -> DataFrame:
    """Deterministic stratified sampling: k rows per stratum, ranked by an
    md5-derived uniform on the id (same engine-neutral hash family as
    `sample_corpus` / `weighted_sample`, so draws are reproducible under
    retry/resume and replayable by the DuckDB oracle).  The data-balance
    primitive for training mixes — equal per-language / per-source quotas
    regardless of raw corpus skew.

    Plan shape: one window partitioned by the stratum (per-group
    TopK, no global sort); a mega-stratum is still one partition's
    window — for pathological 90%-one-language corpora, pre-salt the
    stratum and re-rank, as in skew.salted_topk."""
    u = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(u, F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k_per_stratum)
            .drop("_rn"))


def mixture_sample(df: DataFrame, strata_col: str, id_col: str,
                   k_total: int, alpha: float = 0.5,
                   salt: str = "mx1") -> DataFrame:
    """Temperature-based mixture sampling (the multilingual-LM data-mix
    rule, alpha<1 upsamples tail strata relative to their raw share):
    stratum quota ∝ count^alpha, floored at 1, then the per-stratum
    draw uses the md5 uniform.  The quota table is tiny (one row per
    stratum) — its normalizing sum is a window over that table and the
    result is broadcast-joined back; the corpus side sees exactly one
    per-stratum window, no global sort."""
    cnt = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_c"))
    quota = (cnt.withColumn("_w", F.pow("_c", F.lit(alpha)))
             .withColumn("_wsum", F.sum("_w").over(
                 Window.rowsBetween(Window.unboundedPreceding,
                                    Window.unboundedFollowing)))
             .select(strata_col,
                     F.greatest(F.lit(1), F.floor(
                         F.lit(k_total) * F.col("_w") / F.col("_wsum")))
                     .cast("int").alias("_quota")))
    u = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(u, F.col(id_col))
    return (df.join(F.broadcast(quota), strata_col)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= F.col("_quota"))
            .drop("_rn", "_quota"))


def hash_split(df: DataFrame, id_col: str,
               weights: tuple[int, int, int] = (80, 10, 10),
               salt: str = "sp1") -> DataFrame:
    """Deterministic train/valid/test assignment by hash bucket — the
    split survives re-runs, insertions, and engine swaps because it
    depends only on (salt, id), never on row order or a seed stream.
    Pure projection: no shuffle at all."""
    train, valid, _ = weights
    b = F.pmod(F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        1, 8), 16, 10).cast("bigint"), F.lit(100))
    return df.withColumn(
        "split",
        F.when(b < train, "train")
         .when(b < train + valid, "valid")
         .otherwise("test"))


def curation_pipeline(docs: DataFrame, benchmark: DataFrame,
                      stopwords: list[str],
                      min_stop_ratio: float = 0.05,
                      min_quality: float = 0.3,
                      max_contamination: float = 0.2, n: int = 3,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """The composed pre-training curation flow in ONE call — the
    CCNet/FineWeb recipe (Wenzek et al. 2020; Penedo et al. 2024) as a
    single declarative plan: language gate → quality gate →
    order-insensitive fingerprint dedup → benchmark decontamination.
    Returns the curated-corpus manifest: one row per SURVIVING doc with
    the per-stage features (n_tokens, stop_ratio, quality,
    contamination) a curation run logs next to its thresholds.

    Stage order matters and mirrors production: cheap projections
    (lang, quality) first so the shuffling stages (fingerprint groupBy,
    contamination shingle join) see only survivors; dedup BEFORE
    decontamination so a contaminated keeper cannot shadow a clean
    duplicate.  Keeper = lowest doc_id per fingerprint among stage-2
    survivors.

    Scale shape: stages 1-2 are whole-stage-codegen projections; stage
    3 shuffles 32-byte fingerprints once; stage 4 is the broadcast
    decontamination join (corpus side shuffles once, on doc_id, for the
    per-doc aggregate).  Docs shorter than ``n`` tokens have no
    shingles and count as contamination 0 (nothing to overlap).  All
    gate columns are 4-dp-rounded BEFORE comparison so engine float
    noise cannot flip a boundary doc between Spark and the oracle."""
    toks = F.split(F.lower(text_col), " ")
    stop = F.array([F.lit(s) for s in stopwords])
    n_tok = F.size(toks)
    punct = F.length(F.regexp_replace(text_col, "[a-z0-9 ]", ""))
    featured = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"),
        n_tok.cast("int").alias("n_tokens"),
        # NOT array_intersect: a stopword's every occurrence counts
        # (the lang heuristic is a token-mass ratio, not a set ratio)
        F.round(
            F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
            / n_tok, 4).alias("stop_ratio"),
        F.round(F.least(n_tok / F.lit(100.0), F.lit(1.0))
                * (1 - punct / F.length(text_col)), 4).alias("quality"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
        .alias("fp"))
    gated = featured.filter(
        (F.col("stop_ratio") >= min_stop_ratio)
        & (F.col("quality") >= min_quality))
    keepers = gated.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    deduped = (gated.join(keepers, "fp")
               .filter(F.col("doc_id") == F.col("keeper"))
               .drop("fp", "keeper"))
    cont = contamination(deduped.select("doc_id", "text"), benchmark,
                         n=n, id_col="doc_id", text_col="text")
    return (deduped.join(cont.select("doc_id", "contamination"),
                         "doc_id", "left")
            .withColumn("contamination",
                        F.coalesce("contamination", F.lit(0.0)))
            .filter(F.col("contamination") < max_contamination)
            .select("doc_id", "n_tokens", "stop_ratio", "quality",
                    "contamination"))


GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in",
                    "be", "that", "have", "with")


def gopher_rules(docs: DataFrame,
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word: float = 3.0, max_mean_word: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 min_alpha_word_frac: float = 0.8,
                 min_stop_hits: int = 2,
                 stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Gopher repetition-free quality rules (Rae et al. 2021, §A1.1 —
    the rule set MassiveText/RefinedWeb/FineWeb descend from), as ONE
    whole-stage-codegen projection: word-count bounds, mean-word-length
    band, symbol-to-word ratio (``#`` and ``...``), fraction of words
    containing an alphabetic character, and the ≥``min_stop_hits``
    distinct-stopword requirement.  Emits every measured feature, every
    per-rule verdict (int 0/1 — engine-portable), and the conjunction
    ``pass_all`` — a curation run logs the per-rule failure tallies,
    not just the survivor set, so each threshold can be audited.

    Scale shape: pure projection over the corpus scan — no shuffle, no
    UDF, trivially 100 TB-safe; thresholds are constant-folded.  All
    ratio features are 4-dp-rounded BEFORE comparison so engine float
    noise cannot flip a boundary doc between Spark and the oracle."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    n_words = F.size(toks)
    mean_wl = F.round(
        F.length(F.regexp_replace(F.col(text_col), " ", "")) / n_words, 4)
    n_sym = (F.size(F.split(F.col(text_col), "#", -1)) - 1
             + F.size(F.split(F.col(text_col), r"\.\.\.", -1)) - 1)
    sym_ratio = F.round(n_sym / n_words, 4)
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / n_words, 4)
    stop = F.array([F.lit(s) for s in stopwords])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), stop))
    out = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        n_words.cast("int").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.cast("int").alias("stop_hits"))
    rules = {
        "r_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "r_mean_word_len": (F.col("mean_word_len") >= min_mean_word)
        & (F.col("mean_word_len") <= max_mean_word),
        "r_symbol_ratio": F.col("symbol_ratio") <= max_symbol_ratio,
        "r_alpha_words": F.col("alpha_word_frac") >= min_alpha_word_frac,
        "r_stopwords": F.col("stop_hits") >= min_stop_hits,
    }
    for name, cond in rules.items():
        out = out.withColumn(name, cond.cast("int"))
    return out.withColumn(
        "pass_all",
        F.least(*[F.col(n) for n in rules]).alias("pass_all"))


def _hashed_grams(docs: DataFrame, n_buckets: int, id_col: str,
                  text_col: str, salt: str) -> DataFrame:
    """(doc_id, bucket) rows — one per unigram and bigram occurrence,
    hashed into ``n_buckets`` via the engine-neutral md5 idiom (DSIR's
    hashed n-gram feature map, Xie et al. 2023 §3).  Exploding is the
    shingle-table shape every dedup operator here already lives under."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    base = docs.select(F.col(id_col).cast("bigint").alias("doc_id"),
                       toks.alias("ts"))
    uni = base.select("doc_id", F.explode("ts").alias("g"))
    big = (base.select(
        "doc_id",
        F.explode(F.arrays_zip(
            F.slice("ts", 1, F.size("ts") - 1),
            F.slice("ts", 2, F.size("ts") - 1))).alias("bg"))
        .select("doc_id", F.concat_ws(" ", F.col("bg.0"),
                                      F.col("bg.1")).alias("g")))
    grams = uni.unionByName(big)
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col("g"))),
                           1, 8), 16, 10).cast("bigint"),
        F.lit(n_buckets))
    return grams.select("doc_id", bucket.cast("int").alias("bucket"))


def dsir_weights(docs: DataFrame, target: DataFrame,
                 n_buckets: int = 256, smoothing: float = 1.0,
                 id_col: str = "doc_id", text_col: str = "text",
                 salt: str = "dsir") -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw doc by
    how target-like its hashed n-gram bag is —
    ``logw(x) = Σ_b c_x(b)·(ln p_target(b) − ln p_raw(b))`` with
    Laplace-smoothed bucket probabilities.  The standard way to carve a
    domain-matched training subset out of a general crawl.

    Scale shape: both bucket distributions are ``n_buckets``-row
    aggregates (tiny at any corpus size) broadcast onto the raw gram
    rows together with the 1-row totals frame; the corpus side shuffles
    exactly ONCE — the final per-doc sum.  The raw distribution is
    estimated from ``docs`` itself (the paper's raw pool); pass a
    pre-sampled frame for either side at 10^12 docs — the estimator
    only needs distributional, not exhaustive, counts.  ``logw`` is
    4-dp-rounded so resampling thresholds replay identically in the
    oracle.

    Estimator caveat: the Laplace mass is ``smoothing·n_buckets``
    phantom counts — a target with far fewer grams than that is mostly
    phantom and the ranking degenerates toward the raw distribution.
    Keep target gram count ≫ n_buckets (or shrink ``smoothing``)."""
    feat = _hashed_grams(docs, n_buckets, id_col, text_col, salt)
    tfeat = _hashed_grams(target, n_buckets, id_col, text_col, salt)
    c_r = feat.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    c_t = tfeat.groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    n_r = feat.agg(F.count(F.lit(1)).alias("nr"))
    n_t = tfeat.agg(F.count(F.lit(1)).alias("nt"))
    b = float(n_buckets)
    s = float(smoothing)
    scored = (feat.join(F.broadcast(c_r), "bucket")
              .join(F.broadcast(c_t), "bucket", "left")
              .crossJoin(F.broadcast(n_r)).crossJoin(F.broadcast(n_t))
              .withColumn("ct", F.coalesce("ct", F.lit(0)))
              .withColumn(
                  "term",
                  F.log((F.col("ct") + s) / (F.col("nt") + s * b))
                  - F.log((F.col("cr") + s) / (F.col("nr") + s * b))))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_grams"),
                 F.round(F.sum("term"), 4).alias("logw")))


def dsir_resample(docs: DataFrame, target: DataFrame, k: int,
                  n_buckets: int = 256, smoothing: float = 1.0,
                  id_col: str = "doc_id", text_col: str = "text",
                  salt: str = "dsir") -> DataFrame:
    """DSIR's second half — sample ``k`` docs WITHOUT replacement with
    probability ∝ exp(logw), via the Gumbel-top-k trick (Xie et al.
    2023 §3.2; Kool et al. 2019): key = logw + Gumbel(0,1), take the k
    largest.  The Gumbel noise is an md5-derived uniform on (salt,
    doc_id) — the same engine-neutral hash family as every sampler here
    — so the draw is reproducible under retry/resume and replayable by
    the oracle.  Plan shape: dsir_weights + a projection +
    TakeOrderedAndProject; no extra shuffle.  The key is computed from
    the ROUNDED logw and itself 4-dp-rounded (doc_id tie-break) so both
    engines rank identically."""
    w = dsir_weights(docs, target, n_buckets=n_buckets,
                     smoothing=smoothing, id_col=id_col,
                     text_col=text_col, salt=salt)
    u = ((F.conv(F.substring(
        F.md5(F.concat(F.lit(salt + "-g"), F.col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("double") + 1.0) / 4294967297.0)
    key = F.round(F.col("logw") - F.log(-F.log(u)), 4)
    return (w.withColumn("gumbel_key", key)
            .orderBy(F.desc("gumbel_key"), F.asc("doc_id"))
            .limit(k))


def gopher_repetition(docs: DataFrame, top_n: int = 2, dup_n: int = 5,
                      max_top_frac: float = 0.20,
                      max_dup_frac: float = 0.15,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Gopher repetition rules (Rae et al. 2021 §A1.1, the half
    ``gopher_rules`` doesn't cover): fraction of characters contained in
    the most common ``top_n``-gram, and fraction of characters covered
    by ``dup_n``-grams that occur more than once — the latter EXACT, by
    unioning the duplicated grams' character intervals per doc (a char
    under several duplicated grams counts once, the published
    MassiveText/datatrove semantics), not the count×len over-estimate.

    Shape: one posexplode of the token stream; token char offsets, the
    n-gram texts (``lead`` chains), and the interval union (sort by
    start, running max of end, sum the uncovered gap) are all windows
    partitioned by doc_id — bounded by document length, the same bound
    every per-doc operator here lives under; the corpus shuffles once
    on doc_id.  Fractions are 4-dp-rounded before the threshold
    comparison."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    base = (docs.select(F.col(id_col).cast("bigint").alias("doc_id"),
                        F.length(text_col).alias("n_chars"),
                        F.posexplode(toks).alias("pos", "tok")))
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    # char offset of token i = sum of (len+1) of tokens before it
    off = base.withColumn(
        "start",
        F.coalesce(F.sum(F.length("tok") + 1).over(
            wdoc.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)))

    def grams(n: int) -> DataFrame:
        g = F.concat_ws(" ", *[F.lead("tok", i).over(wdoc) if i else
                               F.col("tok") for i in range(n)])
        e = (F.lead("start", n - 1).over(wdoc)
             + F.lead(F.length("tok"), n - 1).over(wdoc))
        return (off.withColumn("gram", g).withColumn("gend", e)
                .filter(F.col("gend").isNotNull())
                .select("doc_id", "n_chars", "gram",
                        "start", F.col("gend").alias("end")))

    top = (grams(top_n)
           .groupBy("doc_id", "n_chars", "gram")
           .agg(F.count(F.lit(1)).alias("c"))
           .groupBy("doc_id", "n_chars")
           .agg(F.max(F.struct(F.col("c"),
                               F.length("gram").alias("gl"),
                               F.col("gram"))).alias("m"))
           .select("doc_id",
                   F.round(F.col("m.c") * F.col("m.gl") / F.col("n_chars"),
                           4).alias("top_ngram_frac")))
    dgrams = grams(dup_n)
    dups = (dgrams.groupBy("doc_id", "gram")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter("c > 1").select("doc_id", "gram"))
    wiv = Window.partitionBy("doc_id").orderBy("start", "end")
    covered = (dgrams.join(dups, ["doc_id", "gram"])
               .withColumn("pmax",
                           F.coalesce(F.max("end").over(
                               wiv.rowsBetween(Window.unboundedPreceding,
                                               -1)), F.lit(0)))
               .withColumn("gain",
                           F.greatest(F.lit(0),
                                      F.col("end")
                                      - F.greatest("pmax", "start")))
               .groupBy("doc_id")
               .agg(F.sum("gain").alias("dup_chars")))
    return (docs.select(F.col(id_col).cast("bigint").alias("doc_id"),
                        F.length(text_col).alias("n_chars"))
            .join(top, "doc_id", "left")
            .join(covered, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("top_ngram_frac", F.lit(0.0))
                    .alias("top_ngram_frac"),
                    F.round(F.coalesce("dup_chars", F.lit(0))
                            / F.col("n_chars"), 4).alias("dup_ngram_frac"))
            .withColumn("r_top_ngram",
                        (F.col("top_ngram_frac") <= max_top_frac)
                        .cast("int"))
            .withColumn("r_dup_ngram",
                        (F.col("dup_ngram_frac") <= max_dup_frac)
                        .cast("int"))
            .withColumn("pass_all", F.least("r_top_ngram", "r_dup_ngram")))


def source_quota_sample(docs: DataFrame, quota: int,
                        source_col: str = "source",
                        id_col: str = "doc_id",
                        salt: str = "sq1") -> DataFrame:
    """Per-domain quota cap — the crawl-curation standard (C4/RefinedWeb
    keep at most N pages per host so boilerplate-heavy mega-domains
    don't dominate the mix): keep the ``quota`` docs per source whose
    md5(salt||id) uniform ranks smallest.  Semantically identical to
    ``stratified_sample(docs, source, id, quota)`` — and pinned to it by
    test — but routed through ``skew.bounded_topk_per_key`` so the ONE
    property that defines this workload, a pathologically hot domain,
    cannot produce a straggler window: per-(source, radix-cell) prefix
    sums decide whole cells and only the boundary cell is ranked."""
    from .skew import bounded_topk_per_key
    return bounded_topk_per_key(docs, source_col, id_col, quota, salt=salt)


def quality_classifier(docs: DataFrame, n_buckets: int = 1024,
                       bias: float = 0.0, threshold: float = 0.5,
                       weights: DataFrame | None = None,
                       id_col: str = "doc_id", text_col: str = "text",
                       salt: str = "qcls") -> DataFrame:
    """FastText-style hashed bag-of-words linear quality scorer — the
    model-based filtering stage of modern curation stacks (CCNet's
    fastText LM filter; FineWeb-Edu's classifier gate), as pure Spark
    SQL: every token hashes to one of ``n_buckets`` feature buckets,
    the doc's score is sigmoid(mean bucket weight + bias), and
    ``keep = score ≥ threshold``.

    Weights: by default each bucket's weight is a deterministic
    md5-derived value in [−1, 1] — a stand-in with the exact production
    plan shape, since training a real classifier is out of scope here.
    Pass ``weights`` (bucket:int, w:double — a trained model exported
    to a ``n_buckets``-row table) to score with real coefficients: that
    path explodes tokens and broadcast-joins the weight table (still no
    corpus-side shuffle until the per-doc sum).  The two paths are
    pinned equal by test when ``weights`` materializes the default
    hash-weights.

    Scale shape, default path: ONE whole-stage projection — bucket
    hash, weight derivation, and the per-doc mean all run inside
    ``transform``/``aggregate`` lambdas over the token array, so the
    corpus is scanned once with zero exchanges (the same
    zero-shuffle-gate shape as ``gopher_rules``).  The margin is
    4-dp-rounded before the sigmoid and the score after it, so engine
    float noise cannot flip a threshold-boundary doc vs the oracle."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    b = float(n_buckets)

    def bucket_of(t: F.Column) -> F.Column:
        return F.pmod(
            F.conv(F.substring(F.md5(F.concat(F.lit(salt + "-b"), t)),
                               1, 8), 16, 10).cast("bigint"),
            F.lit(int(b))).cast("int")

    def hash_weight(bucket: F.Column) -> F.Column:
        u = (F.conv(F.substring(
            F.md5(F.concat(F.lit(salt + "-w"), bucket.cast("string"))),
            1, 8), 16, 10).cast("double") / 4294967295.0)
        return u * 2.0 - 1.0

    if weights is None:
        ws = F.transform(toks, lambda t: hash_weight(bucket_of(t)))
        margin = F.round(
            F.aggregate(ws, F.lit(0.0), lambda a, x: a + x)
            / F.size(toks) + F.lit(bias), 4)
        scored = docs.select(F.col(id_col).cast("bigint").alias("doc_id"),
                             F.size(toks).cast("int").alias("n_tokens"),
                             margin.alias("margin"))
    else:
        tok_rows = (docs.select(F.col(id_col).cast("bigint").alias("doc_id"),
                                F.explode(toks).alias("t"))
                    .select("doc_id", bucket_of(F.col("t")).alias("bucket")))
        # LEFT join + weight 0 for buckets absent from a partial model:
        # an inner join would silently drop those tokens from BOTH the
        # sum and the n_tokens denominator — the wrong failure mode for
        # a gate (a sparse model would quietly score on a shrunken doc)
        scored = (tok_rows.join(F.broadcast(weights), "bucket", "left")
                  .groupBy("doc_id")
                  .agg(F.count(F.lit(1)).cast("int").alias("n_tokens"),
                       F.round(F.sum(F.coalesce("w", F.lit(0.0)))
                               / F.count(F.lit(1))
                               + F.lit(bias), 4).alias("margin")))
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))), 4)
    return (scored.withColumn("score", score)
            .withColumn("keep",
                        (F.col("score") >= threshold).cast("int")))


def default_classifier_weights(spark, n_buckets: int = 1024,
                               salt: str = "qcls") -> DataFrame:
    """The default hash-weights of ``quality_classifier`` materialized
    as the (bucket, w) table a TRAINED model would export — the swap
    point, and the fixture that pins the two scoring paths equal."""
    u = (F.conv(F.substring(
        F.md5(F.concat(F.lit(salt + "-w"), F.col("bucket").cast("string"))),
        1, 8), 16, 10).cast("double") / 4294967295.0)
    return (spark.range(n_buckets)
            .select(F.col("id").cast("int").alias("bucket"))
            .withColumn("w", u * 2.0 - 1.0))

"""Scale anchor for the curation gates: gopher_rules, gopher_repetition,
and dsir_weights over a ~1M-doc synthetic corpus at local[32].

What it evidences (BENCH.md carries the committed row):

- the zero-shuffle gates (gopher_rules) run at scan speed — wall is the
  corpus scan plus a count, so docs/s here IS the projection ceiling;
- gopher_repetition's per-doc windows stay bounded: wall grows linearly
  with docs, no straggler task (every doc is ~60 tokens);
- dsir_weights' two 256-bucket distribution aggregates stay tiny while
  the gram table (uni+bigrams, ~120 rows/doc) shuffles exactly once.

Corpus (deterministic, generated distributed — the driver never holds
it): doc i = 60 tokens drawn by xxhash64(doc_id, position) from a
25-word vocabulary (pseudo-random, so the repetition gate fires on the
natural collision rate instead of a periodic artifact), ~6 sources;
target for DSIR = the src0 slice (~1/6 of the corpus), matching the
registry query's shape.

Usage: python tools/stress_curation.py [n_docs]
Prints one JSON line.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

VOCAB_SIZE = 25
N_TOK = 60


def main() -> None:
    from pyspark.sql import functions as F

    from legal_ner_spark.operators import textprep
    from legal_ner_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    spark = get_spark(master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    # distributed deterministic corpus: token t of doc i is vocabulary
    # word (i*31 + t*17) % VOCAB (plus stopwords so the gates split)
    vocab = F.array(*[F.lit(w) for w in
                      (["the", "a", "of", "to", "and"]
                       + [f"word{k}" for k in range(VOCAB_SIZE - 5)])])
    docs = (spark.range(0, n_docs, 1, 128)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit("src"),
                             (F.col("id") % 6).cast("string")).alias("source"),
                    F.array_join(
                        F.transform(
                            F.sequence(F.lit(0), F.lit(N_TOK - 1)),
                            lambda t: F.element_at(
                                vocab,
                                (F.pmod(F.xxhash64(F.col("id"), t),
                                        F.lit(VOCAB_SIZE)) + 1)
                                .cast("int"))),
                        " ").alias("text")))
    docs.persist().count()   # materialize once; time the operators alone

    out = {"n_docs": n_docs}
    t0 = time.time()
    n_pass = (textprep.gopher_rules(docs, min_words=30)
              .filter("pass_all = 1").count())
    out["gopher_rules_s"] = round(time.time() - t0, 1)
    out["gopher_pass"] = n_pass

    t0 = time.time()
    n_rep = (textprep.gopher_repetition(docs, top_n=2, dup_n=3)
             .filter("pass_all = 1").count())
    out["gopher_repetition_s"] = round(time.time() - t0, 1)
    out["repetition_pass"] = n_rep

    t0 = time.time()
    w = textprep.dsir_weights(docs, docs.filter("source = 'src0'"))
    agg = w.agg(F.count("*").alias("n"), F.round(F.avg("logw"), 4)
                .alias("mean_logw")).collect()[0]
    out["dsir_weights_s"] = round(time.time() - t0, 1)
    out["dsir_rows"] = agg["n"]
    out["dsir_mean_logw"] = float(agg["mean_logw"])

    t0 = time.time()
    n_keep = (textprep.quality_classifier(docs)
              .filter("keep = 1").count())
    out["quality_classifier_s"] = round(time.time() - t0, 1)
    out["classifier_keep"] = n_keep

    total = (out["gopher_rules_s"] + out["gopher_repetition_s"]
             + out["dsir_weights_s"] + out["quality_classifier_s"])
    out["total_s"] = round(total, 1)
    out["docs_per_s_all_four"] = int(4 * n_docs / total)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""spark-submit entry point for the KG construction pipeline.

Cluster usage (north_rule deployment shape):

    zip -r legal_ner_spark.zip legal_ner_spark
    spark-submit --py-files legal_ner_spark.zip jobs/run_pipeline.py \
        --corpus  <iceberg-or-parquet path>   # omit to synthesize
        --out     <output path>               # records + _ledger + triples
        --buckets 256                         # resume granularity
        --tasks-per-core 6                    # CPU-split sizing

The job is resumable: re-submitting with the same --out skips completed
buckets via the lineage ledger (plans/ledger.py).  Model weights (production
spaCy pipeline) ship via --archives and load lazily per executor; the
sandbox build uses the deterministic tagger, which needs nothing.
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None,
                    help="corpus parquet path (doc_id, spans); synthesized when omitted")
    ap.add_argument("--n-docs", type=int, default=1000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--tasks-per-core", type=int, default=6)
    ap.add_argument("--master", default=None)
    ap.add_argument("--no-carry-spans", action="store_true",
                    help="JVM-side text assembly; spans never cross the "
                         "Arrow boundary (+16%% — use when the corpus "
                         "table remains the span store)")
    args = ap.parse_args()

    from legal_ner_spark.session import get_spark
    from legal_ner_spark import pipeline
    from legal_ner_spark.plans import ledger
    from legal_ner_spark.operators import extract as ops

    # local-mode robustness when launched from outside the repo root: the
    # driver's sys.path insert does not reach Python WORKERS — point them
    # at the repo explicitly.  Cluster deployments ship the package via
    # --py-files instead (Spark distributes and pathes it per executor).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark(app_name="legal-ner-kg", master=args.master,
                      extra_conf={"spark.executorEnv.PYTHONPATH": repo_root})
    cores = spark.sparkContext.defaultParallelism
    if args.corpus:
        # no repartition here: run_with_resume sizes each bucket job's own
        # splits (an outer repartition would just add a second full-corpus
        # shuffle before the per-bucket one)
        corpus = spark.read.parquet(args.corpus)
    else:
        corpus = pipeline.synthetic_corpus(
            spark, args.n_docs, partitions=cores * args.tasks_per_core)

    processed = ledger.run_with_resume(corpus, args.out,
                                       n_buckets=args.buckets,
                                       tasks_per_core=args.tasks_per_core,
                                       carry_spans=not args.no_carry_spans)
    records = ledger.read_all_records(spark, args.out)
    triples_path = os.path.join(args.out, "triples")
    (ops.triples(records).write.mode("overwrite")
     .partitionBy("pred").parquet(triples_path))
    summary = {
        "buckets_processed_this_run": processed,
        "n_records": records.count(),
        "n_triples": spark.read.parquet(triples_path).count(),
        "ledger": {k: v["n_records"]
                   for k, v in ledger.completed_buckets(args.out).items()},
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()

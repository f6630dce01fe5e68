"""Hot-domain stress for the per-key top-k pair: the naive single
window (``stratified_sample`` — one task sorts the hot key's entire
population) vs ``skew.bounded_topk_per_key`` (radix-cell prefix sums;
only the boundary cell is ranked).

Corpus (deterministic, generated distributed): ``n_rows`` docs, 90% in
ONE source — the shape a boilerplate-heavy mega-domain gives a crawl —
the rest spread over 64 small sources.  Both operators keep the same
``quota`` docs per source; the outputs are asserted identical before
the walls are reported, so the comparison is semantics-preserving by
construction.

Usage: python tools/stress_quota.py [n_rows] [quota]
Prints one JSON line (BENCH.md carries the committed row).
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    from pyspark.sql import functions as F

    from legal_ner_spark.operators import textprep
    from legal_ner_spark.operators.skew import bounded_topk_per_key
    from legal_ner_spark.session import get_spark

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    quota = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    spark = get_spark(master="local[32]", app_name="stress-quota")

    docs = (spark.range(n_rows)
            .withColumn(
                "source",
                F.when(F.pmod(F.xxhash64("id"), F.lit(10)) < 9, F.lit("hot"))
                .otherwise(F.concat(F.lit("s"),
                                    F.pmod(F.xxhash64("id", F.lit(1)),
                                           F.lit(64)).cast("string")))))

    def wall(fn):
        t0 = time.time()
        n = fn().count()
        return round(time.time() - t0, 1), n

    naive_s, n_naive = wall(
        lambda: textprep.stratified_sample(docs, "source", "id", quota,
                                           salt="sq"))
    bounded_s, n_bounded = wall(
        lambda: bounded_topk_per_key(docs, "source", "id", quota,
                                     salt="sq"))
    a = textprep.stratified_sample(docs, "source", "id", quota, salt="sq") \
        .select("source", "id")
    b = bounded_topk_per_key(docs, "source", "id", quota, salt="sq") \
        .select("source", "id")
    identical = (a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty())

    print(json.dumps({
        "n_rows": n_rows, "quota": quota,
        "kept_naive": n_naive, "kept_bounded": n_bounded,
        "identical_output": identical,
        "naive_window_sec": naive_s,
        "bounded_topk_sec": bounded_s,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

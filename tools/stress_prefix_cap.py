"""Volume stress for the prefix-filter HOT-POSTING cap (VERDICT r3 ask
#1's measured leg): a template-heavy corpus where the boilerplate block
is so large relative to the unique tail that COMMON shingles reach the
rarity prefixes — every doc shares the same few prefix shingles, so the
prefix self-join gets postings as wide as the corpus.

Corpus: n_docs of 60 boilerplate tokens + 10 unique tokens (5-gram
shingles: 56 common + 10 per-doc; prefix length 14 > 10 unique, so 4
corpus-wide shingles sit in EVERY prefix).  Pairwise Jaccard =
56/76 = 0.737 < 4/5, so the TRUE answer is ZERO pairs — all candidate
work is pruning work (the positional filter kills every hot-posting
candidate: common tokens sit at prefix tails), the worst case for the
join shape:

  uncapped   : ~5 posting cells of n_docs² candidate rows each — a
               handful of fat straggler tasks.
  max_posting: each posting hash-split into ⌈W/mp⌉ blocks — the same
               candidate volume spread over (W/mp)²/2 normal cells.

Both paths are EXACT (asserted equal); the wall difference is pure
straggler-vs-spread.  The positional filter prunes every candidate
either way (common tokens sit at prefix tails), so this also measures
the filter's row-discard throughput.

Usage: python tools/stress_prefix_cap.py [n_docs] [max_posting]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    from legal_ner_spark.session import get_spark
    from legal_ner_spark.operators import dedup

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    mp = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spark = get_spark(master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    boiler = " ".join(f"b{i}" for i in range(60))
    rows = [(d, boiler + " " + " ".join(f"u{d}w{j}" for j in range(10)))
            for d in range(n_docs)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]) \
        .repartition(64, "doc_id").cache()
    docs.count()

    stats = dedup.prefix_posting_stats(docs, t_num=4, t_den=5, n=5,
                                       max_posting=mp).collect()[0]

    def wall(max_posting):
        f = lambda: dedup.prefix_filter_pairs(
            docs, t_num=4, t_den=5, n=5, max_posting=max_posting).count()
        n = f()                      # warm-up
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            f()
            best = min(best, time.time() - t0)
        return best, n

    t_capped, n_capped = wall(mp)
    t_plain, n_plain = wall(None)
    assert n_capped == n_plain, (n_capped, n_plain)   # EXACTNESS

    out = {
        "n_docs": n_docs, "max_posting": mp,
        "hot_postings": int(stats.n_oversize),
        "max_posting_width": int(stats.max_width),
        "cand_pairs": int(stats.cand_pairs),
        "blocked_cells": int(stats.blocked_cells),
        "pairs_found": n_capped,
        "wall_capped_s": round(t_capped, 1),
        "wall_uncapped_s": round(t_plain, 1),
        "speedup": round(t_plain / t_capped, 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

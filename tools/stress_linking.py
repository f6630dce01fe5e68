"""Volume stress for the entity-resolution / exact-similarity tier:

1. sorted-neighborhood ER over 200k case-name strings (40k entities × 5
   planted surface variants: canonical, vs→versus, one-char typo, year
   suffix, whitespace noise) — throughput must track the corpus, and
   every variant pair that is lexically adjacent within the window and
   within edit budget must surface;
2. prefix-filter EXACT similarity join over 50k documents with 10%
   planted near-duplicates (3 of ~60 tokens mutated) — recall of the
   planted pairs above the Jaccard threshold must be 100% (the
   operator's zero-false-negative contract), with candidate volume
   bounded by rarity-prefix postings, not n².

Usage: python tools/stress_linking.py [n_names] [n_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import random
import sys
import time

sys.path.insert(0, ".")


def make_names(n_entities: int) -> list[tuple[str, str]]:
    rng = random.Random(42)
    first = ["Madhu", "Suresh", "Amit", "Deepak", "Sanjay", "Ramesh",
             "Vijay", "Manoj", "Ashok", "Rakesh", "Sunil", "Anil"]
    last = ["Limaye", "Gupta", "Reddy", "Sharma", "Singh", "Patil",
            "Verma", "Joshi", "Iyer", "Kumar", "Rao", "Das"]
    states = ["Maharashtra", "Kerala", "Punjab", "Karnataka", "Gujarat",
              "Rajasthan", "Haryana", "Bihar", "Assam", "Goa"]
    rows = []
    for i in range(n_entities):
        base = (f"{rng.choice(first)} {rng.choice(last)} vs State of "
                f"{rng.choice(states)} {rng.randrange(1950, 2025)} AIR "
                f"{rng.randrange(1, 999)}")
        variants = [base, base.replace(" vs ", " versus ", 1)]
        typo = list(base)
        typo[rng.randrange(len(base) - 10)] = rng.choice("aeiou")
        variants.append("".join(typo))
        variants.append(base + " (SC)")
        variants.append(base.replace(" ", "  ", 1))
        for j, v in enumerate(variants):
            rows.append((f"e{i}_{j}", v))
    return rows


def make_docs(n_docs: int) -> list[tuple[int, str]]:
    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(5000)]
    rows = []
    i = 0
    while i < n_docs:
        body = [rng.choice(vocab) for _ in range(60)]
        rows.append((i, " ".join(body)))
        i += 1
        if i < n_docs and rng.random() < 0.1:
            dup = list(body)
            for _ in range(3):
                dup[rng.randrange(len(dup))] = rng.choice(vocab)
            rows.append((i, " ".join(dup)))
            i += 1
    return rows


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    from legal_ner_spark.session import get_spark
    from legal_ner_spark.operators import linking
    from legal_ner_spark.operators.dedup import prefix_filter_pairs

    spark = get_spark(app_name="stress-linking", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    names = spark.createDataFrame(make_names(n_entities),
                                  "rid string, name string") \
        .repartition(32).cache()
    n_names = names.count()
    t0 = time.time()
    pairs = linking.sorted_neighborhood_pairs(
        names, key_col="name", id_col="rid", window=5, max_edit=6)
    n_pairs = pairs.count()
    snm_s = time.time() - t0
    # the 'versus' and 'double-space' variants normalize adjacent to the
    # canonical form; count how many entity groups surfaced ≥1 pair
    grouped = (pairs.selectExpr(
        "split(id_a, '_')[0] AS ea", "split(id_b, '_')[0] AS eb")
        .filter("ea = eb").select("ea").distinct().count())

    docs = spark.createDataFrame(make_docs(n_docs),
                                 "doc_id bigint, text string") \
        .repartition(32).cache()
    nd = docs.count()
    t0 = time.time()
    pf = prefix_filter_pairs(docs, t_num=4, t_den=5, n=5)
    pf_rows = pf.collect()
    pf_s = time.time() - t0
    got = {(r.doc_a, r.doc_b) for r in pf_rows}
    # ground truth for the planted consecutive-id dups
    import itertools
    by_id = dict(make_docs(n_docs))
    def shingles(t):
        ts = t.split()
        return {" ".join(ts[i:i + 5]) for i in range(len(ts) - 4)}
    planted = 0
    missed = 0
    for a in range(0, n_docs - 1):
        b = a + 1
        if b not in by_id or a not in by_id:
            continue
        sa, sb = shingles(by_id[a]), shingles(by_id[b])
        u = len(sa | sb)
        if u and 5 * len(sa & sb) >= 4 * u:
            planted += 1
            if (a, b) not in got:
                missed += 1
    out = {
        "snm": {"n_names": n_names, "wall_s": round(snm_s, 1),
                "names_per_sec": round(n_names / snm_s),
                "pairs": n_pairs, "entity_groups_linked": grouped},
        "prefix_filter": {"n_docs": nd, "wall_s": round(pf_s, 1),
                          "docs_per_sec": round(nd / pf_s),
                          "pairs": len(pf_rows),
                          "planted_above_threshold": planted,
                          "planted_missed": missed},
    }
    print(json.dumps(out))
    assert missed == 0, "prefix filter dropped a planted pair"
    spark.stop()


if __name__ == "__main__":
    main()

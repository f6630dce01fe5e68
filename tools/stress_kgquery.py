"""Scale stress for the consumer-side KG query layer (operators/kgquery.py).

Three hazards a declarative KG layer must survive at 100 TB:

1. **BGP join order.** A pattern list that starts from the hot predicate
   (a ``mentions``-like edge with 10⁷⁺ rows) shuffles the hot table's
   bindings through every later join; starting from the selective pattern
   keeps the intermediate the size of the ANSWER.  ``bgp_match`` orders
   patterns by a per-predicate count probe — this tool times the probe
   order against the inlined naive declaration-order plan on a corpus
   with a 200:1 hot/rare predicate skew.

2. **Path re-expansion.** Bounded reachability over a cyclic graph must
   not re-derive pairs it already knows, or a K-hop run over a cycle does
   K× the work and never converges on dense cores.  ``property_path``
   anti-joins each frontier against everything seen; this tool runs an
   N-node directed cycle (every hop reaches exactly N new pairs — any
   superlinear growth would be re-expansion) and checks per-hop output
   is exactly N·max_hops.

3. **Interchange volume.** The N-Triples escape chain and the
   round-trip (export → regex parse → two label-resolution joins) are
   string codegen + equi-joins and must stay linear; this tool pushes
   millions of triples with embedded quotes/newlines/backslashes through
   both directions and asserts the set-exact round-trip.

Prints one JSON line; the committed row lives in BENCH.md.

Usage: python tools/stress_kgquery.py [hot_rows] [cycle_n] [max_hops]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from legal_ner_spark.session import get_spark
    from legal_ner_spark.operators import kgquery

    hot = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cyc = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    hops = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # ---- 1. BGP join order on a CHAIN under 3200:1 predicate skew -------
    # chain: ?d mentions ?e . ?e cites ?f . ?f decided_by ?c
    #   mentions: n docs × fan-out 4  (4n rows, hot)
    #   cites:    every ?e × fan-out 4 (16n rows, hot)
    #   decided_by: 1-in-3200 ?f      (n/200 rows, rare)
    # A star pipelines its same-key joins in one stage regardless of
    # order, so order barely matters there; on a CHAIN the join keys
    # differ per hop and the declaration-order plan must RE-SHUFFLE its
    # 16n-row hot ⋈ hot intermediate on the next key, while the probe
    # order starts at the rare pattern and only ever shuffles
    # answer-sized intermediates (n/200).  Both plans shuffle each hot
    # leg once either way — the delta IS the intermediate.
    n = hot
    j4 = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j")
    d = spark.range(n).select(F.col("id").alias("i"), j4)
    p1 = d.select(F.concat(F.lit("d"), "i").alias("subj"),
                  F.lit("mentions").alias("pred"),
                  F.concat(F.lit("e"), F.col("i") * 4 + F.col("j"))
                  .alias("obj"))
    e = spark.range(n * 4).select(F.col("id").alias("t"), j4)
    p2 = e.select(F.concat(F.lit("e"), "t").alias("subj"),
                  F.lit("cites").alias("pred"),
                  F.concat(F.lit("f"), F.col("t") * 4 + F.col("j"))
                  .alias("obj"))
    p3 = (spark.range(n * 16).filter(F.col("id") % 3200 == 0)
          .select(F.concat(F.lit("f"), "id").alias("subj"),
                  F.lit("decided_by").alias("pred"),
                  F.concat(F.lit("c"), F.pmod("id", 31)).alias("obj")))
    tri = (p1.union(p2).union(p3)
           .withColumn("doc_id", F.col("subj"))
           .repartition(32).cache())
    n_tri = tri.count()

    pats = [("?d", "mentions", "?e"),        # declared hot-first on purpose
            ("?e", "cites", "?f"),
            ("?f", "decided_by", "?c")]

    def best_of(fn, k=2):
        ns, ts = set(), []
        for _ in range(k):
            t0 = time.time()
            ns.add(fn())
            ts.append(time.time() - t0)
        assert len(ns) == 1
        return ns.pop(), min(ts)

    n_probe, t_probe = best_of(
        lambda: kgquery.bgp_match(tri, pats).count())

    # naive inlined plan: join in declaration order, hot ⋈ hot first
    l1 = (tri.filter(F.col("pred") == "mentions")
          .select(F.col("subj").alias("d"), F.col("obj").alias("e")))
    l2 = (tri.filter(F.col("pred") == "cites")
          .select(F.col("subj").alias("e"), F.col("obj").alias("f")))
    l3 = (tri.filter(F.col("pred") == "decided_by")
          .select(F.col("subj").alias("f"), F.col("obj").alias("c")))
    n_naive, t_naive = best_of(
        lambda: (l1.join(l2, "e").join(l3, "f")
                 .select("d", "e", "f", "c").distinct().count()))
    assert n_probe == n_naive, (n_probe, n_naive)

    # ---- 2. property_path on a cycle: no re-expansion -------------------
    e = (spark.range(cyc)
         .select(F.col("id").cast("string").alias("src"),
                 F.pmod(F.col("id") + 1, cyc).cast("string").alias("dst")))
    t0 = time.time()
    per_hop = (kgquery.property_path(e, hops)
               .groupBy("hops").count().orderBy("hops").collect())
    t_path = time.time() - t0
    counts = {r["hops"]: r["count"] for r in per_hop}
    assert counts == {k: cyc for k in range(1, hops + 1)}, counts

    # ---- 2b. incremental maintenance: O(batch), not O(store) -------------
    # a 1,000-triple-chain delta against the 84M-row store: the standing
    # query's per-batch cost must track the DELTA; the full rematch is
    # the cost it avoids.  All delta ids are fresh, so the new-binding
    # count is exactly 1,000 (asserted — any cross-talk would break it).
    kd = 1000
    base_tag = spark.range(kd)
    d1 = base_tag.select(F.concat(F.lit("nd"), "id").alias("subj"),
                         F.lit("mentions").alias("pred"),
                         F.concat(F.lit("ne"), "id").alias("obj"))
    d2 = base_tag.select(F.concat(F.lit("ne"), "id").alias("subj"),
                         F.lit("cites").alias("pred"),
                         F.concat(F.lit("nf"), "id").alias("obj"))
    d3 = base_tag.select(F.concat(F.lit("nf"), "id").alias("subj"),
                         F.lit("decided_by").alias("pred"),
                         F.lit("c0").alias("obj"))
    delta = (d1.union(d2).union(d3)
             .withColumn("doc_id", F.col("subj")).cache())
    delta.count()
    full = tri.unionByName(delta)
    t0 = time.time()
    n_new = kgquery.bgp_match_delta(full, delta, pats).count()
    t_delta = time.time() - t0
    assert n_new == kd, n_new
    t0 = time.time()
    n_full = kgquery.bgp_match(full, pats).count()
    t_full_rematch = time.time() - t0
    assert n_full == n_probe + kd, (n_full, n_probe)

    # ---- 2c. path EXPRESSIONS at store scale ------------------------------
    # the parsed-path engine over the same 84M-row store, each leg with
    # an exact cross-check: the sequence expression must equal the BGP
    # chain's endpoint projection; the negated property set must equal
    # the raw NOT-IN scan.  Both are new plan SHAPES (path_relation
    # composition / _nps_edges union), so they get their own timings —
    # re-expansion is already pinned by the cycle leg above.
    t0 = time.time()
    n_seq = kgquery.path_relation(
        tri, "mentions/cites/decided_by").count()
    t_seq = time.time() - t0
    n_seq_want = (l1.join(l2, "e").join(l3, "f")
                  .select("d", "c").distinct().count())
    assert n_seq == n_seq_want, (n_seq, n_seq_want)
    t0 = time.time()
    n_nps = kgquery.path_relation(tri, "!decided_by").count()
    t_nps = time.time() - t0
    n_nps_want = (tri.filter(F.col("pred") != "decided_by")
                  .select("subj", "obj").distinct().count())
    assert n_nps == n_nps_want, (n_nps, n_nps_want)

    # ---- 2d. GROUP BY aggregate + UNION at store scale --------------------
    # the compiler's aggregation leg: per-subject fan-out of the hot
    # ``mentions`` predicate (4n bindings → n groups) as a partial+final
    # hash aggregate — every subject mentions exactly 4 entities by
    # construction, asserted for ALL groups.  The UNION leg combines
    # both hot predicates (20n bindings) through the zero-shuffle Union
    # + one DISTINCT; all pairs are distinct by construction, asserted
    # by exact count.
    t0 = time.time()
    n_bad = (kgquery.bgp_match(tri, [("?s", "mentions", "?e")],
                               group_by="?s", agg={"?n": "count(*)"})
             .filter("n != 4").count())
    t_group = time.time() - t0
    assert n_bad == 0, n_bad
    t0 = time.time()
    n_union = kgquery.bgp_union(tri, [[("?a", "mentions", "?b")],
                                      [("?a", "cites", "?b")]]).count()
    t_union = time.time() - t0
    assert n_union == n * 20, (n_union, n * 20)

    # ---- 3. N-Triples interchange at millions of lines -------------------
    # entity text with embedded quotes/newlines/backslashes every few
    # rows — the escape chain must survive at volume, and the round-trip
    # (export → parse → resolve) must return EXACTLY the input triples.
    nt_n = max(hot // 2, 1_000_000)
    tri_nt = (spark.range(nt_n).select(
        F.concat(F.lit('ent "'), F.col("id").cast("string"),
                 F.when(F.col("id") % 7 == 0, F.lit('"\n\\x'))
                  .otherwise(F.lit('"'))).alias("subj"),
        F.concat(F.lit("p"), F.pmod("id", 5).cast("string")).alias("pred"),
        F.concat(F.lit("obj\t"), F.pmod("id", 997).cast("string"))
        .alias("obj"),
        F.lit(None).cast("string").alias("doc_id")))
    t0 = time.time()
    n_lines = kgquery.to_ntriples(tri_nt).count()
    t_export = time.time() - t0
    t0 = time.time()
    back = kgquery.from_ntriples(kgquery.to_ntriples(tri_nt))
    n_diff = (back.select("subj", "pred", "obj")
              .exceptAll(tri_nt.select("subj", "pred", "obj")).count()
              + tri_nt.select("subj", "pred", "obj")
              .exceptAll(back.select("subj", "pred", "obj")).count())
    t_roundtrip = time.time() - t0
    assert n_diff == 0, n_diff

    out = {
        "metric": "kgquery_stress",
        "hot_rows": hot,
        "bgp_rows": n_probe,
        "bgp_probe_order_sec": round(t_probe, 2),
        "bgp_naive_order_sec": round(t_naive, 2),
        "cycle_nodes": cyc,
        "max_hops": hops,
        "path_pairs": sum(counts.values()),
        "path_sec": round(t_path, 2),
        "path_pairs_per_hop_exact": True,
        "delta_triples": kd * 3,
        "delta_new_bindings": n_new,
        "delta_match_sec": round(t_delta, 2),
        "full_rematch_sec": round(t_full_rematch, 2),
        "path_seq_pairs": n_seq,
        "path_seq_sec": round(t_seq, 2),
        "path_nps_pairs": n_nps,
        "path_nps_sec": round(t_nps, 2),
        "group_agg_subjects": n,
        "group_agg_fanout_exact": True,
        "group_agg_sec": round(t_group, 2),
        "union_bindings": n_union,
        "union_sec": round(t_union, 2),
        "nt_triples": nt_n,
        "nt_lines": n_lines,
        "nt_export_sec": round(t_export, 2),
        "nt_roundtrip_sec": round(t_roundtrip, 2),
        "nt_roundtrip_exact": True,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Scale stress for the entailment / update / shapes tier
(operators/kgquery.py: rdfs_entail, owl_extend, update_graph,
validate_shapes) at the same synthetic-store scale as
stress_kgquery.py, every leg with an EXACT expected count derived from
the store's construction — a wrong plan can be slow, but it cannot be
quietly wrong.

1. **rdfs_entail over the 84M-row chain store.**  Ontology: both hot
   predicates sub-properties of ``refers_to``, domain/range typing on
   the rare ``decided_by``, one subclass level.  Expected derivations
   are closed-form: 20n ``refers_to`` rows (every hot binding exactly
   once), one ``type judgment`` + one ``type document`` per distinct
   decided subject, 31 court typings ×2 hierarchy levels, plus the
   closure literals.  The operator is one explode over one scan + one
   distinct + one anti-join — the leg times exactly that shape at
   ~100M derived rows.

2. **owl_extend transitive closure over deep chains.**  K disjoint
   L-node chains declared transitive: closure pairs per chain are
   exactly L(L-1)/2 bounded by max_hops, and the inverse declaration
   doubles them — asserted in closed form.  This is the leg where
   re-expansion or a pred-key mixup would explode combinatorially.

3. **update_graph pred-rename over the store.**  DELETE/INSERT WHERE
   on the rare predicate: row count is conserved (every deleted
   3-tuple re-lands under the new predicate) and no old-pred row
   survives — both asserted.

4. **validate_shapes over the store.**  A shape whose min-count
   constraint every focus node violates by construction (exact count)
   and a max-count constraint nothing violates (exact zero).

Prints one JSON line; the committed row lives in BENCH.md.

Usage: python tools/stress_kgentail.py [hot_n] [chains_k] [chain_len]
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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    length = int(sys.argv[3]) if len(sys.argv) > 3 else 9
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # the stress_kgquery chain store: mentions 4n, cites 16n,
    # decided_by n/200 (all pairs distinct by construction)
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
    n_dec = n * 16 // 3200            # distinct decided subjects

    # ---- 1. rdfs_entail at store scale ---------------------------------
    onto = [("mentions", "subproperty_of", "refers_to"),
            ("cites", "subproperty_of", "refers_to"),
            ("decided_by", "domain", "judgment"),
            ("decided_by", "range", "court"),
            ("judgment", "subclass_of", "legal_document"),
            ("legal_document", "subclass_of", "document")]
    sch = spark.createDataFrame(
        [(s, p, o, None) for s, p, o in onto],
        "subj string, pred string, obj string, doc_id string")
    g = tri.unionByName(sch)
    t0 = time.time()
    n_derived = kgquery.rdfs_entail(g, derived_only=True).count()
    t_rdfs = time.time() - t0
    # refers_to: 4n + 16n distinct pairs; judgment+legal_document+
    # document typings per decided subject; 31 courts × 1 typing;
    # 1 closure literal (judgment ⊑ document via 2 hops → 1 new pair
    # beyond the asserted ones: judgment→document)
    want = 20 * n + 3 * n_dec + 31 + 1
    assert n_derived == want, (n_derived, want)

    # ---- 2. owl_extend deep-chain closure ------------------------------
    # k chains of `length` nodes: closure pairs per chain =
    # Σ_{h=1..min(max_hops, length-1)} (length-h); inverse decl doubles.
    nodes = spark.range(k * length).select(
        F.col("id").alias("nid"),
        (F.col("id") % length).alias("pos"))
    ch = (nodes.filter(F.col("pos") < length - 1)
          .select(F.concat(F.lit("x"), "nid").alias("subj"),
                  F.lit("follows").alias("pred"),
                  F.concat(F.lit("x"), F.col("nid") + 1).alias("obj"),
                  F.lit(None).cast("string").alias("doc_id")))
    decl = spark.createDataFrame(
        [("follows", "type", "transitive_property", None),
         ("followed_by", "inverse_of", "follows", None)],
        "subj string, pred string, obj string, doc_id string")
    gc = ch.unionByName(decl)
    max_hops = 8
    t0 = time.time()
    n_owl = kgquery.owl_extend(gc, max_hops=max_hops,
                               derived_only=True).count()
    t_owl = time.time() - t0
    per_chain = sum(length - h
                    for h in range(1, min(max_hops, length - 1) + 1))
    base_edges = k * (length - 1)
    closure_pairs = k * per_chain
    # derived = (closure minus asserted) + inverse images of ALL closed
    # pairs (closure ∪ asserted = closure, since hop-1 ∈ closure)
    want_owl = (closure_pairs - base_edges) + closure_pairs
    assert n_owl == want_owl, (n_owl, want_owl)

    # ---- 2b. materialize_rules: recursive program over deep chains ------
    # the ancestor program on k/2 disjoint chains: fixpoint = all
    # within-chain ordered pairs, reached in length-2 semi-naive rounds;
    # asserted in closed form — re-derivation or a cross-chain leak
    # breaks it.  Uses the same chain table as the owl leg (pred
    # follows), rules pred anc.
    kr = max(k // 2, 1)
    rn = (spark.range(kr * length).select(
        F.col("id").alias("nid"), (F.col("id") % length).alias("pos")))
    rch = (rn.filter(F.col("pos") < length - 1)
           .select(F.concat(F.lit("r"), "nid").alias("subj"),
                   F.lit("follows").alias("pred"),
                   F.concat(F.lit("r"), F.col("nid") + 1).alias("obj"),
                   F.lit(None).cast("string").alias("doc_id")))
    prog = [{"body": [("?x", "follows", "?y")],
             "head": ("?x", "anc", "?y")},
            {"body": [("?x", "anc", "?y"), ("?y", "follows", "?z")],
             "head": ("?x", "anc", "?z")}]
    t0 = time.time()
    rules_derived = kgquery.materialize_rules(rch, prog,
                                              max_rounds=length,
                                              derived_only=True).persist()
    n_rules = rules_derived.count()
    t_rules = time.time() - t0
    want_rules = kr * (length * (length - 1) // 2)
    assert n_rules == want_rules, (n_rules, want_rules)

    # ---- 2c. materialize_rules_delta: O(batch) maintenance --------------
    # extend kb of the chains by one node each; the ONLY new facts are
    # the extended chains' ancestor pairs into the new tail — exactly
    # `length` per extended chain, in closed form.  The batch is tiny
    # next to the store, so the leg times the delta matcher's store
    # scans, not a recomputation of the 9M-pair fixpoint.
    kb = min(kr, 25_000)
    batch = (spark.range(kb).select(
        F.concat(F.lit("r"), F.col("id") * length + (length - 1))
        .alias("subj"),
        F.lit("follows").alias("pred"),
        F.concat(F.lit("x"), F.col("id")).alias("obj"),
        F.lit(None).cast("string").alias("doc_id")))
    full = rch.unionByName(rules_derived).unionByName(batch)
    t0 = time.time()
    n_rdelta = kgquery.materialize_rules_delta(
        full, batch, prog, max_rounds=length).count()
    t_rdelta = time.time() - t0
    want_rdelta = kb * length
    assert n_rdelta == want_rdelta, (n_rdelta, want_rdelta)

    # ---- 2d. materialize_rules_retract: DRed deletion maintenance -------
    # delete the LAST edge of kb chains: endangered = the anc pairs
    # into each deleted chain's tail — (length-1) per chain, none
    # re-derivable (chains have no alternative paths), so the new
    # derived set is exactly the fixpoint minus kb·(length-1) rows.
    # Phase 2's full rematch (the honest DRed cost) runs — the
    # endangered set is non-empty — and must put nothing back.
    dele = (spark.range(kb).select(
        F.concat(F.lit("r"), F.col("id") * length + (length - 2))
        .alias("subj"),
        F.lit("follows").alias("pred"),
        F.concat(F.lit("r"), F.col("id") * length + (length - 1))
        .alias("obj"),
        F.lit(None).cast("string").alias("doc_id")))
    kept = rch.join(dele.select("subj", "pred", "obj"),
                    on=["subj", "pred", "obj"], how="left_anti")
    t0 = time.time()
    n_retract = kgquery.materialize_rules_retract(
        kept, rules_derived, dele, prog, max_rounds=length).count()
    t_retract = time.time() - t0
    want_retract = want_rules - kb * (length - 1)
    assert n_retract == want_retract, (n_retract, want_retract)
    rules_derived.unpersist()

    # ---- 2e. materialize_rules_stratified: negation at store scale ------
    # anc (stratum 0) + canon(x,y) := anc(x,y) ∧ ¬∃z anc(z,x)
    # (stratum 1 negates the completed 9M-pair fixpoint): the only
    # subjects never appearing as an anc OBJECT are the kr chain
    # heads, so canon adds exactly kr·(length-1) rows — a wrong
    # stratum order or a leaky anti-join breaks the closed form.
    prog_s = prog + [{"body": [("?x", "anc", "?y")],
                      "minus": [("?z", "anc", "?x")],
                      "head": ("?x", "canon", "?y")}]
    t0 = time.time()
    sderiv = kgquery.materialize_rules_stratified(
        rch, prog_s, max_rounds=length, derived_only=True).persist()
    n_strat = sderiv.count()
    t_strat = time.time() - t0
    want_strat = want_rules + kr * (length - 1)
    assert n_strat == want_strat, (n_strat, want_strat)

    # ---- 2f. materialize_rules_stratified_maintain: signed deltas -------
    # delete the FIRST edge of kb chains: each loses its head's
    # (length-1) anc pairs AND its (length-1) canon rows, while the
    # SECOND node becomes a new root contributing (length-2) canon
    # rows — a deletion that INSERTS derived facts through negation.
    # Net change is exactly -kb·length, in closed form.
    dele_m = (spark.range(kb).select(
        F.concat(F.lit("r"), F.col("id") * length).alias("subj"),
        F.lit("follows").alias("pred"),
        F.concat(F.lit("r"), F.col("id") * length + 1).alias("obj"),
        F.lit(None).cast("string").alias("doc_id")))
    kept_m = rch.join(dele_m.select("subj", "pred", "obj"),
                      on=["subj", "pred", "obj"], how="left_anti")
    t0 = time.time()
    n_maint = kgquery.materialize_rules_stratified_maintain(
        kept_m, sderiv, rch.limit(0), dele_m, prog_s,
        max_rounds=length).count()
    t_maint = time.time() - t0
    want_maint = want_strat - kb * length
    assert n_maint == want_maint, (n_maint, want_maint)
    sderiv.unpersist()

    # ---- 3. update_graph pred-rename over the store ---------------------
    t0 = time.time()
    up = kgquery.update_graph(
        tri, where=[("?f", "decided_by", "?c")],
        delete=[("?f", "decided_by", "?c")],
        insert=[("?f", "heard_by", "?c")])
    n_up = up.count()
    n_old = up.filter(F.col("pred") == "decided_by").count()
    t_update = time.time() - t0
    assert n_up == n_tri, (n_up, n_tri)      # rename conserves rows
    assert n_old == 0, n_old

    # ---- 4. validate_shapes over the store ------------------------------
    shapes = [{"shape": "DecidedShape", "target_pred": "decided_by",
               "constraints": [
                   {"path": "decided_by", "max_count": 1},
                   {"path": "cites", "min_count": 1},
               ]}]
    t0 = time.time()
    viol = kgquery.validate_shapes(tri, shapes)
    n_min = viol.filter(F.col("constraint") == "min_count=1").count()
    n_max = viol.filter(
        F.col("constraint") == "max_count=1").count()
    t_shapes = time.time() - t0
    # every decided subject is an f-node with no outgoing cites edge;
    # every decided subject names exactly one court
    assert n_min == n_dec, (n_min, n_dec)
    assert n_max == 0, n_max

    out = {
        "metric": "kgentail_stress",
        "store_rows": n_tri,
        "rdfs_derived_rows": n_derived,
        "rdfs_derived_exact": True,
        "rdfs_sec": round(t_rdfs, 2),
        "owl_chains": k,
        "owl_chain_len": length,
        "owl_derived_rows": n_owl,
        "owl_derived_exact": True,
        "owl_sec": round(t_owl, 2),
        "rules_chains": kr,
        "rules_derived_rows": n_rules,
        "rules_derived_exact": True,
        "rules_sec": round(t_rules, 2),
        "rules_delta_batch_edges": kb,
        "rules_delta_rows": n_rdelta,
        "rules_delta_exact": True,
        "rules_delta_sec": round(t_rdelta, 2),
        "retract_deleted_edges": kb,
        "retract_rows": n_retract,
        "retract_exact": True,
        "retract_sec": round(t_retract, 2),
        "stratified_rows": n_strat,
        "stratified_exact": True,
        "stratified_sec": round(t_strat, 2),
        "smaintain_deleted_edges": kb,
        "smaintain_rows": n_maint,
        "smaintain_exact": True,
        "smaintain_sec": round(t_maint, 2),
        "update_rows": n_up,
        "update_conserves_rows": True,
        "update_sec": round(t_update, 2),
        "shape_focus_nodes": n_dec,
        "shape_violations_exact": True,
        "shapes_sec": round(t_shapes, 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

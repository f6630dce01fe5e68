"""Physical-plan audits — assert Catalyst produces the plans we want at
100 TB, not just plans that happen to pass at sf0.01:

- filters reach the parquet scan (``PushedFilters``) and only referenced
  columns are read (``ReadSchema`` pruning);
- tiny dimensions broadcast (``BroadcastHashJoin``), never shuffled;
- top-k compiles to ``TakeOrderedAndProject`` (per-partition partial
  top-k), never a single-partition global Window;
- the sessionization window + aggregation reuse ONE hash exchange on
  ``user_id`` (the groupBy's clustering is satisfied by the window's
  partitioning — no second shuffle);
- no ``CartesianProduct`` anywhere in the KG extraction plan.

These guard against regressions that stay correct but silently become
scan-everything / shuffle-everything plans.
"""

import contextlib
import io

from legal_ner_spark import queries

SF = "/root/testdata/sf0.01"


def plan_of(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def physical(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filter_pushdown_and_column_pruning(spark):
    p = plan_of(queries.QUERIES["tpch_q6"](spark, SF))
    assert "PushedFilters" in p, p
    pushed = p.split("PushedFilters")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in read, read
    # the 12 unreferenced lineitem columns are pruned from the scan
    for col in ("l_orderkey", "l_comment", "l_partkey", "l_tax"):
        assert col not in read, read


def test_q3_uses_distributed_topk_not_global_window(spark):
    p = physical(queries.QUERIES["tpch_q3"](spark, SF))
    assert "TakeOrderedAndProject" in p, p[:2000]
    assert "Window" not in p, p[:2000]


def test_q5_broadcasts_all_dimensions(spark):
    p = physical(queries.QUERIES["tpch_q5"](spark, SF))
    assert "BroadcastHashJoin" in p, p[:2000]
    assert "CartesianProduct" not in p
    # only the lineitem↔orders join may shuffle; region/nation/customer/
    # supplier must all ride broadcast exchanges
    n_bcast = p.count("BroadcastExchange") + p.count("BroadcastQueryStage")
    assert n_bcast >= 4, p[:3000]


def test_q21_scans_lineitem_once(spark):
    """Q21's EXISTS / NOT-EXISTS pair rides window aggregates over the
    one late-flagged join, so the fact table is scanned once — the
    groupBy+rejoin formulation would read lineitem twice."""
    p = physical(queries.QUERIES["tpch_q21"](spark, SF))
    assert p.count("lineitem.parquet") == 1, p[:3000]
    assert "CartesianProduct" not in p


def test_zorder_routing_is_shuffle_free(spark):
    """Bucket routing + bit interleave must be broadcast + projection:
    the zone-map groupBy is the ONLY hash exchange in zorder_layout."""
    p = physical(queries.QUERIES["zorder_layout"](spark, SF))
    assert p.count("Exchange hashpartitioning") == 1, p[:3000]


def test_funnel_single_exchange(spark):
    """Three chained window-mins + the per-user rollup must share ONE
    user_id exchange — a join-per-step funnel would shuffle 3×."""
    p = physical(queries.QUERIES["funnel"](spark, SF))
    assert p.count("Exchange hashpartitioning") == 1, p[:3000]


def test_funnel_requires_strict_order(spark):
    """A click BEFORE the signup (or tied with it) must not count as
    step 2; a later one must."""
    from pyspark.sql import types as T
    import datetime as dt
    rows = [(1, dt.datetime(2024, 1, 1, 10), "click"),     # too early
            (1, dt.datetime(2024, 1, 1, 12), "signup"),
            (1, dt.datetime(2024, 1, 1, 12), "click"),     # tie: excluded
            (2, dt.datetime(2024, 1, 2, 9), "signup"),
            (2, dt.datetime(2024, 1, 2, 10), "click"),
            (2, dt.datetime(2024, 1, 2, 11), "purchase")]
    schema = T.StructType([T.StructField("user_id", T.LongType()),
                           T.StructField("ts", T.TimestampType()),
                           T.StructField("event_type", T.StringType())])
    df = spark.createDataFrame(rows, schema)
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r.user_id: r.steps_reached
           for r in queries.QUERIES["funnel"](spark, d).collect()}
    assert out == {1: 1, 2: 3}


def test_sessionize_single_exchange(spark):
    p = physical(queries.QUERIES["sessionize"](spark, SF))
    n_hash_exchanges = p.count("Exchange hashpartitioning")
    assert n_hash_exchanges == 1, p[:3000]
    assert "user_id" in p.split("Exchange hashpartitioning")[1][:120]


def test_kg_extraction_plan_has_no_cartesian_or_global_window(spark):
    # kg_triples reads the materialize-once records parquet: its plan must
    # be a pruned scan with the rec_type filter PUSHED DOWN, no joins at
    # all; the fused extraction stage itself is audited by
    # test_fused_extract_is_narrow_zero_exchange below
    p = physical(queries.QUERIES["kg_triples"](spark, SF))
    assert "CartesianProduct" not in p
    assert "PushedFilters" in p and "rec_type" in p.split("PushedFilters")[1][:200], p[:2000]
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "spans" not in read, read   # the wide spans column is pruned


def test_fused_extract_is_narrow_zero_exchange(spark):
    """The architecture's core claim (ARCHITECTURE.md §2): corpus scan →
    fused mapInPandas → triples projection introduces NO shuffle.  The
    only allowed Exchange would come from an explicit repartition the
    caller adds; the operator itself must stay narrow."""
    from legal_ner_spark import pipeline
    from legal_ner_spark.operators import extract as ops
    corpus = pipeline.synthetic_corpus(spark, 8, partitions=2)
    p = physical(ops.triples(ops.extract_records(corpus)))
    assert "Exchange" not in p, p[:3000]
    assert "MapInPandas" in p, p[:2000]


def test_near_dup_pair_tier_has_no_loop_joins(spark):
    """The near-dup pair generators (simhash, embedding) must compile to
    banded equi-joins — a CartesianProduct or BroadcastNestedLoopJoin here
    is the one plan shape that cannot survive 100 TB (the r1 verdict's
    scale-killer).  minhash candidates were already equi-join shaped."""
    for name in ("simhash_pairs", "embedding_near_pairs",
                 "dedup_minhash_lsh", "ann_lsh_topk"):
        p = physical(queries.QUERIES[name](spark, SF))
        assert "CartesianProduct" not in p, (name, p[:2000])
        assert "BroadcastNestedLoopJoin" not in p, (name, p[:2000])
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p \
            or "BroadcastHashJoin" in p, (name, p[:2000])


def test_q7_broadcasts_both_nation_roles(spark):
    p = physical(queries.QUERIES["tpch_q7"](spark, SF))
    assert "CartesianProduct" not in p
    n_bcast = p.count("BroadcastExchange") + p.count("BroadcastQueryStage")
    assert n_bcast >= 4, p[:3000]        # supp, cust, nation x2
    assert "PushedFilters" in p          # l_shipdate range reaches the scan


def test_near_dedup_plan_has_no_loop_joins(spark):
    """The composed dedup flow must stay equi-join-shaped end to end —
    candidates, verify, and the CC iterations."""
    p = physical(queries.QUERIES["near_dedup"](spark, SF))
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]


def test_vocab_topk_salted_two_phase_and_distributed_topk(spark):
    """The salted aggregation query must show the two-phase shape (an
    exchange keyed by (token, salt) below the final token aggregation)
    and a TakeOrderedAndProject top-k, never a global Window/Sort-all."""
    p = physical(queries.QUERIES["vocab_topk"](spark, SF))
    assert "TakeOrderedAndProject" in p, p[:2000]
    assert "_salt" in p, p[:2000]
    assert "Window" not in p


def test_salted_join_exchanges_on_key_and_salt(spark):
    """The salted join's shuffle must cluster on (key, salt) — that IS
    the skew defense.  At sf0.01 the whole big side fits the broadcast
    threshold (Catalyst correctly skips the shuffle — also fine), so the
    audit pins the 100 TB shape by disabling auto-broadcast for the big
    join while the 8-row salt replication stays an explicit broadcast."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = physical(queries.QUERIES["salted_join_agg"](spark, SF))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "CartesianProduct" not in p, p[:2000]
    ex = [ln for ln in p.splitlines() if "Exchange hashpartitioning" in ln]
    assert any("partkey" in ln and "_salt" in ln for ln in ex), p[:3000]


def test_triangle_plan_is_equi_joins_only(spark):
    """Triangle enumeration must compile to hash equi-joins — no
    BroadcastNestedLoopJoin / CartesianProduct (the O(n²)+ shapes)."""
    p = physical(queries.QUERIES["kg_statute_triangles"](spark, SF))
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]


def test_interval_events_has_no_nested_loop(spark):
    """The keyless range join must compile to an equi-join on the time
    bin (hash join), never BroadcastNestedLoopJoin/CartesianProduct —
    the O(|L|*|R|) plans Spark emits for raw range predicates."""
    p = physical(queries.QUERIES["interval_events"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in p, p[:3000]
    assert "CartesianProduct" not in p, p[:3000]
    assert "Join" in p  # it IS a join — on the _bin equi key


def test_corpus_rollup_is_single_pass(spark):
    """rollup(lang, source) must expand grouping sets in ONE scan with
    map-side partial aggregation — exactly one hash exchange, no union
    of three separate aggregations."""
    p = physical(queries.QUERIES["corpus_rollup"](spark, SF))
    assert "Expand" in p, p[:2000]
    assert p.count("Exchange hashpartitioning") == 1, p[:3000]
    assert "Union" not in p, p[:2000]


def test_digest_prune_is_broadcast_only(spark):
    """Both the digest pass and the exact semi-join must broadcast —
    the 10^12-row fact side never shuffles in this query (its only
    exchange is the final tiny groupBy on returnflag)."""
    p = physical(queries.QUERIES["digest_prune_agg"](spark, SF))
    assert p.count("BroadcastHashJoin") + p.count("BroadcastQueryStage") >= 2, p[:3000]
    assert "SortMergeJoin" not in p, p[:3000]
    # allowed exchanges: the final tiny groupBy (l_returnflag) and the
    # keys-side digest distinct (_kh — 8-byte rows); the lineitem fact
    # side itself must never hash-exchange
    ex = [ln for ln in p.splitlines() if "Exchange hashpartitioning" in ln]
    assert all(("l_returnflag" in ln) or ("_kh" in ln) for ln in ex), ex


def test_runtime_bloom_filter_injection_fires(spark):
    """Spark's own runtime Bloom-filter injection (the >10^8-key scale
    path digest_semi_prune documents) must actually fire in this build
    when a selective creation side joins a large probe side: with the
    size thresholds scaled to the test tables, the optimized plan
    carries bloom_filter_agg/might_contain on the probe scan."""
    old_app = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    old_bhj = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB")
        # force a shuffle join: bloom injection targets shuffle joins
        # (a broadcast join already prunes at the probe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloomFilter" in opt or "might_contain" in opt, opt[:4000]
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_app)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bhj)


def test_bm25_broadcasts_stats_and_uses_topk(spark):
    """BM25's df table and (n_docs, avgdl) scalar must ride broadcast
    exchanges (never shuffle the posting list against them) and the final
    cut must be TakeOrderedAndProject, not a global sort."""
    p = physical(queries.QUERIES["bm25_topk"](spark, SF))
    assert "TakeOrderedAndProject" in p, p[:2000]
    n_bcast = p.count("BroadcastExchange") + p.count("BroadcastQueryStage")
    assert n_bcast >= 2, p[:3000]
    assert "CartesianProduct" not in p, p[:2000]
    assert "SortMergeJoin" not in p, p[:2000]


def test_duplicate_passages_no_loop_joins_single_window(spark):
    """The passage-dedup re-join must be an equi-join on the shingle hash
    (no Cartesian/NestedLoop anywhere) and the islands merge must ride
    ONE per-doc window sort, not a global sort."""
    p = physical(queries.QUERIES["duplicate_passages"](spark, SF))
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]
    assert "Sort [doc_id" in p or "Window" in p, p[:2000]
    assert "Exchange rangepartitioning" not in p, p[:2000]


def test_q18_aggregates_before_join(spark):
    """Q18's plan must pre-aggregate lineitem to per-order totals BEFORE
    joining orders (join input = qualifying orders, not 6M lineitems):
    a HashAggregate must appear below the first SortMergeJoin/
    BroadcastHashJoin in the plan tree, and customer must broadcast."""
    p = physical(queries.QUERIES["tpch_q18"](spark, SF))
    assert "TakeOrderedAndProject" in p, p[:2000]
    first_join = min(i for i in (p.find("SortMergeJoin"),
                                 p.find("BroadcastHashJoin"))
                     if i != -1)
    agg_positions = [i for i in range(len(p))
                     if p.startswith("HashAggregate", i)]
    assert any(i > first_join for i in agg_positions), p[:3000]
    assert p.count("BroadcastExchange") + p.count("BroadcastQueryStage") \
        >= 1, p[:3000]


def test_q10_pushes_returnflag_and_uses_topk(spark):
    p = plan_of(queries.QUERIES["tpch_q10"](spark, SF))
    assert "PushedFilters" in p, p[:1500]
    pushed = p.split("PushedFilters")[1].splitlines()[0]
    assert "l_returnflag" in pushed, pushed
    pp = physical(queries.QUERIES["tpch_q10"](spark, SF))
    assert "TakeOrderedAndProject" in pp, pp[:2000]


def test_trigram_link_broadcasts_dictionary_no_cartesian(spark):
    """The dictionary side of the fuzzy linker must broadcast: blocking
    happens through the trigram equi-join, never a cartesian score-all."""
    p = physical(queries.QUERIES["entity_link_fuzzy"](spark, SF))
    assert "BroadcastHashJoin" in p, p[:2000]
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_dense_node_ids_windows_are_bucket_partitioned(spark):
    """The corpus-sized window must partition by the hash bucket; the
    only global (empty-partition-spec) window runs over the tiny
    bucket-totals table AFTER its aggregation — never over the corpus."""
    from pyspark.sql import functions as F
    from legal_ner_spark.operators import graph
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ids = graph.dense_node_ids(
        docs.select(F.col("text").alias("node")))
    p = physical(ids)
    import re
    specs = re.findall(r"Window \[.*?windowspecdefinition\(([^)]*)\)", p)
    assert specs, p[:2000]
    # every windowspecdefinition either references _b (bucket window) or
    # follows the bucket-totals aggregate (global over ≤4096 rows)
    bucketed = [s for s in specs if "_b" in s]
    assert bucketed, specs


def test_negative_samples_all_equi_joins(spark):
    p = physical(queries.QUERIES["kg_negative_samples"](spark, SF))
    assert "CartesianProduct" not in p
    # the only nested-loop is the 1-row n_nodes broadcast
    import re
    bnlj = p.count("BroadcastNestedLoopJoin")
    assert bnlj <= 1, p[:3000]
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p \
        or "BroadcastHashJoin" in p


def test_hash_split_is_pure_projection(spark):
    p = physical(queries.QUERIES["dataset_split"](spark, SF))
    assert "Exchange" not in p, p[:2000]


def test_zipf_rank_window_is_freq_partitioned(spark):
    """The vocabulary-sized rank window must partition by frequency
    class; only the tiny distinct-freq table gets the global cumulative
    window (the prefix-sum idiom)."""
    import re
    p = physical(queries.QUERIES["zipf_slope"](spark, SF))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert any(s.startswith("f#") or ", f#" in s or s.split(",")[0].strip().startswith("f#")
               for s in specs), specs


def test_prefix_filter_join_is_equi_only(spark):
    """The exact similarity join must stay equi-join shaped: candidates
    from the prefix-shingle hash join, never a cartesian/theta join."""
    p = physical(queries.QUERIES["dedup_prefix_filter"](spark, SF))
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]


def test_hybrid_rrf_fuses_without_cartesian(spark):
    """Both retrieval legs keep their scale shapes (broadcasts +
    TakeOrdered); the only cross product is the 1-row query-vector
    broadcast; fusion is a tiny full-outer join."""
    p = physical(queries.QUERIES["hybrid_rrf"](spark, SF))
    assert "CartesianProduct" not in p, p[:2000]
    assert "TakeOrderedAndProject" in p, p[:2000]


def test_ktruss_and_walks_are_equi_only(spark):
    """The per-round triangle enumeration and the per-step walk
    transition must stay equi-join shaped — a theta/cartesian join in
    either loop body is quadratic at scale."""
    for name in ("kg_ktruss", "kg_random_walks"):
        p = physical(queries.QUERIES[name](spark, SF))
        assert "CartesianProduct" not in p, (name, p[:2000])
        assert "BroadcastNestedLoopJoin" not in p, (name, p[:2000])


def test_random_walks_window_is_src_partitioned(spark):
    """The neighbor-ranking window must partition by the source node —
    an unpartitioned (global) window would serialize the whole edge
    table through one task."""
    import re
    from legal_ner_spark.operators import graph
    e = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    p = physical(graph.random_walks(e, n_walks=1, walk_len=1))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert specs and all("nsrc#" in s for s in specs), specs


def test_semantic_dedup_pairs_are_cluster_equi_join(spark):
    """SemDeDup's pair tier must be the within-cluster equi-join on
    centroid_id — a CartesianProduct over the corpus would be the
    all-pairs shape the clustering exists to avoid.  (The
    BroadcastNestedLoopJoin that DOES appear is ivf_assign's
    8-row-centroid broadcast crossJoin — the accepted scalar idiom,
    map-side, never corpus × corpus.)"""
    p = physical(queries.QUERIES["semantic_dedup"](spark, SF))
    assert "CartesianProduct" not in p, p[:2000]
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p \
        or "BroadcastHashJoin" in p, p[:2000]


def test_curation_pipeline_single_pass_shape(spark):
    """The composed curation flow: gates are projections/filters (no
    Exchange before the fingerprint groupBy), the benchmark shingle
    side is broadcast, and nothing compiles to a loop join."""
    p = physical(queries.QUERIES["curation_pipeline"](spark, SF))
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]
    assert "BroadcastExchange" in p or "BroadcastQueryStage" in p, p[:2000]


def test_gopher_quality_is_zero_exchange_projection(spark):
    """The Gopher quality rules must stay a scan-local projection — any
    Exchange would mean the cheapest gate in the curation stack
    shuffles the full corpus."""
    p = physical(queries.QUERIES["gopher_quality"](spark, SF))
    assert "Exchange" not in p, p[:2000]
    assert "ReadSchema" in p


def test_dsir_distributions_broadcast_corpus_shuffles_once(spark):
    """DSIR: both 256-bucket distributions and the totals rows join in
    as broadcasts; the only hash exchanges on the gram table are the
    per-doc aggregation — never a loop join."""
    p = physical(queries.QUERIES["dsir_weights"](spark, SF))
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastExchange" in p or "BroadcastQueryStage" in p, p[:2000]


def test_gopher_repetition_windows_are_doc_partitioned(spark):
    """Every window in the repetition rules must be doc_id-partitioned —
    an unpartitioned window would sort the whole corpus on one task."""
    p = physical(queries.QUERIES["gopher_repetition"](spark, SF))
    # an unpartitioned window compiles to Exchange SinglePartition
    assert "SinglePartition" not in p, p[:2000]
    assert "CartesianProduct" not in p, p[:2000]


def test_quality_classifier_default_is_zero_exchange(spark):
    """The default hashed-linear scorer must stay a scan-local
    projection — bucket hash, weight derivation, and the per-doc mean
    all run inside array lambdas, so the corpus never shuffles."""
    p = physical(queries.QUERIES["quality_classifier"](spark, SF))
    assert "Exchange" not in p, p[:2000]
    assert "ReadSchema" in p


def test_source_quota_sample_has_no_per_key_window(spark):
    """The quota cap must never rank a whole source in one window
    partition: every window is (key, radix-cell)-partitioned and every
    exchange carries the cell column, so a hot domain spreads."""
    p = physical(queries.QUERIES["source_quota_sample"](spark, SF))
    assert "SinglePartition" not in p, p[:2000]
    assert "CartesianProduct" not in p, p[:2000]
    # the row-ranking exchange must carry the cell column next to the
    # key (the source-only exchanges feed the ≤256-row/key count table)
    import re
    cells = [f for f in re.findall(r"hashpartitioning\([^)]*\)", p)
             if "_cell" in f]
    assert cells, p[:3000]
    # and the row_number window itself is (key, cell)-specified
    assert any("_cell" in f for f in re.findall(
        r"row_number\(\) windowspecdefinition\([^)]*\)", p)), p[:3000]


def test_curation_v2_classifier_fuses_into_scan(spark):
    """The composed v2 flow: no loop join anywhere, no single-partition
    window, and the quota stage's ranking exchanges carry the radix
    cell (the hot-domain guard survives the composition)."""
    import re
    p = physical(queries.QUERIES["curation_pipeline_v2"](spark, SF))
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]
    assert "SinglePartition" not in p, p[:2000]
    assert any("_cell" in f
               for f in re.findall(r"hashpartitioning\([^)]*\)", p)), p[:3000]


def test_datalog_maintenance_tier_has_no_loop_joins(spark):
    """The round-5 Datalog tier (DRed retraction, stratified negation,
    signed-delta maintenance, aggregation, goal-directed) must compile
    to equi-joins and hash aggregates only — every MINUS is an anti
    equi-join on shared variables, every pinned diff leg a broadcast
    hash join; a CartesianProduct or BroadcastNestedLoopJoin anywhere
    in these plans would not survive the 84M store, let alone 100 TB."""
    for name in ("kg_rules_retract", "kg_rules_stratified",
                 "kg_rules_aggregate", "kg_rules_goal",
                 "kg_rules_stratified_maintain", "kg_update_maintain"):
        p = physical(queries.QUERIES[name](spark, SF))
        assert "CartesianProduct" not in p, (name, p[:2000])
        assert "BroadcastNestedLoopJoin" not in p, (name, p[:2000])


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """A partitioned fact joined to a selective dimension must carry a
    dynamicpruning subquery on the partition column — at 100 TB this
    is the difference between scanning 1 partition and all of them.
    (Static pruning is audited elsewhere; this pins the RUNTIME kind.)"""
    from pyspark.sql import functions as F
    loc = str(tmp_path / "fact_parts")
    (spark.range(2000)
     .select((F.col("id") % 20).alias("pk"), F.col("id").alias("v"))
     .write.partitionBy("pk").parquet(loc))
    fact = spark.read.parquet(loc)
    dim = spark.createDataFrame([(3, "keep"), (7, "keep")],
                                ["pk", "tag"])
    q = (fact.join(dim.filter(F.col("tag") == "keep"), "pk")
         .groupBy("pk").agg(F.sum("v").alias("s")))
    p = plan_of(q)
    assert "dynamicpruning" in p.lower(), p[:3000]
    # and the result is right (pruning must not drop rows)
    got = {r.pk: r.s for r in q.collect()}
    assert set(got) == {3, 7}

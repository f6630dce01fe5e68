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


def test_sessionize_single_exchange(spark):
    p = physical(queries.QUERIES["sessionize"](spark, SF))
    n_hash_exchanges = p.count("Exchange hashpartitioning")
    assert n_hash_exchanges == 1, p[:3000]
    assert "user_id" in p.split("Exchange hashpartitioning")[1][:120]


def test_kg_extraction_plan_has_no_cartesian_or_global_window(spark):
    p = physical(queries.QUERIES["kg_triples"](spark, SF))
    assert "CartesianProduct" not in p
    # fused extraction: text assembly + tagging + postprocess run inside
    # Arrow-stage python evals, not as joins
    assert "MapInPandas" in p or "mapInPandas" in p.lower(), p[:2000]


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

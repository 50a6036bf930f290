"""Plan-shape pins for the TPC-H completion wave (queries_tpch.py):
each query exists to exercise a specific planner capability, so the
test asserts that capability actually fired — a regression here is a
100 TB cost bug even while results stay oracle-green.
"""

from __future__ import annotations

from cloud_dataflow_batch_processing_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    count_shuffles,
)
from cloud_dataflow_batch_processing_spark.queries import REGISTRY, queries

queries()


def _executed_plan(spark, sf_dir, name: str) -> str:
    return (
        REGISTRY[name]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def _optimized_plan(spark, sf_dir, name: str) -> str:
    return (
        REGISTRY[name]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )


def test_q17_correlated_avg_decorrelates(spark, sf_dir):
    """The correlated AVG subquery must decorrelate into a standalone
    per-part aggregate joined back on the correlation key — never a
    per-outer-row re-scan of lineitem (which would be O(n^2) at
    scale). Visible in the optimized plan as an Aggregate over
    l_partkey computing avg(l_quantity) with NO remaining subquery
    expression in the filter."""
    plan = _optimized_plan(spark, sf_dir, "q17_small_quantity_revenue")
    assert "avg(l_quantity" in plan, plan[:2000]
    # decorrelation happened: no scalar-subquery expression survives
    assert "scalar-subquery" not in plan, plan[:2000]
    df = REGISTRY["q17_small_quantity_revenue"].fn(spark, sf_dir)
    assert_no_cartesian(df)


def test_q19_disjunction_prunes_both_scans(spark, sf_dir):
    """Catalyst must derive the single-table implications of the
    disjunction and push them below the join: the part scan carries
    the brand/size OR, the lineitem scan the quantity OR — even
    though the combined predicate can only evaluate after the join.
    Without this the join would see both tables unfiltered."""
    df = REGISTRY["q19_disjunctive_predicates"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # part side: the brand/size OR reaches the part scan's PushedFilters
    assert "Or(Or(And(EqualTo(p_brand" in plan, plan[:3000]
    # lineitem side: the quantity-range OR reaches the lineitem scan
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity" in plan, plan[:3000]
    assert_no_cartesian(df)


def test_q21_one_aggregation_no_correlated_rescans(spark, sf_dir):
    """The Spark side replaces the EXISTS / NOT-EXISTS correlated
    pair with one per-order aggregate + join-back: the plan must
    contain the distinct-supplier aggregate and NO nested-loop join,
    and lineitem appears at most twice (stats pass + probe pass) —
    not the three passes the literal SQL form would need."""
    df = REGISTRY["q21_waiting_suppliers"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") <= 2, plan[:3000]
    assert_no_cartesian(df)


def test_q15_scalar_max_is_subquery_not_join(spark, sf_dir):
    """The MAX(total_revenue) comparison must plan as a one-row scalar
    subquery (computed once, broadcast into the filter), not a join
    against the revenue table."""
    plan = _executed_plan(spark, sf_dir, "q15_top_supplier")
    assert "Subquery" in plan or "subquery" in plan, plan[:2000]
    df = REGISTRY["q15_top_supplier"].fn(spark, sf_dir)
    assert_no_cartesian(df)


def test_q7_q8_dimensions_broadcast(spark, sf_dir):
    """Both nation roles (and region) must broadcast — shuffling a
    25-row dimension against the fact chain would be a planning
    failure."""
    for name, expect in (("q7_volume_shipping", 2), ("q8_market_share", 2)):
        df = REGISTRY[name].fn(spark, sf_dir)
        assert_broadcast_join(df, expect=expect)
        assert_no_cartesian(df)


def test_q2_agg_then_join_shuffle_budget(spark, sf_dir):
    """Q2's correlated-MIN-as-agg-then-join must stay within its
    semantic shuffle minimum (offers aggregate, best-cost aggregate,
    final join alignments) AND keep the hand-pushed supplier
    restriction BELOW the offers aggregate: a broadcast LeftSemi on
    the lineitem side, so the per-(part, supplier) MIN only processes
    the region's share of the fact table — the pushdown Catalyst
    doesn't derive across a groupBy."""
    df = REGISTRY["q2_min_cost_supplier"].fn(spark, sf_dir)
    assert count_shuffles(df) <= 5, count_shuffles(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan[:2000]
    assert_no_cartesian(df)


def test_q13_outer_join_preserves_customers(spark, sf_dir):
    """The ON-clause filter must NOT push into a WHERE (which would
    turn the outer join inner and drop order-less customers): the
    executed plan keeps a LeftOuter join and the customer scan carries
    no orders-derived filter."""
    df = REGISTRY["q13_customer_order_distribution"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftOuter" in plan, plan[:2000]

"""Skew tooling tests: salted aggregates match unsalted results; bucketed
tables join with zero exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloud_dataflow_batch_processing_spark.operators.skew import (
    bucketed_join,
    salt_explode_small_side,
    salted_aggregate,
    write_bucketed,
)
from cloud_dataflow_batch_processing_spark.plans import count_shuffles


def test_salted_aggregate_matches_plain(spark, tables):
    li = tables["lineitem"]
    plain = {
        (r.l_returnflag): (r.n, r.total)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor("l_quantity")).alias("total"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag): (r.n, r.total)
        for r in salted_aggregate(
            li,
            "l_returnflag",
            {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "total": (F.sum(F.floor("l_quantity")), F.sum("total")),
            },
            num_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salt_explode_join_matches_plain(spark, tables):
    orders = tables["orders"].select("o_orderkey", "o_custkey")
    lineitem = tables["lineitem"].select(F.col("l_orderkey").alias("o_orderkey"), "l_partkey")
    plain = lineitem.join(orders, on="o_orderkey").count()
    big_s, small_s, cols = salt_explode_small_side(lineitem, orders, "o_orderkey", 8)
    assert big_s.join(small_s, on=cols).count() == plain


def test_bucketed_join_no_shuffle(spark, tables, tmp_path):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed(
        tables["orders"].select("o_orderkey", "o_totalprice"),
        "b_orders",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
        path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        tables["lineitem"].select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        ),
        "b_lineitem",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
        path=str(tmp_path / "b_lineitem"),
    )
    # force the planner off broadcast so the bucketed SortMergeJoin path
    # is exercised (what a fact-to-fact join at scale would do)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        assert count_shuffles(joined) == 0, "bucketed join must be exchange-free"
        assert joined.count() == tables["lineitem"].count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
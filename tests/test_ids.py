"""Scalable sequential IDs (operators/ids.py): rank-exactness vs the
window form, determinism across invocations, no single-task stage."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from cloud_dataflow_batch_processing_spark.operators.ids import assign_sequential_ids


def test_ids_match_global_window(spark, tables):
    o = tables["orders"].select("o_orderkey", "o_totalprice")
    got = {
        r["o_orderkey"]: r["seq_id"]
        for r in assign_sequential_ids(o, ["o_totalprice", "o_orderkey"]).collect()
    }
    want = {
        r["o_orderkey"]: r["rn"]
        for r in o.withColumn(
            "rn",
            F.row_number().over(Window.orderBy("o_totalprice", "o_orderkey")) - 1,
        ).collect()
    }
    assert got == want


def test_ids_contiguous_and_deterministic(spark, tables):
    o = tables["orders"].select("o_orderkey", "o_totalprice")
    a = assign_sequential_ids(o, ["o_totalprice", "o_orderkey"], num_partitions=7)
    ids = sorted(r["seq_id"] for r in a.collect())
    assert ids == list(range(len(ids)))  # contiguous 0..n-1, no gaps/dups
    b = assign_sequential_ids(o, ["o_totalprice", "o_orderkey"], num_partitions=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ids_no_single_partition_exchange(spark, tables):
    """The plan must contain NO SinglePartition exchange — the whole
    point vs the naive global window."""
    o = tables["orders"].select("o_orderkey", "o_totalprice")
    df = assign_sequential_ids(o, ["o_totalprice", "o_orderkey"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # the naive form DOES (sanity that the assertion can fail)
    naive = o.withColumn(
        "rn", F.row_number().over(Window.orderBy("o_totalprice"))
    )
    nplan = naive._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in nplan


def test_ids_empty_input(spark):
    df = spark.createDataFrame([], "k long, v long")
    out = assign_sequential_ids(df, ["v", "k"])
    assert out.count() == 0

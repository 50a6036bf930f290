"""CDC primitives (extensions/cdc.py): MERGE arms and SCD2 interval
chain properties on crafted fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_dataflow_batch_processing_spark.extensions.cdc import (
    apply_changes,
    scd2_intervals,
)


def test_apply_changes_three_arms(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [(2, "B", "U"), (3, None, "D"), (9, "new", "U")],
        "k long, v string, op string",
    )
    got = {r["k"]: r["v"] for r in apply_changes(base, changes, ["k"]).collect()}
    assert got == {1: "a", 2: "B", 9: "new"}  # kept, updated, inserted; 3 deleted


def test_apply_changes_empty_changeset_is_identity(spark):
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    empty = spark.createDataFrame([], "k long, v string, op string")
    assert [tuple(r) for r in apply_changes(base, empty, ["k"]).collect()] == [(1, "a")]


def test_scd2_interval_chain(spark):
    log = spark.createDataFrame(
        [
            (1, "bronze", 10, 100),
            (1, "silver", 20, 101),
            (1, "gold", 30, 102),
            (2, "bronze", 15, 103),
        ],
        "k long, state string, ts long, seq long",
    )
    rows = sorted(
        (r["k"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_intervals(log, ["k"], "ts", ["seq"]).collect()
    )
    assert rows == [
        (1, "bronze", 10, 20, False),
        (1, "gold", 30, None, True),
        (1, "silver", 20, 30, False),
        (2, "bronze", 15, None, True),
    ]
    # chain property: each key's intervals tile [first_ts, inf) with no
    # gaps/overlaps — valid_to of one row == valid_from of the next.


def test_scd2_current_sentinel(spark):
    log = spark.createDataFrame([(1, "x", 10, 0)], "k long, s string, ts long, q long")
    r = scd2_intervals(log, ["k"], "ts", ["q"], current_sentinel=9999).collect()[0]
    assert (r["valid_to"], r["is_current"]) == (9999, True)


def test_apply_changes_rejects_unknown_op(spark):
    """ADVICE r4: an unrecognized op value (typo'd 'u', 'I', NULL) must
    raise at execution, not silently delete the row."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    for bad in ["u", "I", None]:
        changes = spark.createDataFrame(
            [(2, "B", bad)], "k long, v string, op string"
        )
        with pytest.raises((Py4JJavaError, PySparkException), match="unrecognized|USER_RAISED"):
            apply_changes(base, changes, ["k"]).collect()


def test_apply_changes_valid_ops_unaffected_by_validation(spark):
    """The raise_error branch must be dead for clean changesets."""
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    changes = spark.createDataFrame(
        [(2, "B", "U"), (3, None, "D")], "k long, v string, op string"
    )
    got = {r["k"]: r["v"] for r in apply_changes(base, changes, ["k"]).collect()}
    assert got == {1: "a", 2: "B"}

def test_scd2_null_tiebreak_matches_oracle(spark):
    """ADVICE r8: a NULL TIEBREAK value (not just a NULL ts) must order
    identically cross-engine — Spark ASC is NULLS FIRST, DuckDB NULLS
    LAST, so every order column in the SQL twin needs an explicit
    NULLS FIRST or interval endpoints diverge."""
    import duckdb
    import pandas as pd

    from cloud_dataflow_batch_processing_spark.extensions.cdc import (
        scd2_intervals_sql,
    )

    rows = [
        (1, "a", 10, None),  # NULL tiebreak on equal ts
        (1, "b", 10, 5),
        (1, "c", 20, 1),
        (2, "d", 10, None),
    ]
    log = spark.createDataFrame(rows, "k long, state string, ts long, seq long")
    got_spark = sorted(
        (r["k"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_intervals(log, ["k"], "ts", ["seq"]).collect()
    )
    pdf = pd.DataFrame(rows, columns=["k", "state", "ts", "seq"]).astype(
        {"seq": "Int64"}
    )
    con = duckdb.connect()
    con.register("log", pdf)
    sql = scd2_intervals_sql("log", ["k"], "ts", ["seq"])
    got_duck = sorted(
        (int(k), s, int(vf), None if pd.isna(vt) else int(vt), bool(c))
        for k, s, ts, seq, vf, vt, c in con.execute(sql).fetchall()
    )
    assert got_spark == got_duck
    # and the NULL-seq row is the EARLIER version at its timestamp
    by_state = {s: (vf, vt) for _, s, vf, vt, _ in got_spark}
    assert by_state["a"] == (10, 10) and by_state["b"] == (10, 20)

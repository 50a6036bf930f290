"""Gopher repetition rules (extensions/repetition.py): crafted-fixture
semantics (top-n-gram coverage, duplicated-n-gram coverage, threshold
conjunction, NULL/empty docs), DuckDB twin parity on the fixture, and
the zero-shuffle plan pin."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from cloud_dataflow_batch_processing_spark.extensions import repetition as R


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # 8x "a b" alternation: top 2-gram ("a b", 2 chars) occurs 8
        # times in 16 one-char tokens -> frac 0.5, fails 0.20.
        (1, "a b a b a b a b a b a b a b a b"),
        # long clean doc (distinct multi-char tokens): passes all rules.
        (2, " ".join(f"tok{i:03d}" for i in range(200))),
        # planted duplicated 5-gram: "p q r s t" twice with distinct
        # filler between and after.
        (3, "p q r s t " + " ".join(f"f{i}" for i in range(20)) + " p q r s t"),
        (4, ""),
        (5, None),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ), pd.DataFrame(rows, columns=["doc_id", "text"])


def _stats(df):
    return {r["doc_id"]: r.asDict() for r in R.gopher_repetition_stats(df).collect()}


def test_top_ngram_coverage(spark, corpus):
    df, _ = corpus
    st = _stats(df)
    # doc 1: top 2-gram covers 8 occurrences x 2 chars of 16 chars.
    assert st[1]["top_2gram_frac"] == pytest.approx(1.0)
    assert st[1]["pass_repetition"] is False


def test_clean_long_doc_passes(spark, corpus):
    df, _ = corpus
    st = _stats(df)
    d = st[2]
    assert d["pass_repetition"] is True
    for n in R.TOP_NS:
        assert d[f"top_{n}gram_frac"] <= R.TOP_THRESHOLDS[n]
    for n in R.DUP_NS:
        assert d[f"dup_{n}gram_frac"] == 0.0


def test_planted_dup_5gram(spark, corpus):
    df, _ = corpus
    st = _stats(df)
    d = st[3]
    # "p q r s t" (5 chars) occurs twice; total chars = 10 + sum(len(f_i)).
    assert d["dup_5gram_frac"] > 0
    # the duplicated 6..10-grams do not exist (fillers are distinct)
    for n in (6, 7, 8, 9, 10):
        assert d[f"dup_{n}gram_frac"] == 0.0


def test_null_and_empty_docs(spark, corpus):
    df, _ = corpus
    st = _stats(df)
    assert st[4]["n_tokens"] == 0 and st[4]["total_chars"] == 0
    assert st[4]["top_2gram_frac"] is None
    assert st[4]["pass_repetition"] is True  # vacuous pass, as the oracle
    assert st[5]["n_tokens"] is None and st[5]["total_chars"] is None
    assert st[5]["pass_repetition"] is True


def test_fixture_matches_duckdb_twin(spark, corpus):
    df, pdf = corpus
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(R.gopher_repetition_sql()).df().sort_values(
        "doc_id"
    ).reset_index(drop=True)
    got = (
        R.gopher_repetition_stats(df)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = got.astype({c: want[c].dtype for c in want.columns})
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_shuffle_budget_plan(spark, corpus):
    # r11: scan-shaped inputs with fewer splits than cores fan out
    # first (ONE narrow exchange of raw text — the substring span-stage
    # pattern), so the Arrow pass parallelizes instead of running the
    # whole corpus on one task; at real scale (splits >= cores) the
    # fan-out is a no-op and the plan is zero-shuffle again.
    from cloud_dataflow_batch_processing_spark.plans import count_shuffles

    df, _ = corpus
    out = R.gopher_repetition_stats(df)
    assert count_shuffles(out) <= 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # the Arrow pass, not row Python
    # already-spread input (>= cores partitions): no fan-out exchange
    sc = spark.sparkContext
    spread = df.repartition(sc.defaultParallelism, "doc_id")
    out2 = R.gopher_repetition_stats(spread)
    assert count_shuffles(out2) == 1  # only the caller's own repartition

"""Hashed linear quality classifier (extensions/classifier.py):
Python-oracle exactness, empty/NULL contracts, procedural==table-path
equivalence, and the zero-shuffle plan pin."""

from __future__ import annotations

from cloud_dataflow_batch_processing_spark.extensions import classifier as CLF
from cloud_dataflow_batch_processing_spark.functions.text import HASH_MOD, HASH_MULT


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_score(text, n_buckets=4096, bias_milli=50):
    if text is None:
        return (None, None, None)
    toks = text.split()
    w = 0
    for tok in toks:
        h = 0
        for ch in tok:
            h = (h * HASH_MULT + ord(ch)) % HASH_MOD
        w += (h % n_buckets) * CLF.SCRAMBLE % HASH_MOD % 2001 - 1000
    import math

    raw = (w + bias_milli) / (1000.0 * max(len(toks), 1))
    score = math.floor(raw * 10000.0 + 0.5) / 10000.0
    return (len(toks), score, score > 0.0)


def test_scores_match_python_oracle(spark):
    texts = [(1, "the quick brown fox"), (2, "a"), (3, "zz zz zz"), (4, "x y z w v")]
    got = {
        r["doc_id"]: (r["n_tokens"], r["score"], r["keep"])
        for r in CLF.hashed_linear_score(_docs(spark, texts)).collect()
    }
    assert got == {i: _py_score(t) for i, t in texts}


def test_empty_and_null_contracts(spark):
    """Empty/whitespace docs: 0 tokens, score = bias/1000 (the
    division clamps at 1); NULL text propagates NULL everywhere."""
    d = _docs(spark, [(1, ""), (2, "   "), (3, None)])
    got = {
        r["doc_id"]: (r["n_tokens"], r["score"], r["keep"])
        for r in CLF.hashed_linear_score(d).collect()
    }
    assert got == {1: (0, 0.05, True), 2: (0, 0.05, True), 3: (None, None, None)}


def test_table_path_equals_procedural(spark):
    """score_with_weight_table over the enumerated procedural weights
    == hashed_linear_score — real trained weights are a drop-in."""
    d = _docs(
        spark,
        [(1, "the quick brown fox"), (2, ""), (3, None), (4, "zz zz")],
    )
    proc = {tuple(r) for r in CLF.hashed_linear_score(d).collect()}
    tab = {
        tuple(r)
        for r in CLF.score_with_weight_table(
            d, CLF.procedural_weight_table(spark)
        ).collect()
    }
    assert tab == proc


def test_zero_shuffle_codegen_plan(spark):
    """The certified path is scan -> projection: 0 shuffles, no Python
    eval anywhere."""
    from cloud_dataflow_batch_processing_spark.plans.inspect import (
        count_shuffles,
        executed_plan,
    )

    df = CLF.hashed_linear_score(_docs(spark, [(1, "a b c")]))
    assert count_shuffles(df) == 0
    assert "EvalPython" not in executed_plan(df)

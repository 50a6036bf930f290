"""Unigram frequency-class LM scoring (extensions/lm.py): merge
algebra, unseen-token smoothing, empty-doc contract, and the
integer-exactness that makes the score cross-engine certifiable."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_dataflow_batch_processing_spark.extensions import lm as LM


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_freq_merge_equals_whole(spark):
    """Counter-sum merge of shard-trained tables == training on the
    union — the incremental posture claimed in the module docstring."""
    d = _docs(
        spark,
        [(1, "a b a"), (2, "b c"), (3, "a c c d"), (4, "d d a b")],
    )
    whole = {
        (r["tok"], r["cnt"]) for r in LM.unigram_freq(d).collect()
    }
    a = LM.unigram_freq(d.filter(F.col("doc_id") <= 2))
    b = LM.unigram_freq(d.filter(F.col("doc_id") > 2))
    merged = {(r["tok"], r["cnt"]) for r in LM.unigram_freq_merge(a, b).collect()}
    assert merged == whole


def test_freq_class_is_floor_log2(spark):
    rows = spark.createDataFrame(
        [(1,), (2,), (3,), (4,), (7,), (8,), (1023,), (1024,)], "cnt long"
    ).select(LM.freq_class(F.col("cnt")).alias("cls"))
    assert [r["cls"] for r in rows.collect()] == [0, 1, 1, 2, 2, 3, 9, 10]


def test_unigram_score_self_corpus(spark):
    """Self-scored corpus: every token seen; exact mean class. Corpus:
    'a' appears 4x (class 2), 'b' 2x (class 1), 'c' 1x (class 0)."""
    d = _docs(spark, [(1, "a a b"), (2, "a a b c")])
    freq = LM.unigram_freq(d)
    got = {r["doc_id"]: (r["n_tokens"], r["lm_score"]) for r in LM.unigram_score(d, freq).collect()}
    # doc 1: classes 2,2,1 -> 5/3 = 1.6667 ; doc 2: 2,2,1,0 -> 5/4 = 1.25
    assert got == {1: (3, 1.6667), 2: (4, 1.25)}


def test_unigram_score_unseen_tokens_and_empty_docs(spark):
    """Scoring against a FOREIGN freq table: unseen tokens take
    unseen_class; docs with no tokens produce no row."""
    train = _docs(spark, [(10, "a a b")])
    freq = LM.unigram_freq(train)  # a->2 (cls 1), b->1 (cls 0)
    score_me = _docs(spark, [(1, "a zzz"), (2, "   "), (3, "")])
    got = {r["doc_id"]: (r["n_tokens"], r["lm_score"]) for r in LM.unigram_score(score_me, freq).collect()}
    # doc 1: cls(a)=1, zzz unseen -> -1 ; mean = 0/2 = 0.0
    assert got == {1: (2, 0.0)}


def test_vocab_coverage_values_and_overlarge_k(spark):
    """Exact coverage math, and a top_k beyond the vocabulary clamps to
    full coverage (1.0) instead of silently dropping the point."""
    from pyspark.sql import functions as F

    d = _docs(spark, [(1, "a a a b"), (2, "a b c")])  # a:4 b:2 c:1, total 7
    freq = LM.unigram_freq(d)
    got = {r["top_k"]: (r["covered_tokens"], r["coverage"])
           for r in LM.vocab_coverage(freq, [1, 2, 100]).collect()}
    assert got[1] == (4, 0.5714)   # floor(4/7*1e4+0.5)/1e4
    assert got[2] == (6, 0.8571)
    assert got[100] == (7, 1.0)    # clamped to n_types=3

def test_vocab_coverage_empty_corpus_yields_empty_curve(spark):
    """Empty-corpus contract: no rank exists for any k, so the curve is
    EMPTY — not a fabricated 0/0 point (extensions/lm.py)."""
    freq = LM.unigram_freq(_docs(spark, [(1, "   "), (2, "")]))
    out = LM.vocab_coverage(freq, [1, 10])
    assert out.count() == 0
    assert out.columns == ["top_k", "covered_tokens", "coverage"]


def test_vocab_coverage_rejects_empty_top_ks(spark):
    import pytest

    freq = LM.unigram_freq(_docs(spark, [(1, "a b")]))
    with pytest.raises(ValueError, match="top_ks"):
        LM.vocab_coverage(freq, [])


def test_vocab_coverage_global_window_is_bounded(spark):
    """Scale pin: the single-partition (unpartitioned) rank window must
    run AFTER the 64-bucket partial top-kmax reduction — the plan's
    bucketed window (partitioned, parallel) feeds the global one, so
    the global sort sees <= 64*kmax rows regardless of vocab size."""
    d = _docs(spark, [(i, f"tok{i} tok{i % 7} x y") for i in range(50)])
    out = LM.vocab_coverage(LM.unigram_freq(d), [5, 10])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # The per-bucket partial plans as WindowGroupLimit (Spark's top-K
    # pushdown: per-partition Partial + per-bucket Final limit), so the
    # rows entering the unpartitioned global window are <= 64*kmax.
    assert "WindowGroupLimit" in plan
    assert "__brank" in plan  # the partial filter between the two windows
    # The curve points attach via an EQUI broadcast join, not a BNLJ
    # over the ranked frame.
    assert "BroadcastHashJoin" in plan
    # And the curve is still exact after the reduction.
    got = {r["top_k"]: r["covered_tokens"] for r in out.collect()}
    full = (
        LM.unigram_freq(d)
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .collect()
    )
    assert got[5] == sum(r["cnt"] for r in full[:5])
    assert got[10] == sum(r["cnt"] for r in full[:10])


# ---------------------------------------------------------------------------
# BPE merge-pair counting (vocabulary induction, round 11)
# ---------------------------------------------------------------------------


def test_bpe_pair_counts_fixture(spark):
    """'a a a b' contributes (a,a)x2, (a,b)x1 — overlapping pairs each
    count; docs with <2 tokens and NULL text contribute nothing."""
    d = _docs(
        spark,
        [(1, "a a a b"), (2, "a b"), (3, "x"), (4, ""), (5, None), (6, "b a")],
    )
    got = {
        (r["left_tok"], r["right_tok"]): r["pair_count"]
        for r in LM.bpe_merge_pair_counts(d, top_k=10).collect()
    }
    assert got == {("a", "a"): 2, ("a", "b"): 2, ("b", "a"): 1}


def test_bpe_pair_counts_tie_and_limit_order(spark):
    """top_k cuts on the (count DESC, left ASC, right ASC) total order
    — the limit boundary is deterministic under ties."""
    d = _docs(spark, [(1, "b c"), (2, "a d"), (3, "a c")])
    rows = [
        (r["left_tok"], r["right_tok"], r["pair_count"])
        for r in LM.bpe_merge_pair_counts(d, top_k=2).collect()
    ]
    assert rows == [("a", "c", 1), ("a", "d", 1)]


def test_bpe_pair_counts_merge_across_shards(spark):
    """Pair counts are counter-sum mergeable — the incremental posture:
    counting shards then summing == counting the union."""
    d = _docs(spark, [(1, "a b a b"), (2, "b a"), (3, "a b c"), (4, "c c a")])
    whole = {
        (r["left_tok"], r["right_tok"]): r["pair_count"]
        for r in LM.bpe_merge_pair_counts(d, top_k=100).collect()
    }
    halves = [
        LM.bpe_merge_pair_counts(d.filter(F.col("doc_id") <= 2), top_k=100),
        LM.bpe_merge_pair_counts(d.filter(F.col("doc_id") > 2), top_k=100),
    ]
    merged: dict = {}
    for h in halves:
        for r in h.collect():
            k = (r["left_tok"], r["right_tok"])
            merged[k] = merged.get(k, 0) + r["pair_count"]
    assert merged == whole


def test_bpe_pair_counts_plan(spark):
    """One pair-key hash-agg shuffle; the explode is a codegen
    transform (no Python); top-k plans as TakeOrderedAndProject, not a
    global sort."""
    from cloud_dataflow_batch_processing_spark.plans.inspect import (
        count_shuffles,
        executed_plan,
    )

    d = _docs(spark, [(1, "a b c d e"), (2, "b c d")])
    df = LM.bpe_merge_pair_counts(d, top_k=5)
    plan = executed_plan(df)
    assert count_shuffles(df) == 1
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# BPE trainer (count -> adopt -> re-segment loop) vs a pure-Python oracle
# ---------------------------------------------------------------------------


def _py_bpe(texts, n_merges, min_count=2, sep="\x1e"):
    """Independent reference: same adoption tiebreak (count DESC, left
    ASC, right ASC), same leftmost-greedy non-overlapping re-segment."""
    toks = {i: t.split() for i, t in texts.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for t in toks.values():
            for i in range(len(t) - 1):
                counts[(t[i], t[i + 1])] = counts.get((t[i], t[i + 1]), 0) + 1
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < min_count:
            break
        merges.append((a, b, c))
        j = a + sep + b
        for k, t in toks.items():
            out, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                    out.append(j)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            toks[k] = out
    return merges, toks


def _run_both(spark, texts, n_merges, **kw):
    d = _docs(spark, list(texts.items()))
    merges, seg = LM.bpe_train(d, n_merges=n_merges, **kw)
    got_seg = {r["doc_id"]: list(r["t"]) for r in seg.collect()}
    exp_merges, exp_seg = _py_bpe(texts, n_merges, **kw)
    return (merges, got_seg), (exp_merges, exp_seg)


def test_bpe_train_matches_python_oracle(spark):
    """Merge sequence AND final segmentation match the reference on a
    corpus exercising overlap ('a a a'), ties, and merged-unit reuse
    (a merge's output participating in a later merge)."""
    texts = {
        1: "a a a b c",
        2: "a b c a b",
        3: "b c b c a a",
        4: "c a a b",
    }
    (merges, seg), (exp_merges, exp_seg) = _run_both(spark, texts, n_merges=5)
    assert merges == exp_merges
    assert seg == exp_seg
    # merged units really chain: some adopted pair contains the separator
    assert any("\x1e" in a or "\x1e" in b for a, b, _ in merges)


def test_bpe_train_early_stop_below_min_count(spark):
    """All pairs unique -> best count 1 < min_count=2 -> zero merges,
    segmentation unchanged."""
    texts = {1: "a b c", 2: "d e f"}
    (merges, seg), (exp_merges, exp_seg) = _run_both(spark, texts, n_merges=4)
    assert merges == exp_merges == []
    assert seg == {1: ["a", "b", "c"], 2: ["d", "e", "f"]}


def test_bpe_train_seeded_random_sweep(spark):
    """120-doc seeded-random corpus over a 5-token alphabet: the full
    (merge table, segmentation) pair matches the reference — the same
    adversarial style as the VCF/dialect property sweeps."""
    import random

    rng = random.Random(1107)
    texts = {
        i: " ".join(rng.choice("abcde") for _ in range(rng.randrange(0, 14)))
        for i in range(120)
    }
    texts = {i: t for i, t in texts.items() if t}
    (merges, seg), (exp_merges, exp_seg) = _run_both(spark, texts, n_merges=6)
    assert merges == exp_merges
    assert seg == exp_seg


def test_bpe_encode_reproduces_training_segmentation(spark):
    """The train/encode contract: encoding the TRAINING corpus with
    the learned merge table reproduces bpe_train's final segmentation
    exactly (adoption-order greedy apply == the training trajectory)."""
    texts = {1: "a a a b c", 2: "a b c a b", 3: "b c b c a a", 4: "c a a b"}
    d = _docs(spark, list(texts.items()))
    merges, seg = LM.bpe_train(d, n_merges=5)
    trained = {r["doc_id"]: list(r["t"]) for r in seg.collect()}
    encoded = {
        r["doc_id"]: list(r["t"])
        for r in LM.bpe_encode(d, merges).select("doc_id", "t").collect()
    }
    assert encoded == trained


def test_bpe_encode_new_text_and_nulls(spark):
    """Unseen text segments with the learned merges; chained merges
    apply transitively; NULL text stays NULL."""
    train = _docs(spark, [(1, "x y z x y z"), (2, "x y z")])
    merges, _ = LM.bpe_train(train, n_merges=2)
    # learned: (x,y) then (x<sep>y, z)
    assert [(m[0], m[1]) for m in merges] == [("x", "y"), ("x\x1ey", "z")]
    new = _docs(spark, [(10, "q x y z x y q"), (11, None)])
    got = {
        r["doc_id"]: (list(r["t"]) if r["t"] is not None else None)
        for r in LM.bpe_encode(new, merges).select("doc_id", "t").collect()
    }
    assert got == {10: ["q", "x\x1ey\x1ez", "x\x1ey", "q"], 11: None}


def test_bpe_encode_zero_shuffle_single_arrow_pass(spark):
    """Plan pin: no Exchange; exactly one ArrowEvalPython node however
    many merges the table holds."""
    from cloud_dataflow_batch_processing_spark.plans.inspect import (
        count_shuffles,
        executed_plan,
    )

    d = _docs(spark, [(1, "a b a b")])
    merges = [("a", "b", 2), ("a\x1eb", "a\x1eb", 1)]
    df = LM.bpe_encode(d, merges)
    plan = executed_plan(df)
    assert count_shuffles(df) == 0
    assert plan.count("ArrowEvalPython") == 1

"""Property-based tests (hypothesis): codec roundtrips and the
engine-neutral hash model — random inputs, pinned invariants."""

from __future__ import annotations

import pytest

from hypothesis import given, settings, strategies as st

from cloud_dataflow_batch_processing_spark.schema import bq_schema_to_struct
from cloud_dataflow_batch_processing_spark.sources.tfrecord import (
    decode_records,
    encode_records,
)


@given(st.lists(st.binary(max_size=2000), max_size=20))
@settings(max_examples=50, deadline=None)
def test_tfrecord_roundtrip_any_bytes(records):
    assert decode_records(encode_records(records)) == records


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefghij_", min_size=1, max_size=10),
            st.sampled_from(["INTEGER", "STRING", "FLOAT", "DATE", "TIMESTAMP", "BOOLEAN"]),
            st.sampled_from(["NULLABLE", "REQUIRED", "REPEATED"]),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=50, deadline=None)
def test_bq_schema_mapper_total(fields):
    st_fields = [{"name": n, "type": t, "mode": m} for n, t, m in fields]
    struct = bq_schema_to_struct(st_fields)
    assert [f.name for f in struct.fields] == [n for n, _, _ in fields]
    for f, (_, _, mode) in zip(struct.fields, fields):
        assert f.nullable == (mode != "REQUIRED")


def _py_rolling_hash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % 1_000_000_007
    return acc


def test_rolling_hash_matches_python_model(spark):
    """One Spark pass over a batch of adversarial strings vs the pure
    Python model — the invariant the whole oracle strategy rests on."""
    import random

    random.seed(7)
    alphabet = "abcXYZ 0123!@#"
    samples = ["", "a", " ", "ab c"] + [
        "".join(random.choice(alphabet) for _ in range(random.randint(1, 60)))
        for _ in range(200)
    ]
    from cloud_dataflow_batch_processing_spark.functions.text import rolling_hash

    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r.h for r in df.select(rolling_hash("s").alias("h")).collect()]
    assert got == [_py_rolling_hash(s) for s in samples]


def test_rolling_hash_code_points_non_bmp(spark):
    """Code-point semantics beyond the BMP: Spark's split('')+ascii must
    iterate full code points (one 128512 for an emoji, never a surrogate
    pair), matching both the Python model (ord) and the DuckDB twin
    (unicode(substring(...))). Pins the behavior so a Spark upgrade that
    regressed to UTF-16 code-unit iteration would fail here, not in the
    driver's dedup hash checks."""
    import duckdb

    from cloud_dataflow_batch_processing_spark.functions.text import (
        rolling_hash,
        rolling_hash_sql,
    )

    samples = [
        "a\U0001F600b",            # astral emoji between ASCII
        "\U0001F600\U0001F680",    # consecutive astral
        "héllo wörld",   # latin-1 supplement
        "日本語",      # CJK (BMP)
        "\U0001D518\U0001D52B",    # mathematical alphanumerics (astral)
        "text \U0001F389 done",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r.h for r in df.select(rolling_hash("s").alias("h")).collect()]
    assert got == [_py_rolling_hash(s) for s in samples]
    con = duckdb.connect()
    duck = [
        con.execute(f"SELECT {rolling_hash_sql('s')} FROM (SELECT ? AS s)", [s]).fetchone()[0]
        for s in samples
    ]
    assert got == duck


def test_fast_hash_twins_value_identical(spark):
    """The Arrow-batched pandas_udf twins must be bit-identical to the
    HOF expressions — that identity is what lets the same DuckDB oracle
    verify both the slow and fast dedup paths."""
    from pyspark.sql import functions as F

    from cloud_dataflow_batch_processing_spark.extensions.dedup import token_hashes
    from cloud_dataflow_batch_processing_spark.functions.text import rolling_hash
    from cloud_dataflow_batch_processing_spark.functions.text_fast import (
        rolling_hash_fast,
        token_hashes_fast,
    )

    samples = [
        "", "a", "  spaced   out  ", "the quick brown fox", "emoji \U0001F600 here",
        "repeat repeat repeat repeat", "tabs\tand\nnewlines mixed",
        # ADVICE r3: leading/trailing NON-space whitespace and Unicode
        # whitespace — Spark trims only 0x20 and splits on ASCII \s
        # (keeping boundary empty tokens); python str.split() disagreed.
        "\tthe cat", "trailing tab\t", "\nnl lead", "\u00a0nbsp pad\u00a0", " \t mixed \n ",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    rows = df.select(
        rolling_hash("s").alias("slow_h"),
        rolling_hash_fast(F.col("s")).alias("fast_h"),
        token_hashes("s").alias("slow_th"),
        token_hashes_fast(F.col("s")).alias("fast_th"),
    ).collect()
    for r in rows:
        assert r.slow_h == r.fast_h
        assert list(r.slow_th) == list(r.fast_th)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=40
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=40
    ),
    st.booleans(),
)
@settings(max_examples=25, deadline=None)
@pytest.mark.slowsweep
def test_asof_join_matches_python_model(spark, left_rows, right_rows, inclusive):
    """asof_join against a direct python model on arbitrary small
    keyed timelines (duplicate right (k, ts) pre-aggregated to max id,
    as the contract requires)."""
    from pyspark.sql import functions as F

    from cloud_dataflow_batch_processing_spark.extensions.temporal import asof_join

    right_uniq = {}
    for k, t in right_rows:
        right_uniq[(k, t)] = max(right_uniq.get((k, t), -1), k * 1000 + t)
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)] or [(99, 0, -1)],
        "k int, lt int, lid int",
    )
    right = spark.createDataFrame(
        [(k, t, float(v)) for (k, t), v in right_uniq.items()] or [(98, 0, 0.0)],
        "k int, rt int, v double",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lt", right_ts="rt",
        right_cols=["v"], inclusive=inclusive,
    )
    got = {r["lid"]: (r["v"], r["__asof_ts"]) for r in out.collect()}

    want = {}
    for i, (k, t) in enumerate(left_rows):
        best = None
        for (rk, rt), v in right_uniq.items():
            if rk != k:
                continue
            if (rt <= t) if inclusive else (rt < t):
                if best is None or rt > best[1]:
                    best = (float(v), rt)
        want[i] = best if best else (None, None)
    if left_rows:
        assert got == want
    else:
        assert got == {-1: (None, None)}


def test_lang_quality_fast_twins_value_identical(spark, sf_dir):
    """The Arrow lang-id/quality twins must be bit-identical to the
    Column expressions — same oracle must verify either path."""
    from pyspark.sql import functions as F

    from cloud_dataflow_batch_processing_spark.functions.text import lang_id, quality_score
    from cloud_dataflow_batch_processing_spark.functions.text_fast import (
        lang_id_fast,
        quality_score_fast,
    )
    from cloud_dataflow_batch_processing_spark.sources.testdata import load_tables

    d = load_tables(spark, sf_dir)["documents"]
    edge = spark.createDataFrame(
        [(None,), ("",), ("   ",), ("the the der der",), ("x" * 600,), ("a. b! c?",),
         # ADVICE r3 tokenization-divergence cases: boundary tab/newline
         # and NBSP must tokenize as tokens() does (ASCII \s, space trim).
         ("\tthe cat",), ("the cat\n",), (" the cat ",), (" \t le la \n ",), ("\u00a0the\u00a0cat und",)],
        "text string",
    )
    for frame in (d, edge):
        cmp = frame.select(
            lang_id("text").alias("l1"), lang_id_fast(F.col("text")).alias("l2"),
            quality_score("text").alias("q1"), quality_score_fast(F.col("text")).alias("q2"),
        )
        bad = cmp.filter(
            (F.col("l1") != F.col("l2")) | (F.col("q1") != F.col("q2"))
        ).count()
        assert bad == 0


def test_quality_th_and_span_from_th_twins_value_identical(spark, sf_dir):
    """r12 combined-pass twins: ``quality_th_fast`` must reproduce
    (quality_score_fast, token_hashes_fast) field-for-field, and
    ``span_hashes_from_th_fast`` over the carried hashes must equal
    ``span_hashes_fast`` over the text — the identities that let
    corpus_build tokenize the corpus ONCE while the same DuckDB oracle
    still certifies every stage."""
    from pyspark.sql import functions as F

    from cloud_dataflow_batch_processing_spark.functions.text import quality_score
    from cloud_dataflow_batch_processing_spark.extensions.dedup import token_hashes
    from cloud_dataflow_batch_processing_spark.functions.text_fast import (
        quality_th_fast,
        span_hashes_fast,
        span_hashes_from_th_fast,
    )
    from cloud_dataflow_batch_processing_spark.sources.testdata import load_tables

    d = load_tables(spark, sf_dir)["documents"].select("text")
    edge = spark.createDataFrame(
        [(None,), ("",), ("   ",), ("the the der der",), ("x" * 600,), ("a. b! c?",),
         ("one two three four five six seven eight nine ten",),
         ("\tthe cat",), ("the cat\n",), (" \t le la \n ",), (" the cat und",)],
        "text string",
    )
    for frame in (d, edge):
        qt = frame.select(
            "text",
            quality_th_fast(F.col("text")).alias("__qt"),
            quality_score("text").alias("q_ref"),
            token_hashes("text").alias("th_ref"),
        )
        bad_q = qt.filter(
            F.col("__qt.q").eqNullSafe(F.col("q_ref")) == False  # noqa: E712
        ).count()
        bad_th = qt.filter(
            F.col("__qt.th").eqNullSafe(F.col("th_ref")) == False  # noqa: E712
        ).count()
        assert bad_q == 0 and bad_th == 0
        sp = qt.select(
            span_hashes_fast(F.col("text"), 8).alias("sp_text"),
            span_hashes_from_th_fast(F.col("__qt.th"), 8).alias("sp_th"),
        )
        bad_sp = sp.filter(
            F.col("sp_text").eqNullSafe(F.col("sp_th")) == False  # noqa: E712
        ).count()
        assert bad_sp == 0


@given(
    st.integers(1, 6),
    st.integers(1, 6),
    st.integers(0, 4),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, ftype, seed):
    """PNG encode→decode is the identity for any pixel content under
    any scanline filter (the filters are bijective per row)."""
    import random

    from cloud_dataflow_batch_processing_spark.extensions import media_codecs as M

    rng = random.Random(seed)
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    assert M.decode_png(M.encode_png(w, h, rgb, filter_type=ftype)) == (w, h, rgb)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
            st.sampled_from(["red", "blue", "green", "gren", "bleu"]),
        ),
        min_size=0,
        max_size=12,
        unique=True,
    ),
    st.integers(0, 6),
)
@settings(max_examples=25, deadline=None)
@pytest.mark.slowsweep
def test_fuzzy_blocked_pairs_matches_model(spark, names, max_dist):
    """fuzzy_blocked_pairs ≡ brute-force Levenshtein over exactly the
    pairs sharing a FIRST or LAST token (the declared blocking recall),
    with no duplicates and no pairs outside the blocks."""
    from cloud_dataflow_batch_processing_spark.extensions.dedup import fuzzy_blocked_pairs

    strs = sorted({f"{a} {b}" for a, b in names})
    df = spark.createDataFrame([(s,) for s in strs] or [("zz",)], "name string")
    got = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in fuzzy_blocked_pairs(df, max_dist=max_dist).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    want = {}
    pool = strs if strs else ["zz"]
    for i, a in enumerate(pool):
        for b in pool[i + 1 :]:
            at, bt = a.split(" "), b.split(" ")
            if (at[0] == bt[0] or at[-1] == bt[-1]) and lev(a, b) <= max_dist:
                want[(a, b)] = lev(a, b)
    assert got == want


@pytest.mark.slowsweep
def test_substring_dedup_invariants_random_corpus(spark):
    """Invariants of exact substring dedup on a randomized corpus
    (seeded): for every document kept + removed == total tokens,
    removed is a multiple-free union of >= k-token intervals
    (each interval >= k tokens), the cleaned text has exactly
    kept_tokens tokens, and a doc with no >=k-token repeat anywhere in
    the corpus loses nothing."""
    import random

    from cloud_dataflow_batch_processing_spark.caching import release_managed_caches
    from cloud_dataflow_batch_processing_spark.extensions import substring as SS

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(30)]  # small vocab -> natural repeats
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {r["doc_id"]: r for r in SS.substring_dup_stats(df).collect()}
    release_managed_caches()
    clean = {r["doc_id"]: r["clean_text"] for r in SS.substring_dedup_text(df).collect()}
    release_managed_caches()
    iv = SS.remove_intervals(df).collect()
    release_managed_caches()
    k = SS.SPAN_TOKENS
    for doc_id, text in rows:
        s = stats[doc_id]
        assert s["kept_tokens"] + s["removed_tokens"] == s["n_tokens"]
        assert s["n_tokens"] == len(text.split())
        got_tokens = clean[doc_id].split() if clean[doc_id] else []
        assert len(got_tokens) == s["kept_tokens"], (doc_id, s)
    for r in iv:
        assert r["end_pos"] - r["start_pos"] >= k


def test_hll_merge_associative_random_splits(spark):
    """HLL register-table merges are associative and commutative: any
    seeded 3-way split, merged in any order/grouping, produces the
    identical register table (and so the identical estimate)."""
    import random

    from pyspark.sql import functions as F

    from cloud_dataflow_batch_processing_spark.extensions import sketch as S

    rng = random.Random(7)
    vals = [(rng.randint(0, 10**12),) for _ in range(3000)]
    df = spark.createDataFrame(vals, "k long")
    parts = [df.filter(F.pmod(F.col("k"), 3) == i) for i in range(3)]
    regs = [S.hll_register_table(p, "k") for p in parts]
    ab_c = S.hll_merge(S.hll_merge(regs[0], regs[1]), regs[2])
    a_bc = S.hll_merge(regs[0], S.hll_merge(regs[1], regs[2]))
    whole = S.hll_register_table(df, "k")
    t = lambda d: sorted(map(tuple, d.collect()))
    assert t(ab_c) == t(a_bc) == t(whole)


@pytest.mark.slowsweep
def test_unigram_freq_merge_associative_random_corpus(spark):
    """Unigram LM training merges like every mergeable structure here:
    any seeded 3-way shard split, merged in any grouping, equals
    training on the whole corpus — and scoring against the merged
    table equals scoring against the whole-corpus table."""
    import random

    from pyspark.sql import functions as F

    from cloud_dataflow_batch_processing_spark.extensions import lm as LM

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(300)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    parts = [df.filter(F.pmod(F.col("doc_id"), 3) == i) for i in range(3)]
    freqs = [LM.unigram_freq(p) for p in parts]
    ab_c = LM.unigram_freq_merge(LM.unigram_freq_merge(freqs[0], freqs[1]), freqs[2])
    a_bc = LM.unigram_freq_merge(freqs[0], LM.unigram_freq_merge(freqs[1], freqs[2]))
    whole = LM.unigram_freq(df)
    t = lambda d: sorted(map(tuple, d.collect()))
    assert t(ab_c) == t(a_bc) == t(whole)
    s = lambda freq: sorted(map(tuple, LM.unigram_score(df, freq).collect()))
    assert s(ab_c) == s(whole)


@given(st.data())
@settings(max_examples=6, deadline=None)
@pytest.mark.slowsweep
def test_minhash_pairs_verify_then_dedup_invariants(spark, data):
    """The round-7 verify-then-dedup reorder's contract on arbitrary
    small dense-vocab corpora: (1) NO false positives — every returned
    pair's TRUE distinct-shingle-set Jaccard clears the threshold (the
    map-side array_intersect verify is exact); (2) no duplicate pair
    rows — a pair colliding in several LSH bands is emitted once
    (dropDuplicates now runs AFTER the filter; a regression here
    double-counts drops downstream); (3) deterministic recall for
    identical shingle sets — same set => same 16 minhash lanes => all
    bands collide; (4) doc_a < doc_b ordering. Ground-truth sets come
    from the engine's own shingle_hashes column (the property isolates
    the join/dedup logic, not the hashing — the hash twins have their
    own bit-identity property above)."""
    from pyspark.sql import functions as F

    from cloud_dataflow_batch_processing_spark.extensions import dedup as D

    vocab = ["a", "b", "c", "d", "e"]
    n = data.draw(st.integers(6, 24))
    texts = [
        " ".join(
            data.draw(st.lists(st.sampled_from(vocab), min_size=3, max_size=12))
        )
        for _ in range(n)
    ]
    texts[n - 1] = texts[0]  # plant one exact duplicate
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = df.select(
        "doc_id", F.array_distinct(D.shingle_hashes("text")).alias("sh")
    ).collect()
    sets = {r.doc_id: frozenset(r.sh) for r in rows}

    thr = 0.5
    out = D.minhash_near_dup_pairs(df, "doc_id", "text", threshold=thr).collect()
    keys = [(r.doc_a, r.doc_b) for r in out]
    assert len(keys) == len(set(keys)), "duplicate pair rows survived"
    for r in out:
        assert r.doc_a < r.doc_b
        sa, sb = sets[r.doc_a], sets[r.doc_b]
        true_j = len(sa & sb) / len(sa | sb)
        assert abs(r.jaccard - true_j) < 5e-5
        assert true_j >= thr - 1e-4, (r.doc_a, r.doc_b, true_j)
    got = set(keys)
    for a in range(n):
        for b in range(a + 1, n):
            if sets[a] and sets[a] == sets[b]:
                assert (a, b) in got, f"identical-set pair ({a},{b}) missed"

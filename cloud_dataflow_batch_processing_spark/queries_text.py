"""Text-analysis query registrations (SURVEY.md §2.3: language-ID,
quality scoring, token counting, fingerprinting — each over the
``documents`` table with a DuckDB oracle generated from the same
engine-neutral expression builders in ``functions.text``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cloud_dataflow_batch_processing_spark.functions import text as X
from cloud_dataflow_batch_processing_spark.queries import register
from cloud_dataflow_batch_processing_spark.sources.testdata import load_tables


@register(
    "text_token_stats",
    # Token counting stays driver-checked via text_profile_single_pass
    # (same token_count expression); registers late.
    late=True,
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars_obs,
           {X.token_count_sql('text')} AS n_tokens,
           length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_vowels
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + char-class stats, pure codegen expressions."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_obs"),
        X.token_count("text").alias("n_tokens"),
        (F.length("text") - F.length(F.regexp_replace(F.col("text"), "[aeiou]", ""))).alias(
            "n_vowels"
        ),
    )


@register(
    "text_lang_id",
    # lang_id's expression is driver-checked inside
    # text_profile_single_pass; the histogram twin registers late.
    late=True,
    oracle=f"""
    SELECT {X.lang_id_sql('text')} AS pred_lang, COUNT(*) AS n
    FROM documents GROUP BY pred_lang
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID (engine-neutral expression);
    aggregated to predicted-language counts."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.groupBy(X.lang_id("text").alias("pred_lang")).agg(F.count(F.lit(1)).alias("n"))


@register(
    "text_quality_filter",
    oracle=f"""
    SELECT doc_id, {X.quality_score_sql('text')} AS quality
    FROM documents
    WHERE {X.quality_score_sql('text')} >= 0.5
    """,
    # Quality-scoring class is driver-covered by text_profile_single_pass
    # (same score expression) and corpus_clean_pipeline (the threshold
    # filter in composition); the standalone filter registers late to
    # free a primary slot for dedup_segments' new operator class.
    late=True,
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + threshold filter — the standard pretraining
    corpus-cleaning shape. r11 (guide §4/§2): the Arrow twin of the
    score (bit-identical — the corpus_build_full oracle certifies it
    against the same SQL) instead of the interpreted HOF fold, scored
    ONCE (the filter references the UDF output column, so Catalyst
    cannot re-embed the fold into the predicate), with the substring-
    pattern fan-out so a single-split bench scan doesn't run every
    document on one task."""
    from cloud_dataflow_batch_processing_spark.functions.text_fast import (
        quality_score_fast,
    )
    from cloud_dataflow_batch_processing_spark.plans.inspect import fan_out_scan

    d = fan_out_scan(load_tables(spark, sf_dir)["documents"], "doc_id")
    return d.select(
        "doc_id", quality_score_fast(F.col("text")).alias("quality")
    ).filter(F.col("quality") >= 0.5)


@register(
    "text_profile_single_pass",
    oracle=f"""
    SELECT doc_id,
           {X.token_count_sql('text')} AS n_tokens,
           {X.lang_id_sql('text')} AS pred_lang,
           {X.quality_score_sql('text')} AS quality,
           {X.doc_fingerprint_sql('text')} AS fp
    FROM documents WHERE doc_id < 100
    """,
)
def text_profile_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full per-document text profile (tokens, language, quality,
    fingerprint) in ONE scan — the shape a corpus-profiling job takes:
    no shuffle, every signal from the same pass over the bytes."""
    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        X.token_count("text").alias("n_tokens"),
        X.lang_id("text").alias("pred_lang"),
        X.quality_score("text").alias("quality"),
        X.doc_fingerprint("text").alias("fp"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id, {X.doc_fingerprint_sql('text')} AS fp
    FROM documents WHERE doc_id < 100
    """,
    # The fingerprint column is also oracle-checked inside
    # text_profile_single_pass; this standalone twin registers late.
    late=True,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-polynomial document fingerprint (engine-neutral hash;
    doc_id-limited because the oracle's per-char list walk is O(n²)-ish
    in DuckDB — the Spark side runs the full table fine)."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id", X.doc_fingerprint("text").alias("fp")
    )


@register(
    "text_chunks",
    # r7 window rotation: class long driver-certified (green in
    # CORRECTNESS r02-r06); registers late to free a slot for a
    # class that never saw the driver gate.
    late=True,
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {X.tokens_sql('text')} AS t FROM documents WHERE doc_id < 200
    ),
    unnested AS (
      SELECT doc_id, t, unnest(range(1, len(t) + 1, 24)) AS s FROM toks
    ),
    starts AS (
      SELECT doc_id, t, CAST(s AS BIGINT) AS start,
             CAST((s - 1) / 24 AS BIGINT) AS chunk_id
      FROM unnested
    )
    SELECT doc_id, chunk_id,
           len(list_slice(t, start, LEAST(start + 31, len(t)))) AS n_chunk_tokens,
           array_to_string(list_slice(t, start, LEAST(start + 31, len(t))), ' ') AS chunk_text
    FROM starts
    """,
)
def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking — the LLM-training split step: each
    document becomes overlapping 32-token chunks on a 24-token stride
    (8 tokens of overlap). Pure per-row codegen (tokens → sequence of
    starts → posexplode → slice + join); no shuffle, embarrassingly
    parallel at any corpus size. The oracle regenerates every chunk
    string, so a hash match pins tokenization, stride arithmetic, and
    slice truncation."""
    chunk, stride = 32, 24
    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 200)
    toks = d.select("doc_id", X.tokens("text").alias("t")).filter(F.size("t") > 0)
    starts = toks.select(
        "doc_id",
        "t",
        F.posexplode(F.sequence(F.lit(1), F.size("t"), F.lit(stride))).alias(
            "chunk_id", "start"
        ),
    )
    sliced = F.slice(F.col("t"), F.col("start"), chunk)
    return starts.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(sliced).alias("n_chunk_tokens"),
        F.array_join(sliced, " ").alias("chunk_text"),
    )


_PACK_SHARD_DOCS = 128  # bounded shard size: docs per packing shard


@register(
    "pack_sequences",
    oracle=f"""
    WITH sized AS (
      SELECT source, doc_id,
             CAST(doc_id // {_PACK_SHARD_DOCS} AS BIGINT) AS shard_id,
             CAST(len(CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(trim(text), '\\s+') END) AS BIGINT) AS n_tok
      FROM documents
    ),
    binned AS (
      SELECT source, shard_id, doc_id, n_tok,
             CAST(FLOOR(COALESCE(SUM(n_tok) OVER (
               PARTITION BY source, shard_id ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512) AS BIGINT)
               AS bin_id
      FROM sized
    )
    SELECT source, shard_id, bin_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
    FROM binned GROUP BY source, shard_id, bin_id
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the LLM-training batch-assembly step:
    documents are packed in doc_id order into 512-token bins by the
    streaming rule "a document belongs to the bin its running-token
    offset falls in" (the standard one-pass packer; exact bin packing
    is NP-hard and order-destroying).

    Scale posture (VERDICT r2 #2): the running sum is windowed per
    (source, BOUNDED shard) — never per whole source, so no single
    task streams a dominant source's rows even when one source holds
    most of a 100 TB corpus. Shards here are doc_id ranges of
    ``_PACK_SHARD_DOCS`` docs (deterministic, oracle-portable); in a
    production run the physical input file is the natural shard. Bins
    never span shards — the cost is at most one partial (underfull)
    bin per shard boundary, the same trade every file-parallel packer
    makes; bin identity is the composite (source, shard_id, bin_id).
    Plan-pinned by test_pack_sequences_shuffle_budget: the window's
    exchange hashes on (source, shard_id) and the final aggregate
    reuses that partitioning (keys are a superset) — one data shuffle
    total, no SinglePartition gather."""
    from pyspark.sql import Window

    budget = 512
    d = load_tables(spark, sf_dir)["documents"]
    sized = d.select(
        "source",
        "doc_id",
        (F.col("doc_id") / _PACK_SHARD_DOCS).cast("long").alias("shard_id"),
        X.token_count("text").cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("source", "shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = sized.withColumn(
        "bin_id",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / budget).cast("long"),
    )
    return binned.groupBy("source", "shard_id", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("bin_tokens")
    )


from cloud_dataflow_batch_processing_spark.extensions.dedup import (  # noqa: E402
    shingle_hashes_sql as _shingle_hashes_sql,
    token_hashes_sql as _token_hashes_sql,
)

_D_TOKEN_HASHES_SQL = _token_hashes_sql("text")
_D_SHINGLE_HASHES_SQL = _shingle_hashes_sql("text")

# Deterministic hash split: (doc_id*a+b) mod p mod 100 → 0-79 train,
# 80-89 val, 90-99 test. Engine-neutral (pure integer arithmetic).
_SPLIT_A, _SPLIT_B, _SPLIT_M = 2654435761, 40503, 1_000_000_007


@register(
    "corpus_split_train_val",
    oracle=f"""
    WITH assigned AS (
      SELECT lang,
             CASE WHEN ((doc_id * {_SPLIT_A} + {_SPLIT_B}) % {_SPLIT_M}) % 100 < 80
                  THEN 'train'
                  WHEN ((doc_id * {_SPLIT_A} + {_SPLIT_B}) % {_SPLIT_M}) % 100 < 90
                  THEN 'val' ELSE 'test' END AS split,
             n_chars
      FROM documents
    )
    SELECT lang, split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY lang, split
    """,
    # Deterministic-hash-routing class is driver-covered by
    # corpus_mix_sample (same keyed-hash-threshold mechanics, per-lang
    # rates); the split variant registers late to free a primary slot
    # for dedup_duplicate_clusters' new operator class.
    late=True,
)
def corpus_split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified train/val/test split — the dataset-assembly step every
    training pipeline needs: DETERMINISTIC hash assignment (no RNG, so
    membership is reproducible across runs, engines, and reshuffles —
    a document can never leak between splits when the corpus is
    re-partitioned). Reported per (lang, split) so the oracle certifies
    the stratification proportions hold within every language, not just
    globally. Zero shuffle before the final small aggregate."""
    d = load_tables(spark, sf_dir)["documents"]
    h = ((F.col("doc_id") * _SPLIT_A + _SPLIT_B) % _SPLIT_M) % 100
    split = (
        F.when(h < 80, F.lit("train")).when(h < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        d.select("lang", split.alias("split"), "n_chars")
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "text_repetition_ratio",
    # Per-row text-signal class is driver-carried by
    # `text_profile_single_pass` + `pii_scrub_stats`, and the Arrow
    # fast-twin hashing path it pins is also in the driver window via
    # `dedup_minhash_pairs_fast`; registers late.
    late=True,
    oracle=f"""
    WITH th_t AS (
      SELECT doc_id, {_D_TOKEN_HASHES_SQL} AS th FROM documents WHERE doc_id < 500
    ),
    sh_t AS (
      SELECT doc_id, th, {_D_SHINGLE_HASHES_SQL} AS sh FROM th_t
    )
    SELECT doc_id,
           CAST(len(th) AS BIGINT) AS n_tokens,
           ROUND(1.0 - CAST(len(list_distinct(th)) AS DOUBLE) / len(th), 4)
             AS dup_token_frac,
           ROUND(1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh), 4)
             AS dup_shingle_frac
    FROM sh_t WHERE len(sh) > 0
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-ratio quality signals (the Gopher-rule family):
    duplicate-token fraction and duplicate-3-gram fraction per document
    — high values flag boilerplate/spam for removal before training.
    Reuses the engine-neutral token/shingle hash builders, so both
    fractions compute the SAME numbers on both engines by construction;
    zero shuffle.

    The token-hash stage runs as the Arrow-batched fast twin
    (value-identical polynomial): a Python UDF is extracted into its
    own plan node — a hard optimizer barrier — so the char fold is
    computed ONCE however many downstream expressions reference it.
    The HOF form gets re-embedded into every consumer (four size()/
    array_distinct() references plus the pushed-down ``size(sh) > 0``
    predicate, whose inlined shingle lambda re-evaluates the full
    token-hash tree per shingle — the quadratic trap documented in
    NOTES.md round 3). Measured 5.6 s → 0.55 s at sf0.1 on 500 docs."""
    from cloud_dataflow_batch_processing_spark.extensions.dedup import (
        shingles_from_token_hashes,
    )
    from cloud_dataflow_batch_processing_spark.functions.text_fast import (
        token_hashes_fast,
    )

    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 500)
    staged = d.select("doc_id", token_hashes_fast(F.col("text")).alias("th")).select(
        "doc_id", "th", shingles_from_token_hashes(F.col("th")).alias("sh")
    )
    dup = lambda c: F.round(  # noqa: E731
        1.0 - F.size(F.array_distinct(c)).cast("double") / F.size(c), 4
    )
    return staged.filter(F.size("sh") > 0).select(
        "doc_id",
        F.size("th").cast("long").alias("n_tokens"),
        dup("th").alias("dup_token_frac"),
        dup("sh").alias("dup_shingle_frac"),
    )


# PII patterns — written to mean the same thing in Java regex (Spark)
# and RE2 (DuckDB): explicit classes, no \\d / lookarounds.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
_PII_DIGITRUN = "[0-9][0-9][0-9][0-9][0-9][0-9]+"


@register(
    "pii_scrub_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PII_DIGITRUN}')) AS BIGINT) AS n_digit_runs,
           length(regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                                 '{_PII_DIGITRUN}', '<NUM>', 'g')) AS clean_len
    FROM documents WHERE doc_id < 500
    """,
)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — redact emails and long digit runs (account/phone
    shaped), reporting per-document match counts and the redacted
    length. The corpus is synthetic so counts are typically zero — the
    hash compare still certifies that BOTH engines find the same
    matches and produce byte-identical redacted lengths, i.e. the regex
    dialect subset is truly portable. Pure per-row codegen."""
    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 500)
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>"), _PII_DIGITRUN, "<NUM>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(_PII_DIGITRUN))
        .cast("long")
        .alias("n_digit_runs"),
        F.length(clean).alias("clean_len"),
    )


@register(
    "pii_redact_roundtrip",
    # PII class is driver-carried by `pii_scrub_stats` (counts +
    # redacted lengths); this variant certifies the REPLACEMENT BYTES.
    late=True,
    oracle=f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(
             text || ' contact: user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com id ' || CAST(1000000 + doc_id * 37 AS VARCHAR) || '77',
             '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_DIGITRUN}', '<NUM>', 'g') AS redacted
    FROM documents WHERE doc_id < 200
    """,
)
def pii_redact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction returning the SCRUBBED TEXT itself: both engines
    inject a deterministic email + account number per doc_id (the
    synthetic corpus carries no real PII), redact with the shared
    portable patterns, and the driver hash-compares the full redacted
    strings — certifying replacement semantics byte-for-byte, not just
    match counts/lengths (`pii_scrub_stats`). Pure per-row codegen,
    zero shuffle."""
    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 200)
    injected = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com id "),
        (F.lit(1_000_000) + F.col("doc_id") * 37).cast("string"),
        F.lit("77"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(injected, _PII_EMAIL, "<EMAIL>"), _PII_DIGITRUN, "<NUM>"
    )
    return d.select("doc_id", redacted.alias("redacted"))


@register(
    "token_length_histogram",
    # Distribution-stats class is driver-carried by `percentiles_exact`
    # + `approx_percentile`; the bucketed-histogram variant registers
    # late.
    late=True,
    oracle=f"""
    WITH sized AS (
      SELECT LEAST(CAST({X.token_count_sql('text')} // 16 AS BIGINT), 15) AS bucket,
             CAST({X.token_count_sql('text')} AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT bucket, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM sized GROUP BY bucket
    """,
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram (16-token buckets, top-coded at bucket
    15) — the length-distribution profile used to pick packing budgets
    and truncation limits. One narrow shuffle to ≤16 rows; the
    map-side partial aggregation does all the work."""
    d = load_tables(spark, sf_dir)["documents"]
    n_tok = X.token_count("text").cast("long")
    bucket = F.least(F.floor(n_tok / 16).cast("long"), F.lit(15))
    return (
        d.select(bucket.alias("bucket"), n_tok.alias("n_tok"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("total_tokens"))
    )


# Per-language keep-rates (per mille) for the mixing query: downsample
# the dominant language, keep the tail — the standard LLM data-mixing
# rebalance. Deterministic hash sampling so both engines agree exactly.
_MIX_RATES = {"en": 400, "de": 800, "fr": 800, "es": 800, "zh": 1000}
_MIX_A, _MIX_B, _MIX_M = 1103515245, 12345, 1_000_000_007


@register(
    "corpus_mix_sample",
    oracle=f"""
    WITH sampled AS (
      SELECT * FROM documents
      WHERE ((doc_id * {_MIX_A} + {_MIX_B}) % {_MIX_M}) % 1000 <
            CASE lang {' '.join(f"WHEN '{l}' THEN {r}" for l, r in _MIX_RATES.items())}
                 ELSE 0 END
    )
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM sampled GROUP BY lang
    """,
)
def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing — the data-rebalancing step of an LLM pipeline:
    each language is kept at a configured rate (en downsampled to 40%,
    tail languages boosted) via DETERMINISTIC hash sampling
    ((doc_id·a+b) mod p mod 1000 < rate‰): reproducible across runs and
    engines (no RNG), embarrassingly parallel, no shuffle before the
    final small aggregate. Weighted-mixing twin of the random
    Sample transforms (beam/transforms/combiners.py Sample)."""
    d = load_tables(spark, sf_dir)["documents"]
    rate = F.create_map(
        *[F.lit(x) for pair in _MIX_RATES.items() for x in pair]
    )[F.col("lang")]
    keep = ((F.col("doc_id") * _MIX_A + _MIX_B) % _MIX_M) % 1000 < F.coalesce(
        rate, F.lit(0)
    )
    return (
        d.filter(keep)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT lang, doc_id, unnest({X.tokens_sql('text')}) AS tok FROM documents
    ),
    stats AS (
      SELECT lang, tok, COUNT(*) AS tf,
             COUNT(DISTINCT doc_id) AS df_docs
      FROM toks GROUP BY lang, tok
    ),
    nlang AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ),
    scored AS (
      SELECT s.lang, s.tok, s.tf, s.df_docs,
             s.tf * (CAST(n.n_docs AS DOUBLE) / s.df_docs) AS score
      FROM stats s JOIN nlang n USING (lang)
    )
    SELECT lang, tok, tf, df_docs, ROUND(score, 4) AS score
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, tok) <= 5
    """,
    # Shares the explode + grouped-count + per-key-top-k classes with
    # boilerplate_ngrams / top_n_per_key; registers late.
    late=True,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tf-idf vocabulary mining: the 5 highest-weighted
    terms per language — the corpus-profiling signal behind stopword
    lists and domain-vocabulary drift checks. Idf is the log-free
    rational form tf * (N_lang / df) so both engines compute bit-exact
    doubles (libm log is the one op with cross-engine ulp risk); the
    ranking key (score DESC, token) is fully deterministic.

    Plan: explode is per-row; one (lang, token) hash-agg shuffle with
    map-side partials carries tf and df together; the per-language doc
    count broadcasts; the final top-5 is a per-lang rank window over
    the already-aggregated (small) term frame."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select("lang", "doc_id", F.explode(X.tokens("text")).alias("tok"))
    stats = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df_docs"),
    )
    nlang = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    scored = stats.join(F.broadcast(nlang), "lang").withColumn(
        "score", F.col("tf") * (F.col("n_docs").cast("double") / F.col("df_docs"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 5)
        .select("lang", "tok", "tf", "df_docs", F.round("score", 4).alias("score"))
    )


@register(
    "udtf_split_segments",
    # The one-to-many UDTF class is driver-carried by `flat_map_explode`
    # and the ParDo units; this native Spark-4 `@udtf` SQL-surface twin
    # registers late.
    late=True,
    oracle=r"""
    WITH parts AS (
      SELECT doc_id, string_split(text, ' the ') AS ps FROM documents
    ),
    idx AS (
      SELECT doc_id, ps, unnest(range(0, len(ps))) AS i FROM parts
    )
    SELECT doc_id, CAST(i AS INT) AS seg_idx, ps[i + 1] AS segment,
           -- trim the full ASCII-whitespace set: Python's str.split()
           -- drops ALL leading/trailing whitespace, while bare trim()
           -- strips spaces only — a tab-only segment must count 0
           -- tokens on both engines (adversarial sweep)
           CAST(CASE WHEN trim(ps[i + 1], ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN 0
                ELSE len(string_split_regex(trim(ps[i + 1], ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+')) END AS INT) AS n_tokens
    FROM idx
    """,
)
def udtf_split_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Python UDTF (Spark 4 `@udtf`, operators/py_udtf.py)
    invoked through its real user surface — SQL LATERAL — splitting
    each document into ' the '-delimited segments with per-segment
    token counts. Row-at-a-time Python by design (API parity with the
    DoFn.process zero-to-many contract, beam/transforms/core.py:186);
    the Arrow-batched equivalents (text_chunks, dedup segments) remain
    the scale path."""
    from cloud_dataflow_batch_processing_spark.operators.py_udtf import register_udtfs

    register_udtfs(spark)
    load_tables(spark, sf_dir)["documents"].createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, s.seg_idx, s.segment, s.n_tokens
        FROM __docs_udtf d, LATERAL split_segments(d.text, ' the ') s
        """
    )


@register(
    "corpus_mix_temperature",
    # Corpus-mixing class is driver-carried by `corpus_mix_sample`
    # (fixed rates); this data-dependent temperature variant registers
    # late.
    late=True,
    oracle=f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    rates AS (
      SELECT lang,
             CAST(FLOOR(1000 * sqrt(CAST(n AS DOUBLE))
                        / SUM(sqrt(CAST(n AS DOUBLE))) OVER ()) AS BIGINT) AS rate_pm
      FROM counts
    ),
    sampled AS (
      SELECT d.lang, d.n_chars, r.rate_pm FROM documents d JOIN rates r USING (lang)
      WHERE ((d.doc_id * {_MIX_A} + {_MIX_B}) % {_MIX_M}) % 1000 < r.rate_pm
    )
    SELECT lang, rate_pm, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM sampled GROUP BY lang, rate_pm
    """,
)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus mixing (alpha = 0.5): per-language keep
    rates proportional to sqrt of the language's share — the standard
    rebalancing that upsamples tail languages without flattening the
    head. Two narrow aggregates (5-row rates frame, broadcast back) and
    the same deterministic per-mille hash gate as `corpus_mix_sample`.
    alpha = 0.5 on purpose: IEEE sqrt is correctly rounded, so the
    data-dependent rates are bit-identical on both engines (a pow(x,
    0.3) rate would be libm-dependent and could flip a FLOOR boundary)."""
    from pyspark.sql import Window

    d = load_tables(spark, sf_dir)["documents"]
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    rates = counts.select(
        "lang",
        F.floor(
            1000 * F.sqrt(F.col("n").cast("double"))
            / F.sum(F.sqrt(F.col("n").cast("double"))).over(
                Window.partitionBy()
            )
        )
        .cast("long")
        .alias("rate_pm"),
    )
    keep = ((F.col("doc_id") * _MIX_A + _MIX_B) % _MIX_M) % 1000 < F.col("rate_pm")
    sampled = d.join(F.broadcast(rates), "lang").filter(keep)
    return sampled.groupBy("lang", "rate_pm").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


from cloud_dataflow_batch_processing_spark.extensions import lm as LM  # noqa: E402


@register(
    "unigram_lm_quality",
    # (text_quality_filter / corpus_clean_pipeline); the LM-filter
    # r7: promoted into the driver's 50-query window (window rotation
    # — this operator class had only local-oracle coverage before).
    oracle=LM.unigram_score_sql("documents"),
)
def unigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/Gopher-shaped LM quality filter, integer-exact: train a
    unigram frequency table on the corpus (one mergeable hash-agg),
    score every document by the exact mean frequency class
    floor(log2(count)) of its tokens (extensions/lm.py — a trained
    KenLM's quantized-logprob table would slot into the same join).
    Train = 1 shuffle on tok; score = explode + AQE-broadcast join +
    per-doc agg; the score VALUE is hash-certified (integer sums, one
    double division)."""
    d = load_tables(spark, sf_dir)["documents"]
    freq = LM.unigram_freq(d)
    return LM.unigram_score(d, freq)


@register(
    "vocab_coverage_curve",
    # r7: promoted into the driver's 50-query window (window rotation
    # — this operator class had only local-oracle coverage before).
    oracle=LM.vocab_coverage_sql("documents", "text", [10, 20, 30]),
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary-budget curve: fraction of corpus token
    occurrences covered by the top-k most frequent types (k = 10/20/30
    against this corpus's 31-word vocab; a real run sweeps 32k/64k/
    128k). Train reuses the unigram hash-agg; the global rank/cumsum
    window runs over a 64-bucket partial-top-K candidate set bounded
    by 64*max(k) rows, never the vocab (let alone the corpus).
    Deterministic tie order (count desc, token asc) makes the coverage
    values hash-certifiable."""
    d = load_tables(spark, sf_dir)["documents"]
    return LM.vocab_coverage(LM.unigram_freq(d), [10, 20, 30])


@register(
    "text_normalize_nfc",
    # New in round 8 (after the r8 window was fixed): queue for the
    # round-9 driver-window rotation alongside the 3 remaining
    # never-certified variants.
    late=True,
    oracle="""
    SELECT doc_id,
           nfc_normalize(text) AS text_nfc,
           length(text) AS n_chars_raw,
           length(nfc_normalize(text)) AS n_chars_nfc,
           (nfc_normalize(text) IS DISTINCT FROM text) AS changed
    FROM documents
    """,
)
def text_normalize_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization over the corpus (training-data
    cleaning step zero: decomposed 'e' + U+0301 and precomposed U+00E9
    must fingerprint/dedup identically). Arrow-batched stdlib
    ``unicodedata`` (functions/text_fast.py::nfc_normalize_fast);
    the oracle is DuckDB's ``nfc_normalize`` — both implement Unicode
    canonical composition, so the normalized TEXT itself is
    value-hash-certified, not just the stats. Per-row, zero shuffle;
    ``changed`` uses null-safe inequality on both engines."""
    from cloud_dataflow_batch_processing_spark.functions.text_fast import (
        nfc_normalize_fast,
    )

    d = load_tables(spark, sf_dir)["documents"]
    nfc = nfc_normalize_fast(F.col("text"))
    return d.select(
        "doc_id",
        nfc.alias("text_nfc"),
        F.length("text").alias("n_chars_raw"),
        F.length(nfc).alias("n_chars_nfc"),
        (~F.col("text").eqNullSafe(nfc)).alias("changed"),
    )


@register(
    "corpus_source_tv_divergence",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({X.tokens_sql('text')}) AS tok
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    st AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_st
      FROM toks GROUP BY source, tok
    ),
    tt AS (
      SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY tok
    ),
    tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS c FROM tt),
    cs AS (
      SELECT source, CAST(SUM(c_st) AS BIGINT) AS c_s FROM st GROUP BY source
    ),
    terms AS (
      SELECT st.source,
             CAST(SUM(ABS(st.c_st * tot.c - tt.c_t * cs.c_s)) AS BIGINT)
               AS present_term,
             CAST(SUM(tt.c_t) AS BIGINT) AS s_s
      FROM st JOIN tt USING (tok) JOIN cs USING (source) CROSS JOIN tot
      GROUP BY st.source
    )
    SELECT t.source,
           cs.c_s AS n_tokens,
           FLOOR(CAST(t.present_term + cs.c_s * (tot.c - t.s_s) AS DOUBLE)
                 / CAST(2 * cs.c_s * tot.c AS DOUBLE) * 1000000 + 0.5)
             / 1000000.0 AS tv_distance
    FROM terms t JOIN cs USING (source) CROSS JOIN tot
    ORDER BY source
    """,
)
def corpus_source_tv_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution shift for corpus mixture design: the
    total-variation distance between each source's unigram distribution
    P_s and the whole-corpus distribution Q — the metric a data-mixing
    team reads before re-weighting sources (high TV = the source is
    lexically atypical). INTEGER-EXACT like the lm.py family: TV =
    sum_t |P_s(t) − Q(t)| / 2 is computed with the divisions multiplied
    through, ``|c_st·C − c_t·C_s|`` (pure BIGINT — no float log, no
    per-token division), tokens absent from a source folded in closed
    form as ``C_s·(C − S_s)`` (their |0 − Q| mass), and ONE double
    division at the end, floor-quantized — so the value survives the
    cross-engine hash gate bit-for-bit.

    Scale posture (100 TB): one hash-agg to (source, token) counts, one
    vocab-sized rollup to corpus counts, one token-keyed join (AQE
    broadcasts the vocab side when it fits), per-source totals
    broadcast — never all-pairs, never a collect, every expression
    codegen'd. Mergeable across shards exactly like unigram_freq
    (counter sums). Beam-surface anchor: the CombinePerKey +
    AsSingleton side-input composition (beam/transforms/core.py:936;
    pvalue.AsSingleton) a Beam pipeline would need for the same
    statistic."""
    from cloud_dataflow_batch_processing_spark.caching import materialize_stage

    d = load_tables(spark, sf_dir)["documents"].filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    toks = d.select("source", F.explode(X.tokens("text")).alias("tok"))
    # st feeds THREE consumers (vocab rollup, per-source totals, the
    # scoring join) and tt feeds two — without an eager stage cache
    # each consumer re-executes the corpus-sized explode+agg lineage
    # (measured: 15 distinct exchanges in the executed plan vs 8 with
    # the caches — at 100 TB that is 3 redundant corpus scans). Both
    # frames are vocab-bounded (≪ corpus), the documented size class
    # for managed_cache.
    st = materialize_stage(
        toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c_st"))
    )
    tt = materialize_stage(st.groupBy("tok").agg(F.sum("c_st").alias("c_t")))
    cs = st.groupBy("source").agg(F.sum("c_st").alias("c_s"))
    tot = tt.agg(F.sum("c_t").alias("c"))
    j = (
        st.join(tt, "tok")
        .join(F.broadcast(cs), "source")
        .crossJoin(F.broadcast(tot))
    )
    terms = j.groupBy("source").agg(
        F.sum(F.abs(F.col("c_st") * F.col("c") - F.col("c_t") * F.col("c_s"))).alias(
            "present_term"
        ),
        F.sum("c_t").alias("s_s"),
    )
    out = (
        terms.join(F.broadcast(cs), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("c_s").alias("n_tokens"),
            (
                F.floor(
                    (
                        F.col("present_term")
                        + F.col("c_s") * (F.col("c") - F.col("s_s"))
                    ).cast("double")
                    / (2 * F.col("c_s") * F.col("c")).cast("double")
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("tv_distance"),
        )
        .orderBy("source")
    )
    return out


from cloud_dataflow_batch_processing_spark.extensions import repetition as REP  # noqa: E402


@register(
    "gopher_repetition_filter",
    oracle=REP.gopher_repetition_sql(),
)
def gopher_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition-removal rules (Rae et al. 2021 Table A1): per-
    document top-{2,3,4}-gram and duplicated-{5..10}-gram character
    fractions plus the published keep/drop conjunction — the standard
    pre-mixing quality gate of large-scale training-data pipelines.
    Per-doc metrics need no cross-document data, so the operator is
    ZERO-shuffle: scan → one Arrow-batched pass emitting exact integer
    numerators (prefix-sum char windows over the certified token-hash
    fold) → fraction/threshold projection. The DuckDB oracle is the
    relational formulation (explode all nine n-gram widths) and
    certifies the values. Impl:
    extensions/repetition.py::gopher_repetition_stats."""
    d = load_tables(spark, sf_dir)["documents"]
    return REP.gopher_repetition_stats(d)


from cloud_dataflow_batch_processing_spark.extensions import lm as LM  # noqa: E402
from cloud_dataflow_batch_processing_spark.extensions import shard as SHARD  # noqa: E402


@register(
    "bpe_merge_pairs",
    oracle=LM.bpe_merge_pairs_sql("documents", "text", 100),
)
def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE/WordPiece vocabulary induction, the count step (Sennrich et
    al. 2016): corpus-wide adjacent-token-pair frequencies, top-100
    merge candidates with a total-order tiebreak. Per-doc pairs from
    one codegen transform over the token array (no position self-join);
    ONE partial/final hash agg on the pair key (map-side combine
    absorbs the Zipf head); top-k plans as TakeOrderedAndProject.
    Counts merge across shards like unigram_freq — tokenizer training
    at 100 TB is this count iterated with a vocab-sized driver-side
    merge table. Impl: extensions/lm.py::bpe_merge_pair_counts."""
    d = load_tables(spark, sf_dir)["documents"]
    return LM.bpe_merge_pair_counts(d, "text", top_k=100)


@register(
    "corpus_shuffle_shard",
    oracle=SHARD.shuffle_shard_sql("documents", "doc_id", "n_chars", 8, "r11"),
)
def corpus_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + round-robin sharding — the
    corpus-to-training-shards step: seeded md5 permutation key, global
    rank WITHOUT an unpartitioned row_number (reuses the range-
    partition + prefix-offset two-pass of operators/ids.py — one range
    shuffle + a partition-count collect, no single-reduce stage),
    shard_id = rank % 8 (exact ±1 balance, every shard an unbiased
    interleave of sources). Result is the per-shard manifest (counts,
    sizes, permutation checksum, key ranges); the oracle is the naive
    ROW_NUMBER form, so the hash gate proves the scalable spelling is
    permutation-exact. Impl: extensions/shard.py::shuffle_shard_assign."""
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "n_chars")
    return SHARD.shard_stats(
        SHARD.shuffle_shard_assign(d, "doc_id", n_shards=8, seed="r11")
    )


from cloud_dataflow_batch_processing_spark.extensions import classifier as CLF  # noqa: E402


@register(
    "classifier_quality_score",
    oracle=CLF.hashed_linear_score_sql("documents", "text", 4096, 50, 0.0),
)
def classifier_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the fasttext / FineWeb-Edu-
    classifier-shaped admission gate): hashed bag-of-tokens linear
    scoring, keep = score > threshold. ZERO-shuffle — scan → one
    codegen projection (rolling hash per token nested inside a bigint
    fold over the token array; milli-quantized weights, one double
    division per doc) → done; no UDF, no explode, no join. The
    weight-TABLE path (broadcast lookup join, the shape real trained
    weights ship in) is unit-pinned equivalent, so swapping in a
    trained model changes no plumbing. Impl:
    extensions/classifier.py::hashed_linear_score."""
    d = load_tables(spark, sf_dir)["documents"]
    return CLF.hashed_linear_score(d, "text", n_buckets=4096)

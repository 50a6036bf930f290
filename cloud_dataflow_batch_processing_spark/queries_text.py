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
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + threshold filter — the standard pretraining
    corpus-cleaning shape."""
    d = load_tables(spark, sf_dir)["documents"]
    q = X.quality_score("text")
    return d.select("doc_id", q.alias("quality")).filter(q >= 0.5)


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
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-polynomial document fingerprint (engine-neutral hash;
    doc_id-limited because the oracle's per-char list walk is O(n²)-ish
    in DuckDB — the Spark side runs the full table fine)."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id", X.doc_fingerprint("text").alias("fp")
    )

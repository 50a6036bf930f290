"""Model-based quality filtering — the hashed linear classifier
scoring pass (the fasttext / FineWeb-Edu-classifier-shaped step):
score every document with a trained linear model over hashed
bag-of-tokens features, keep documents above threshold. Modern
pipelines gate corpus admission on exactly this shape: a vocab-free
feature hash, a weight lookup per token, a per-document reduction.

Two spellings:

- :func:`hashed_linear_score` — weights given PROCEDURALLY
  (bucket -> weight via integer arithmetic). Scoring is ZERO-shuffle:
  scan -> one codegen projection (nested fold: rolling hash per token
  inside a sum over the token array) -> done. No UDF, no explode, no
  join. This is the driver-certified path: every quantity is integer-
  exact (milli-unit weights, bigint sums), so DuckDB computes the
  identical frame.
- :func:`score_with_weight_table` — weights given as a TABLE
  (bucket, weight_milli), the shape a really-trained model ships in.
  Explode tokens -> join the weight table (AQE broadcasts it: 2^b
  rows) -> per-doc sum. One shuffle for the per-doc agg; the join
  itself is map-side. Equivalence with the procedural path when the
  table enumerates the same weights is unit-pinned, so swapping in
  real trained weights changes no plumbing.

Feature hash: the certified rolling polynomial hash
(functions/text.py::rolling_hash, mod 1e9+7) — engine-identical,
unlike murmur3/xxhash. Bucket = hash % n_buckets. The procedural
"trained" weights are a Knuth-multiplicative scramble of the bucket id
quantized to milli-units in [-1000, 1000] — stand-ins with the exact
arithmetic profile of int8-quantized real weights.

Determinism contract: per-token weights are BIGINT; the per-doc sum is
a BIGINT fold (order-free); the single double division happens once
per document (score = mean milli-weight / 1000). Empty docs score 0.0
(sum over empty = 0 on both engines — DuckDB's list_sum([]) NULL is
COALESCEd, the gopher_repetition pin). NULL text propagates NULL
score/keep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cloud_dataflow_batch_processing_spark.functions.text import (
    HASH_MOD,
    rolling_hash,
    rolling_hash_sql,
    tokens,
    tokens_sql,
)

SCRAMBLE = 2_654_435_761  # Knuth multiplicative constant


def bucket_of(tok: Column, n_buckets: int) -> Column:
    return rolling_hash(tok) % n_buckets


def weight_milli_of(bucket: Column) -> Column:
    """Procedural 'trained' weight for a bucket: scramble -> quantize
    to [-1000, 1000] milli-units. Pure BIGINT arithmetic."""
    return (bucket * SCRAMBLE) % HASH_MOD % 2001 - 1000


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    bias_milli: int = 50,
    threshold: float = 0.0,
) -> DataFrame:
    """Zero-shuffle classifier scoring: (doc_id, n_tokens, score,
    keep). score = (bias + sum token weights) / (1000 * max(n,1)) —
    the mean milli-weight, one double division per doc, rounded to 4
    places via the engine-deterministic FLOOR(x*1e4 + 0.5)/1e4 idiom.
    """
    t = tokens(text_col)
    w_sum = F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda acc, tok: acc + weight_milli_of(bucket_of(tok, n_buckets)),
    )
    n = F.size(t)
    raw = (w_sum + F.lit(bias_milli)) / (1000.0 * F.greatest(n, F.lit(1)))
    # FLOOR(x*1e4 + 0.5)/1e4, not ROUND(x, 4): both engines run the
    # identical IEEE ops, so half-way points cannot split (ROUND ties
    # diverge — Spark rounds the shortest-decimal repr HALF_UP, DuckDB
    # rounds the binary value; 9 docs at sf0.1 hit this).
    score = F.floor(raw * 10000.0 + 0.5) / 10000.0
    return df.select(
        "doc_id",
        F.when(F.col(text_col).isNull(), F.lit(None).cast("long"))
        .otherwise(n.cast("long"))
        .alias("n_tokens"),
        F.when(F.col(text_col).isNull(), F.lit(None).cast("double"))
        .otherwise(score)
        .alias("score"),
        F.when(F.col(text_col).isNull(), F.lit(None).cast("boolean"))
        .otherwise(score > threshold)
        .alias("keep"),
    )


def procedural_weight_table(spark, n_buckets: int = 4096) -> DataFrame:
    """Enumerate the procedural weights as the (bucket, weight_milli)
    table a trained model would ship — the equivalence fixture."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        weight_milli_of(F.col("id")).cast("long").alias("weight_milli"),
    )


def score_with_weight_table(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    bias_milli: int = 50,
    threshold: float = 0.0,
) -> DataFrame:
    """Table-weight scoring: explode -> map-side lookup join (weights
    broadcast; missing buckets weigh 0) -> per-doc sum. Left join from
    the DOCUMENT side keeps zero-token and all-unseen docs."""
    toks = df.filter(F.col(text_col).isNotNull()).select(
        "doc_id", F.explode_outer(tokens(text_col)).alias("tok")
    )
    joined = toks.withColumn(
        "bucket", F.when(F.col("tok").isNotNull(), bucket_of(F.col("tok"), n_buckets))
    ).join(F.broadcast(weights), "bucket", "left")
    per_doc = joined.groupBy("doc_id").agg(
        F.count("tok").cast("long").alias("n_tokens"),
        F.coalesce(F.sum("weight_milli"), F.lit(0)).cast("long").alias("w_sum"),
    )
    raw = (F.col("w_sum") + F.lit(bias_milli)) / (
        1000.0 * F.greatest(F.col("n_tokens"), F.lit(1))
    )
    score = F.floor(raw * 10000.0 + 0.5) / 10000.0
    scored = per_doc.select(
        "doc_id",
        "n_tokens",
        score.alias("score"),
        (score > threshold).alias("keep"),
    )
    nulls = df.filter(F.col(text_col).isNull()).select(
        "doc_id",
        F.lit(None).cast("long").alias("n_tokens"),
        F.lit(None).cast("double").alias("score"),
        F.lit(None).cast("boolean").alias("keep"),
    )
    return scored.unionByName(nulls)


def hashed_linear_score_sql(
    source: str = "documents",
    text_col: str = "text",
    n_buckets: int = 4096,
    bias_milli: int = 50,
    threshold: float = 0.0,
) -> str:
    """DuckDB twin of :func:`hashed_linear_score` (nested list fold;
    list_sum([]) NULL pinned to 0 via COALESCE)."""
    w = (
        f"(({rolling_hash_sql('tok')}) % {n_buckets}) * {SCRAMBLE} "
        f"% {HASH_MOD} % 2001 - 1000"
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {text_col} AS raw, {tokens_sql(text_col)} AS t
      FROM {source}
    ),
    summed AS (
      SELECT doc_id, raw, len(t) AS n,
             COALESCE(list_sum(list_transform(t, tok -> {w})), 0) AS w_sum
      FROM toks
    )
    SELECT doc_id,
           CASE WHEN raw IS NULL THEN NULL
                ELSE CAST(n AS BIGINT) END AS n_tokens,
           CASE WHEN raw IS NULL THEN NULL
                ELSE FLOOR((w_sum + {bias_milli})
                           / (1000.0 * GREATEST(n, 1)) * 10000.0 + 0.5)
                     / 10000.0 END AS score,
           CASE WHEN raw IS NULL THEN NULL
                ELSE FLOOR((w_sum + {bias_milli})
                           / (1000.0 * GREATEST(n, 1)) * 10000.0 + 0.5)
                     / 10000.0 > {threshold} END AS keep
    FROM summed
    """

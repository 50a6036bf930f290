"""Skew mitigation: salting for hot keys, bucketing for co-located
joins (SURVEY.md §7 hard-part 5: '100 TB posture').

The reference's answer to skew is dynamic work rebalancing at the
*read* level (RangeTracker.try_split, beam/io/iobase.py:206-576) —
nothing exists for skewed shuffle keys. Spark's AQE skew-join handles
the join case at runtime; these helpers cover the two patterns AQE
does not:

- ``salted_aggregate``: a hot groupBy key (one key = 30% of rows)
  bottlenecks a single reducer. Two-phase agg via a salt column keeps
  every reducer bounded: partial agg on (key, salt) → final agg on key.
  Only works for algebraic aggregates (sum/count/min/max — the same
  set Beam lifts in cy_combiners).
- ``write_bucketed`` / ``bucketed_join_ready``: pre-shuffle both sides
  of a recurring join into the same bucket layout so the join itself
  is shuffle-free (SortMergeJoin over co-located buckets).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_aggregate(
    df: DataFrame,
    key: str | Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``aggs`` maps output name → (partial_expr, final_expr_over_partial):
        {"n": (F.count(F.lit(1)), F.sum("n")),
         "total": (F.sum("x"), F.sum("total"))}

    Phase 1 groups on (key, salt) — at most ``num_salts`` rows per hot
    key per reducer; phase 2 merges the ≤num_salts partials per key.
    """
    ks = [key] if isinstance(key, str) else list(key)
    salted = df.withColumn("__salt__", (F.rand(0) * num_salts).cast("int"))
    partial = salted.groupBy(*ks, "__salt__").agg(
        *[p.alias(name) for name, (p, _) in aggs.items()]
    )
    return partial.groupBy(*ks).agg(
        *[f.alias(name) for name, (_, f) in aggs.items()]
    )


def salt_explode_small_side(
    big: DataFrame, small: DataFrame, on: str, num_salts: int = 16
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Skewed-join salting when the small side is too big to broadcast:
    salt the big side randomly, explode the small side across all
    salts, join on (key, salt). Returns (big', small', join_cols)."""
    big_s = big.withColumn("__salt__", (F.rand(0) * num_salts).cast("int"))
    small_s = small.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return big_s, small_s, [on, "__salt__"]


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist with a fixed bucket layout. Two tables bucketed the same
    way join without any exchange — the amortized answer for a join
    executed every pipeline run at 100 TB. ``path`` overrides the
    warehouse location (warehouse.dir is a static conf)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def bucketed_join(spark, left_table: str, right_table: str, on: Sequence[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed saved tables (shuffle-free when bucket
    specs match; verify with plans.count_shuffles == 0)."""
    return spark.table(left_table).join(spark.table(right_table), on=list(on), how=how)

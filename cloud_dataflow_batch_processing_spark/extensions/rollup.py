"""Incremental aggregation: persistable partial-aggregate state,
exactly re-aggregatable — the materialized-rollup shape every
large-scale batch pipeline ends up needing (daily partition arrives →
aggregate the increment only → merge with stored partials; a range
query over a year never rescans raw data).

This is the CombineFn accumulator contract (operators/combiners.py)
lifted to a TABLE: each partial row is an accumulator for one
(group, shard) cell, `merge` is the accumulator-merge, `finalize` the
extract. Decomposable aggregates only (sum / count / min / max, and
algebraic derivations like mean = sum/count); sums are carried as
DECIMAL(27,2) so merge order can never perturb a binary64 total —
the same determinism rule as queries.py.

Scale posture (100 TB):
- The increment aggregation shuffles ONLY the new partition's rows.
- Stored partials are (groups × shards) rows — the merge input is
  orders of magnitude smaller than raw data and shrinks further after
  merge; a year of daily partials over 10k groups is 3.6M tiny rows.
- Merge/finalize is one hash-agg on the group key; no join, no raw
  rescan. This is also exactly the backfill-repair story: recompute
  one day's partial, re-merge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

# Each measure expands to these accumulator columns.
_ACC_SUFFIXES = ("sum", "cnt", "min", "max")


def _acc(measure: str, suffix: str) -> str:
    return f"{measure}_{suffix}"


def rollup_partial(
    df: DataFrame, keys: Sequence[str], measures: Sequence[str]
) -> DataFrame:
    """Aggregate one increment (a day, a shard, a backfill slice) into
    accumulator rows: per key, each measure becomes
    (sum DECIMAL(27,2), cnt, min, max). The output is a plain
    DataFrame — write it wherever partials live."""
    aggs = []
    for m in measures:
        aggs += [
            F.sum(F.col(m).cast("decimal(27,2)")).alias(_acc(m, "sum")),
            F.count(F.col(m)).alias(_acc(m, "cnt")),
            F.min(F.col(m)).alias(_acc(m, "min")),
            F.max(F.col(m)).alias(_acc(m, "max")),
        ]
    return df.groupBy(*keys).agg(*aggs)


def rollup_merge(
    partials: DataFrame, keys: Sequence[str], measures: Sequence[str]
) -> DataFrame:
    """Merge accumulator rows (any union of rollup_partial outputs,
    any order, any number of times — associative and commutative by
    construction). Output has the same accumulator schema, so merges
    compose: day → month → year."""
    aggs = []
    for m in measures:
        aggs += [
            F.sum(_acc(m, "sum")).alias(_acc(m, "sum")),
            F.sum(_acc(m, "cnt")).alias(_acc(m, "cnt")),
            F.min(_acc(m, "min")).alias(_acc(m, "min")),
            F.max(_acc(m, "max")).alias(_acc(m, "max")),
        ]
    return partials.groupBy(*keys).agg(*aggs)


def rollup_finalize(
    merged: DataFrame, keys: Sequence[str], measures: Sequence[str]
) -> DataFrame:
    """Extract final values: sum (double), count, min, max, mean
    (exact decimal sum / count, in double space at the end — the
    queries.py determinism rule)."""
    cols = [F.col(k) for k in keys]
    for m in measures:
        s, c = F.col(_acc(m, "sum")), F.col(_acc(m, "cnt"))
        cols += [
            s.cast("double").alias(f"{m}_sum"),
            c.alias(f"{m}_count"),
            F.col(_acc(m, "min")).alias(f"{m}_min"),
            F.col(_acc(m, "max")).alias(f"{m}_max"),
            F.round(s.cast("double") / c, 4).alias(f"{m}_mean"),
        ]
    return merged.select(*cols)


def rollup_query(
    df: DataFrame,
    keys: Sequence[str],
    shard_keys: Sequence[str],
    measures: Sequence[str],
) -> DataFrame:
    """End-to-end shape for one plan: partials per (keys + shard_keys)
    — the cells an incremental pipeline would persist — merged down to
    ``keys`` and finalized. Value-identical to aggregating the raw
    rows directly (the oracle checks exactly that)."""
    partials = rollup_partial(df, [*keys, *shard_keys], measures)
    return rollup_finalize(rollup_merge(partials, keys, measures), keys, measures)


def rollup_finalize_sql(
    source_group_sql: str, keys: Sequence[str], measures: Sequence[str]
) -> str:
    """DuckDB oracle: the DIRECT aggregation a user would write — the
    partial/merge machinery must be invisible in the result."""
    cols = list(keys)
    for m in measures:
        cols += [
            f"CAST(CAST(SUM(CAST({m} AS DECIMAL(27,2))) AS DOUBLE) AS DOUBLE) AS {m}_sum",
            f"COUNT({m}) AS {m}_count",
            f"MIN({m}) AS {m}_min",
            f"MAX({m}) AS {m}_max",
            f"ROUND(CAST(SUM(CAST({m} AS DECIMAL(27,2))) AS DOUBLE) / COUNT({m}), 4) AS {m}_mean",
        ]
    sel = ",\n           ".join(cols)
    return f"SELECT {sel} FROM {source_group_sql} GROUP BY {', '.join(keys)}"

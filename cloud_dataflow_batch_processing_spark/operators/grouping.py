"""Grouping / aggregation operators — Beam's GBK/Combine family.

Reference surface (beam/transforms/):
- ``GroupByKey``      core.py:1344-1412 → groupBy + collect_list
- ``CoGroupByKey``    util.py:63-170    → per-side grouped lists + full
                       outer join + empty-array coalesce (reproduces the
                       empty-list-for-missing-side semantics, util.py:87-90)
- ``CombinePerKey``   core.py:1177      → groupBy().agg()  (partial+final
                       aggregation is automatic in Catalyst — the
                       reference implements this as "combiner lifting",
                       beam/runners/portability/fn_api_runner.py:378-523)
- ``CombineGlobally`` core.py:1054      → df.agg() (one-row frame)
- ``Count.*``         combiners.py:110-135
- ``Mean.*``          combiners.py:62-104
- ``Top.*``           combiners.py:160-365 → orderBy.limit / window rank
- ``Sample.*``        combiners.py:386-422
- ``ToList/ToDict``   combiners.py:477,506

Scale posture: all of these are native shuffled hash aggregates with
map-side partial aggregation; Top-per-key uses a window rank (single
shuffle on the key) rather than collect-and-sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _cols(cs: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cs]


def group_by_key(
    df: DataFrame,
    key: str | Sequence[str],
    value: str,
    sort_values: bool = True,
    out: str = "values",
) -> DataFrame:
    """``(k, v)*`` → ``(k, [v...])``. Beam twin: GroupByKey
    (beam/transforms/core.py:1344; used dataflow_pipeline.py:203-204).

    Beam's grouped iterable has no defined order; ``sort_values=True``
    pins a deterministic order for testability (the oracle compares
    sorted lists).
    """
    ks = [key] if isinstance(key, str) else list(key)
    agg = F.collect_list(value)
    if sort_values:
        agg = F.sort_array(agg)
    return df.groupBy(*ks).agg(agg.alias(out))


def cogroup_by_key(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_value: str,
    right_value: str,
    left_tag: str = "left",
    right_tag: str = "right",
) -> DataFrame:
    """Beam twin: CoGroupByKey (beam/transforms/util.py:63-170):
    ``(k, {left: [vs], right: [vs]})`` with empty lists for sides that
    lack the key (util.py:87-90). Plan: two keyed collect_list aggs +
    one full outer sort-merge join on the key — the same single-shuffle-
    per-side cost as Beam's tag→Flatten→GBK expansion, with Spark
    choosing the join strategy.
    """
    lg = left.groupBy(key).agg(F.sort_array(F.collect_list(left_value)).alias(left_tag))
    rg = right.groupBy(key).agg(F.sort_array(F.collect_list(right_value)).alias(right_tag))
    joined = lg.join(rg, on=key, how="full_outer")
    lt, rt = joined[left_tag], joined[right_tag]
    return joined.select(
        key,
        F.coalesce(lt, F.array().cast(lg.schema[left_tag].dataType)).alias(left_tag),
        F.coalesce(rt, F.array().cast(rg.schema[right_tag].dataType)).alias(right_tag),
    )


def combine_per_key(df: DataFrame, key: str | Sequence[str], *aggs: Column) -> DataFrame:
    """Beam twin: CombinePerKey (beam/transforms/core.py:1177). Catalyst
    always plans the partial/final HashAggregate pair the reference gets
    from combiner lifting (fn_api_runner.py:378-523)."""
    ks = [key] if isinstance(key, str) else list(key)
    return df.groupBy(*ks).agg(*aggs)


def combine_globally(df: DataFrame, *aggs: Column) -> DataFrame:
    """Beam twin: CombineGlobally (beam/transforms/core.py:1054) — a
    whole-frame reduce to one row."""
    return df.agg(*aggs)


def combine_values(
    df: DataFrame,
    values_col: str,
    init: Column,
    merge,
    finish=None,
    out: str = "combined",
) -> DataFrame:
    """Combine each already-grouped iterable (an array column) without
    re-shuffling. Beam twin: CombineValues (beam/transforms/core.py:
    1251-1343) — runs after a GroupByKey whose lists are materialized.
    Spark form: the ``aggregate`` higher-order function over the array.
    """
    agg = F.aggregate(F.col(values_col), init, merge, finish) if finish else F.aggregate(
        F.col(values_col), init, merge
    )
    return df.withColumn(out, agg)


def count_globally(df: DataFrame, out: str = "count") -> DataFrame:
    """Beam twin: Count.Globally (beam/transforms/combiners.py:110)."""
    return df.agg(F.count(F.lit(1)).alias(out))


def count_per_key(df: DataFrame, key: str | Sequence[str], out: str = "count") -> DataFrame:
    """Beam twin: Count.PerKey (beam/transforms/combiners.py:116)."""
    ks = [key] if isinstance(key, str) else list(key)
    return df.groupBy(*ks).agg(F.count(F.lit(1)).alias(out))


def count_per_element(df: DataFrame, value: str | Sequence[str], out: str = "count") -> DataFrame:
    """Beam twin: Count.PerElement (beam/transforms/combiners.py:122)."""
    return count_per_key(df, value, out)


def mean_globally(df: DataFrame, value: str, out: str = "mean") -> DataFrame:
    """Beam twin: Mean.Globally (beam/transforms/combiners.py:62)."""
    return df.agg(F.avg(value).alias(out))


def mean_per_key(df: DataFrame, key: str | Sequence[str], value: str, out: str = "mean") -> DataFrame:
    """Beam twin: Mean.PerKey (beam/transforms/combiners.py:68)."""
    ks = [key] if isinstance(key, str) else list(key)
    return df.groupBy(*ks).agg(F.avg(value).alias(out))


def top_largest(df: DataFrame, n: int, *order: Column | str) -> DataFrame:
    """Global top-n. Beam twin: Top.Of / Largest
    (beam/transforms/combiners.py:160,223; bounded-buffer TopCombineFn
    :248-365). Spark plans orderBy+limit as TakeOrderedAndProject — a
    per-partition bounded heap + driver merge, the same O(n) memory as
    Beam's threshold-pruned buffer, but parallel."""
    return df.orderBy(*_cols(order)).limit(n)


def top_largest_per_key(
    df: DataFrame, key: str | Sequence[str], n: int, *order: Column | str
) -> DataFrame:
    """Per-key top-n. Beam twin: Top.PerKey
    (beam/transforms/combiners.py:189). Window row_number over a single
    shuffle on the key — no collect_list materialization, so a hot key
    with millions of rows streams through the rank instead of building
    an in-memory list (the 100 TB-safe choice)."""
    ks = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*ks).orderBy(*_cols(order))
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= n)
        .drop("__rn__")
    )


def sample_fixed(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """Uniform sample without replacement of exactly n rows. Beam twin:
    Sample.FixedSizeGlobally (beam/transforms/combiners.py:386-422,
    implemented there as Top-n by random key). Same plan here: rand(seed)
    key + TakeOrderedAndProject — bounded memory, one pass."""
    return (
        df.withColumn("__r__", F.rand(seed))
        .orderBy("__r__")
        .limit(n)
        .drop("__r__")
    )


def sample_fixed_per_key(
    df: DataFrame, key: str | Sequence[str], n: int, seed: int = 42
) -> DataFrame:
    """Beam twin: Sample.FixedSizePerKey (beam/transforms/combiners.py:391)."""
    ks = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*ks).orderBy(F.rand(seed))
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= n)
        .drop("__rn__")
    )


def to_list(df: DataFrame, value: str, sort: bool = True, out: str = "values") -> DataFrame:
    """Gather a whole column into one array row. Beam twin: ToList
    (beam/transforms/combiners.py:477). Driver-bound by design — same
    caveat as Beam's single-element output."""
    agg = F.collect_list(value)
    if sort:
        agg = F.sort_array(agg)
    return df.agg(agg.alias(out))


def to_dict(df: DataFrame, key: str, value: str, out: str = "mapping") -> DataFrame:
    """Beam twin: ToDict (beam/transforms/combiners.py:506). Later
    duplicates win in Beam; map_from_entries keeps the last entry too."""
    return df.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(F.col(key), F.col(value))))
        ).alias(out)
    )

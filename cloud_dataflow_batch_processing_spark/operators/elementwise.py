"""Element-wise operators — the Beam ParDo family as DataFrame ops.

Reference surface (all in beam/transforms/):
- ``Map``        core.py:949-995   → select/withColumn (stays in codegen)
- ``FlatMap``    core.py:915       → explode
- ``Filter``     core.py:998       → df.filter
- ``Partition``  core.py:1466-1505 → route column + per-tag filters
- ``Flatten``    core.py:1666      → unionByName reduce
- ``Keys/Values/KvSwap`` util.py:173,178,183 → column projections
- ``RemoveDuplicates``   util.py:189-194     → dropDuplicates
- ``Reshuffle``  util.py:552       → repartition (a real shuffle barrier)
- multi-output ParDo ``with_outputs`` core.py:819 → tag column + cached
  parent + per-tag filters

Scale posture: every function here stays relational (whole-stage
codegen); none drops to Python. ParDo's arbitrary-Python path lives in
``pardo.py`` (mapInPandas) for the cases relational form can't express.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

from cloud_dataflow_batch_processing_spark.caching import managed_cache


def map_columns(df: DataFrame, **exprs: Column | str) -> DataFrame:
    """1→1 transform: each kwarg is output_col=expression. Beam twin:
    ``Map`` (beam/transforms/core.py:949) for the dominant dict-in/
    dict-out case (e.g. dataflow_pipeline.py:161-163,199-206)."""
    cols = [
        (F.expr(e) if isinstance(e, str) else e).alias(name)
        for name, e in exprs.items()
    ]
    return df.select(*cols)


def project(df: DataFrame, *fields: str) -> DataFrame:
    """Projection — the reference's field-subset Map
    (dataflow_pipeline.py:199-200 keeps 2 of 16 fields). Catalyst's
    column pruning pushes this into the scan."""
    return df.select(*fields)


def flat_map_explode(df: DataFrame, array_col: str | Column, alias: str = "value") -> DataFrame:
    """1→N via an array expression. Beam twin: ``FlatMap``
    (beam/transforms/core.py:915)."""
    col = F.expr(array_col) if isinstance(array_col, str) else array_col
    return df.select(F.explode(col).alias(alias))


def filter_rows(df: DataFrame, predicate: Column | str) -> DataFrame:
    """Beam twin: ``Filter`` (beam/transforms/core.py:998). Expressed as
    a Column so Catalyst pushes it to the scan."""
    return df.filter(predicate)


def partition_by(df: DataFrame, route: Column | str, n: int) -> list[DataFrame]:
    """Route each row to one of ``n`` outputs by an integer expression.
    Beam twin: ``Partition(fn, n)`` (beam/transforms/core.py:1466-1505).

    The parent is cached so the n branches scan it once, mirroring
    Beam's single-pass DoFn routing (ApplyPartitionFnFn core.py:1486).
    """
    route_col = F.expr(route) if isinstance(route, str) else route
    tagged = managed_cache(df.withColumn("__partition__", route_col.cast("int")))
    return [
        tagged.filter(F.col("__partition__") == i).drop("__partition__")
        for i in range(n)
    ]


def flatten(*dfs: DataFrame) -> DataFrame:
    """UNION ALL of N frames. Beam twin: ``Flatten``
    (beam/transforms/core.py:1666). Spark unions are logical — no
    materialization (same as the reference's sink_flattens rewrite,
    beam/runners/portability/fn_api_runner.py:567)."""
    return reduce(lambda a, b: a.unionByName(b), dfs)


def keys(df: DataFrame, key_col: str = "key") -> DataFrame:
    """Beam twin: ``Keys`` (beam/transforms/util.py:173)."""
    return df.select(key_col)


def values(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Beam twin: ``Values`` (beam/transforms/util.py:178)."""
    return df.select(value_col)


def kv_swap(df: DataFrame, key_col: str = "key", value_col: str = "value") -> DataFrame:
    """Beam twin: ``KvSwap`` (beam/transforms/util.py:183)."""
    return df.select(F.col(value_col).alias(key_col), F.col(key_col).alias(value_col))


def remove_duplicates(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Beam twin: ``RemoveDuplicates`` (beam/transforms/util.py:189-194,
    built there as (v,None)→CombinePerKey→Keys). Spark's dropDuplicates
    is the same shuffle-on-value plan with partial aggregation."""
    return df.dropDuplicates(list(subset)) if subset else df.distinct()


def reshuffle(df: DataFrame, num_partitions: int | None = None, *cols: str) -> DataFrame:
    """Beam twin: ``Reshuffle`` (beam/transforms/util.py:552) — break
    fusion / redistribute. In Spark this is a genuine shuffle barrier.
    With ``cols``, hash-partitions by those keys (the co-location tool
    for downstream joins/aggs at scale)."""
    if cols:
        return df.repartition(num_partitions, *cols) if num_partitions else df.repartition(*cols)
    return df.repartition(num_partitions) if num_partitions else df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def with_tags(df: DataFrame, tag_expr: Column | str, tags: Sequence[str]) -> dict[str, DataFrame]:
    """Multi-output ParDo: tag each row, cache the parent once, return
    one filtered child per tag. Beam twin: ``ParDo(...).with_outputs(
    *tags, main=...)`` / TaggedOutput (beam/transforms/core.py:819,
    beam/pvalue.py:179,254)."""
    tag_col = F.expr(tag_expr) if isinstance(tag_expr, str) else tag_expr
    tagged = managed_cache(df.withColumn("__tag__", tag_col))
    return {t: tagged.filter(F.col("__tag__") == t).drop("__tag__") for t in tags}

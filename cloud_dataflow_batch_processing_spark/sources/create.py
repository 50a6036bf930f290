"""In-memory source — Beam twin: ``Create`` (beam/transforms/core.py:1720).

Beam materializes a Python iterable as a pipeline source; Spark's
``createDataFrame`` is the same capability with a real schema.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def create(
    spark: SparkSession,
    values: Iterable[Any],
    schema: T.StructType | str | list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    values = list(values)
    # Beam's Create accepts bare scalars; Spark needs rows — wrap them.
    if values and not isinstance(values[0], (tuple, list, dict, T.Row)):
        values = [(v,) for v in values]
        if schema is None:
            schema = ["value"]
    df = spark.createDataFrame(values, schema=schema)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def _lit_cell(v: Any, dt: T.DataType) -> F.Column:
    """Literal Column for one cell, cast to the declared field type so
    the frame's schema is exact (None needs the cast to type at all)."""
    if v is None:
        return F.lit(None).cast(dt)
    if isinstance(dt, T.MapType):
        if not v:
            return F.map_from_arrays(
                F.array().cast(T.ArrayType(dt.keyType)),
                F.array().cast(T.ArrayType(dt.valueType)),
            )
        parts: list[F.Column] = []
        for k, mv in v.items():
            parts.append(F.lit(k).cast(dt.keyType))
            parts.append(_lit_cell(mv, dt.valueType))
        return F.create_map(*parts)
    if isinstance(dt, T.ArrayType):
        return F.array(*[_lit_cell(x, dt.elementType) for x in v]).cast(dt)
    return F.lit(v).cast(dt)


def local_df(
    spark: SparkSession,
    rows: Iterable[tuple],
    schema: T.StructType | str,
) -> DataFrame:
    """Driver-local BOUNDED frame as a pure-JVM literal plan.

    ``spark.createDataFrame(list)`` parallelizes the rows into a
    Python-RDD-backed ``LogicalRDD`` with ``defaultParallelism``
    partitions — every downstream action then pays one Python-worker
    partition evaluation per slice, and a ``coalesce(1)`` consumer
    (e.g. a single-file writer) pays all of them SEQUENTIALLY in one
    task: measured ~5 s per action for a 6-row header frame on
    local[32] (guide §4: the JVM↔Python boundary is the cost, not the
    data). This builder emits the rows as literal structs inlined over
    a 1-slice ``range(1)`` — no Python RDD, no Python workers, plans
    as a constant-folded JVM Generate, and actions cost milliseconds.

    For driver-local *metadata* frames only (headers, knob tables,
    watermarks — tens of rows); data-scale input belongs in
    :func:`create` / real sources.
    """
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)  # DDL "a int, b string"
    rows = list(rows)
    if not rows:
        return spark.range(0).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
    structs = [
        F.struct(
            *[
                _lit_cell(row[i], f.dataType).alias(f.name)
                for i, f in enumerate(schema.fields)
            ]
        )
        for row in rows
    ]
    return spark.range(0, 1, 1, 1).select(F.inline(F.array(*structs)))

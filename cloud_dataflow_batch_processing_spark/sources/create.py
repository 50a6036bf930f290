"""In-memory source — Beam twin: ``Create`` (beam/transforms/core.py:1720).

Beam materializes a Python iterable as a pipeline source; Spark's
``createDataFrame`` is the same capability with a real schema.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
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

"""Custom aggregation — Beam's CombineFn contract on Spark.

Reference surface: ``CombineFn`` with create_accumulator / add_input /
merge_accumulators / extract_output (beam/transforms/core.py:465-593),
plus the stock combiners it powers (combiners.py) and the compiled fast
paths (cy_combiners.py:33-318).

Spark-first stance: stock combiners (sum/min/max/mean/count/any/all)
should NEVER go through this adapter — they are native codegen'd
aggregates (use ``operators.grouping`` / ``F.*``). This adapter exists
for genuinely custom accumulation logic. It runs as an applyInPandas
grouped pass: Arrow-batched, one pass per key-partition.

Documented limitation (SURVEY.md §7 phase 2): Spark cannot split a
Python UDAF into partial+final stages, so a custom CombineFn aggregates
all rows of a key on one executor — same as Beam's DirectRunner without
combiner lifting. Keys must individually fit in executor memory; for
the lifted-combiner behavior at scale, express the accumulator as
native agg expressions instead.
"""

from __future__ import annotations

from typing import Any, Generic, TypeVar

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

A = TypeVar("A")  # accumulator
O = TypeVar("O")  # output


class CombineFn(Generic[A, O]):
    """Beam twin: beam/transforms/core.py:465. Subclass and implement
    the four phases; ``apply`` (reference :556) is derived."""

    def create_accumulator(self) -> A:
        raise NotImplementedError

    def add_input(self, accumulator: A, value: Any) -> A:
        raise NotImplementedError

    def merge_accumulators(self, accumulators: list[A]) -> A:
        raise NotImplementedError

    def extract_output(self, accumulator: A) -> O:
        raise NotImplementedError

    def apply(self, values: list[Any]) -> O:
        acc = self.create_accumulator()
        for v in values:
            acc = self.add_input(acc, v)
        return self.extract_output(self.merge_accumulators([acc]))


def combine_per_key_udaf(
    df: DataFrame,
    key: str,
    value: str,
    fn: CombineFn,
    output_type: T.DataType,
    out: str = "combined",
) -> DataFrame:
    """Run a custom CombineFn per key via applyInPandas (Arrow-batched).

    Beam twin: CombinePerKey(fn) with a custom CombineFn
    (beam/transforms/core.py:1177). The pandas group is the full
    grouped iterable — phases run exactly as Beam's PhasedCombineFnExecutor
    (beam/transforms/combiners.py:575) would with a single merge.
    """
    key_field = df.schema[key]
    out_schema = T.StructType([key_field, T.StructField(out, output_type)])

    def agg_group(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = fn.create_accumulator()
        for v in pdf[value]:
            acc = fn.add_input(acc, v)
        result = fn.extract_output(fn.merge_accumulators([acc]))
        return pd.DataFrame({key: [pdf[key].iloc[0]], out: [result]})

    return df.select(key, value).groupBy(key).applyInPandas(agg_group, schema=out_schema)

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

Combiner lifting: Spark cannot split a Python UDAF into partial+final
stages natively, so ``combine_per_key_udaf`` implements the lift
itself, the way Beam's runner does it
(beam/runners/direct/helper_transforms.py:28-105 —
PartialGroupByKeyCombiningValues then FinalCombine):

    stage 1  mapInPandas over the *unshuffled* input: fold
             create_accumulator/add_input per key per partition,
             emit one pickled accumulator per (partition, key);
    shuffle  only accumulators move — one row per key per partition,
             not one row per input element;
    stage 2  applyInPandas per key: merge_accumulators over the
             partials, extract_output.

A hot key therefore never colocates its raw rows on one task; what
reaches the final task is bounded by the partition count. Stock
combiners (sum/min/max/mean/count/any/all) should still NEVER go
through this adapter — they are native codegen'd aggregates (use
``operators.grouping`` / ``F.*``).
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator
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


def partial_accumulators(
    df: DataFrame, key: str, value: str, fn: CombineFn
) -> DataFrame:
    """Stage 1 of the lifted combine: map-side partial aggregation.

    Runs on the input's existing partitioning (no shuffle): per
    partition, folds ``add_input`` into one accumulator per key across
    all Arrow batches, then emits (key, pickle(accumulator)). The
    output has at most one row per key per input partition — this is
    the frame that gets shuffled, not the raw rows.
    """
    key_field = df.schema[key]
    acc_schema = T.StructType([key_field, T.StructField("__acc", T.BinaryType())])

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        accs: dict[Any, Any] = {}
        for pdf in batches:
            for k, v, is_null in zip(pdf[key], pdf[value], pdf["__isnull"]):
                # SQL-aggregate NULL semantics: a NULL input contributes
                # nothing, but the group still exists (identity
                # accumulator). NULL is detected via a plan-side
                # validity mask (F.isnull, codegen) because the
                # Arrow->pandas conversion folds NULL into NaN for
                # float columns — a `v != v` guard here would also
                # swallow GENUINE NaN inputs, which must reach
                # add_input like Spark's native aggregates propagate
                # them (ADVICE r8).
                if is_null:
                    if k not in accs:
                        accs[k] = fn.create_accumulator()
                    continue
                acc = accs.get(k)
                if acc is None:
                    acc = fn.create_accumulator()
                accs[k] = fn.add_input(acc, v)
        if accs:
            yield pd.DataFrame(
                {
                    key: list(accs.keys()),
                    "__acc": [pickle.dumps(a) for a in accs.values()],
                }
            )

    from pyspark.sql import functions as F

    masked = df.select(key, value, F.isnull(value).alias("__isnull"))
    return masked.mapInPandas(partial, schema=acc_schema)


def combine_per_key_udaf(
    df: DataFrame,
    key: str,
    value: str,
    fn: CombineFn,
    output_type: T.DataType,
    out: str = "combined",
) -> DataFrame:
    """Run a custom CombineFn per key with combiner lifting.

    Beam twin: CombinePerKey(fn) with a custom CombineFn
    (beam/transforms/core.py:1177), lifted into partial+final stages
    exactly as beam/runners/direct/helper_transforms.py:28-105 does.
    Only per-(partition, key) accumulators cross the shuffle; the final
    applyInPandas group merges at most one accumulator per input
    partition, so hot keys can't straggler/OOM a task with raw rows.
    """
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_type

    key_field = df.schema[key]
    out_schema = T.StructType([key_field, T.StructField(out, output_type)])
    key_at, out_at = to_arrow_type(key_field.dataType), to_arrow_type(output_type)
    partials = partial_accumulators(df, key, value, fn)

    # applyInArrow, not applyInPandas: a genuine NaN from extract_output
    # must survive into a double output column, and the pandas->Arrow
    # conversion folds NaN into NULL (pandas' null sentinel). Explicit
    # pa.array construction keeps NaN a VALUE, matching how Spark's
    # native aggregates emit NaN totals (ADVICE r8).
    def final(tbl: pa.Table) -> pa.Table:
        accs = [pickle.loads(b.as_py()) for b in tbl["__acc"]]
        result = fn.extract_output(fn.merge_accumulators(accs))
        return pa.table(
            {
                key: pa.array([tbl[key][0].as_py()], type=key_at),
                out: pa.array([result], type=out_at),
            }
        )

    return partials.groupBy(key).applyInArrow(final, schema=out_schema)

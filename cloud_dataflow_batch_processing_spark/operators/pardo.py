"""ParDo — Beam's generalized DoFn (1→N with bundle lifecycle) on Spark.

Reference surface: ``ParDo(DoFn)`` with process/start_bundle/
finish_bundle and side inputs (beam/transforms/core.py:751-914, DoFn
:278-342).

Spark mapping: a Beam *bundle* corresponds to an Arrow batch /
partition; ``mapInPandas`` gives the same lifecycle (generator setup =
start_bundle, generator finally-block = finish_bundle) with Arrow
transfer instead of per-row pickling. This is the designated slow path
— anything expressible relationally should use ``elementwise``/
``grouping`` instead (SURVEY.md §2.2 ParDo row).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


class DoFn:
    """Beam twin: beam/transforms/core.py:278. ``process`` receives one
    row as a dict and yields 0..N output dicts (UDTF shape). Bundle
    hooks mirror reference :330,:339."""

    def start_bundle(self) -> None:  # beam/transforms/core.py:330
        pass

    def process(self, element: dict[str, Any]) -> Iterable[dict[str, Any]]:
        raise NotImplementedError

    def finish_bundle(self) -> None:  # beam/transforms/core.py:339
        pass


def par_do(df: DataFrame, fn: DoFn, output_schema: T.StructType) -> DataFrame:
    """Apply a DoFn over the frame via mapInPandas (Arrow-batched).

    Side inputs: close over broadcast variables or plain Python values
    in the DoFn — the Spark twin of Beam's execution-time side-input
    argument substitution (beam/transforms/core.py:387).
    """
    out_cols = [f.name for f in output_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn.start_bundle()
        try:
            for pdf in batches:
                rows = []
                for rec in pdf.to_dict("records"):
                    rows.extend(fn.process(rec))
                yield pd.DataFrame(rows, columns=out_cols)
        finally:
            fn.finish_bundle()

    return df.mapInPandas(run, schema=output_schema)


def flat_map_pandas(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: T.StructType,
) -> DataFrame:
    """Vectorized 1→N: fn maps a whole Arrow batch to an output batch.
    The fast custom path — prefer this over row-at-a-time ``par_do``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(run, schema=output_schema)

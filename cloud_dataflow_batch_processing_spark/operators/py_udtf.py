"""Python UDTF (Spark 4 `@udtf`) — the native table-function twin of
the DoFn.process contract (beam/transforms/core.py:186-319: one input
element, zero-to-many output rows).

`operators/pardo.py` already lifts DoFns onto `flatMap`-style
mapInPandas; this module covers the *API-surface* parity with Spark's
own user-defined table function, callable from SQL with LATERAL —
i.e. what a user migrating a multi-row-producing DoFn would reach for
first. Row-at-a-time Python is deliberately NOT the 100 TB hot path
(see extensions/multimodal.py for the Arrow-batched pattern); the
registered query exists to pin the semantics and the SQL surface.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="seg_idx: int, segment: string, n_tokens: int")
class SplitSegments:
    """Split a document on an arbitrary delimiter, one output row per
    segment with its index and whitespace token count — the classic
    one-to-many DoFn shape ('. ' for sentences, '\\n' for lines...)."""

    def eval(self, text: str, delim: str):  # noqa: D102 — contract is the class doc
        if text is None:
            return
        for i, seg in enumerate(text.split(delim)):
            yield i, seg, len(seg.split())


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register the UDTFs on a session (CREATE OR REPLACE
    semantics — safe to call per query)."""
    spark.udtf.register("split_segments", SplitSegments)

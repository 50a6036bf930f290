"""Custom keyed state — Beam's stateful DoFn / state+timers analog.

Reference surface: streaming GBK with per-key state and watermark
timers (beam/runners/direct/transform_evaluator.py:676-789;
beam/transforms/trigger.py:747,1146 GeneralTriggerDriver). Spark twin:
``applyInPandasWithState`` — per-key mutable state with a processing/
event-time timeout, Arrow-batched.

Scope per SURVEY.md §7 hard-part 1: standard windowed aggregations use
the native window operators (streaming/windows.py); this module exists
for what those can't express — running per-key accumulators, streaming
dedup, custom session logic with early emission.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def stateful_transform(
    df: DataFrame,
    key_cols: list[str],
    fn: Callable[[tuple, Iterable[pd.DataFrame], GroupState], Iterable[pd.DataFrame]],
    state_schema: T.StructType | str,
    output_schema: T.StructType | str,
    output_mode: str = "update",
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Thin, typed wrapper over applyInPandasWithState. ``fn`` is the
    Beam stateful-DoFn body: (key, input batches, state handle) →
    output batches; use ``state.update``/``state.get``/``state.exists``
    and the timeout for timer-like behavior."""
    return df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf=timeout,
    )


def running_count_per_key(df: DataFrame, key_col: str) -> DataFrame:
    """Example stateful operator: a monotonically-updated per-key count
    emitted every micro-batch — Beam's combining state cell
    (beam/transforms/trigger.py CombiningValueStateSpec idiom)."""

    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        n = sum(len(p) for p in pdfs)
        (prev,) = state.get if state.exists else (0,)
        total = prev + n
        state.update((total,))
        yield pd.DataFrame({"key": [key[0]], "total": [total]})

    return stateful_transform(
        df,
        [key_col],
        update,
        state_schema="total long",
        output_schema="key long, total long",
    )


def streaming_dedup_by_key(df: DataFrame, key_col: str) -> DataFrame:
    """Streaming exact dedup: emit a key's row only the first time the
    key is seen (per-key seen-flag state — Beam's BagState dedup
    pattern). State is one boolean per key; pair with a state TTL
    (ProcessingTimeTimeout) in production to bound the store."""

    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        count = sum(len(p) for p in pdfs)
        if state.exists or count == 0:
            return
        state.update((True,))
        yield pd.DataFrame({"key": [key[0]], "first_seen_rows": [count]})

    return stateful_transform(
        df,
        [key_col],
        update,
        state_schema="seen boolean",
        output_schema="key long, first_seen_rows long",
        output_mode="append",
    )

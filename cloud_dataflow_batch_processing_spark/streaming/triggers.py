"""Trigger emulation — the scoped answer to Beam's trigger zoo.

Reference surface (beam/transforms/trigger.py): DefaultTrigger :233,
AfterProcessingTime :272, AfterWatermark(early, late) :320, AfterCount
:430, Repeatedly :475, AfterAny/All/Each :592-608, OrFinally :676, with
ACCUMULATING/DISCARDING modes :62.

Structured Streaming has output modes, not per-window trigger programs
(SURVEY.md §7 hard-part 1 — full parity is a non-goal). What this
module provides is the *useful subset*, built from Spark primitives:

- ``AfterWatermark`` (default trigger, DISCARDING-final) ≡ append-mode
  windowed agg — no emulation needed (streaming/windows.py).
- ``AfterWatermark(early=AfterProcessingTime(...))`` in ACCUMULATING
  mode ≡ ``early_and_final``: the same aggregation run as two queries
  over the same replayable source — update mode fires an accumulated
  pane every micro-batch (the early firings; micro-batch cadence = the
  processing-time trigger), append mode fires the on-time final pane
  when the watermark passes. Rows are tagged ``firing='early'|'final'``.
- ``AfterCount(n)`` per key ≡ ``fire_after_count``: keyed state
  buffers n elements, emits one accumulated pane per n (Repeatedly-
  wrapped count trigger, ACCUMULATING).
- ``AfterAny(AfterCount(n), AfterProcessingTime(d))`` ≡
  ``fire_after_any``: keyed state + a processing-time timeout — the
  count leg fires inline as elements arrive; the time leg fires via
  ``GroupStateTimeout.ProcessingTimeTimeout`` when a partial pane has
  been pending for ``d`` (the most common remaining Beam combinator,
  trigger.py:592 — "emit every n records or every d seconds,
  whichever comes first").

Late firings (``late=``) are unreachable with allowed_lateness
hardcoded to 0 in the reference (beam/transforms/core.py:1571), so
they are deliberately out of scope.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState

from cloud_dataflow_batch_processing_spark.streaming.state import stateful_transform


def early_and_final(
    build_agg: Callable[[], DataFrame],
    sink_early,
    sink_final,
    checkpoint_early: str,
    checkpoint_final: str,
    available_now: bool = True,
):
    """Run the same windowed aggregation as an early-firing (update
    mode, accumulating panes) and a final-firing (append mode, on-time
    pane) query pair. ``build_agg`` must construct a fresh watermarked
    aggregate per call (streaming DataFrames are single-use plans).

    ``sink_early``/``sink_final`` are foreachBatch callables
    ``(DataFrame, batch_id) -> None`` receiving rows tagged with a
    ``firing`` column. Returns both started queries (caller awaits).
    """

    def tagged(df: DataFrame, tag: str) -> DataFrame:
        return df.withColumn("firing", F.lit(tag))

    def make(writer_df, mode, ckpt, sink):
        w = (
            writer_df.writeStream.foreachBatch(sink)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    q_early = make(
        tagged(build_agg(), "early"),
        "update",
        checkpoint_early,
        sink_early,
    )
    q_final = make(
        tagged(build_agg(), "final"),
        "append",
        checkpoint_final,
        sink_final,
    )
    return q_early, q_final


def fire_after_count(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n: int,
) -> DataFrame:
    """AfterCount(n), Repeatedly, ACCUMULATING: per key, emit the
    accumulated (count, sum) pane each time n new elements arrive.
    Output: (key, pane, n_elements, total) — one row per fired pane.
    """

    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        buffered, total, panes = state.get if state.exists else (0, 0.0, 0)
        rows = {"key": [], "pane": [], "n_elements": [], "total": []}
        for pdf in pdfs:
            for v in pdf[value_col]:
                buffered += 1
                total += float(v)
                if buffered % n == 0:
                    panes += 1
                    rows["key"].append(key[0])
                    rows["pane"].append(panes)
                    rows["n_elements"].append(buffered)
                    rows["total"].append(total)
        state.update((buffered, total, panes))
        if rows["key"]:
            yield pd.DataFrame(rows)

    return stateful_transform(
        df,
        [key_col],
        update,
        state_schema="buffered long, total double, panes long",
        output_schema="key long, pane long, n_elements long, total double",
        output_mode="append",
    )


def fire_after_any(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n: int,
    processing_time_ms: int,
) -> DataFrame:
    """AfterAny(AfterCount(n), AfterProcessingTime(d)), Repeatedly,
    ACCUMULATING (beam/transforms/trigger.py:592 AfterAny, :272
    AfterProcessingTime, :430 AfterCount).

    Per key, a pane fires when EITHER n new elements have arrived since
    the last firing (cause='count', emitted inline) OR a partial pane
    has been pending for ``processing_time_ms`` (cause='time', emitted
    through the state timeout — Beam's processing-time timer). Panes
    are accumulating: each carries the lifetime element count and sum.
    Output: (key, pane, cause, n_elements, total).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        rows = {"key": [], "pane": [], "cause": [], "n_elements": [], "total": []}

        def fire(cause: str, panes: int, count_all: int, total: float) -> None:
            rows["key"].append(key[0])
            rows["pane"].append(panes)
            rows["cause"].append(cause)
            rows["n_elements"].append(count_all)
            rows["total"].append(total)

        import time as _time

        if state.hasTimedOut:
            pending, total, count_all, panes, _pane_start = state.get
            if pending > 0:
                panes += 1
                fire("time", panes, count_all, total)
            state.update((0, total, count_all, panes, 0))
            # No new timer until the next element starts a new pane.
        else:
            pending, total, count_all, panes, pane_start = (
                state.get if state.exists else (0, 0.0, 0, 0, 0)
            )
            for pdf in pdfs:
                for v in pdf[value_col]:
                    if pending == 0:
                        pane_start = int(_time.time() * 1000)
                    pending += 1
                    count_all += 1
                    total += float(v)
                    if pending >= n:
                        panes += 1
                        fire("count", panes, count_all, total)
                        pending = 0
                        pane_start = 0
            state.update((pending, total, count_all, panes, pane_start))
            if pending > 0:
                # Arm the time leg relative to the pane's FIRST element
                # (AfterProcessingTime semantics) — a trickle of later
                # elements must not push the deadline back.
                remaining = pane_start + processing_time_ms - int(_time.time() * 1000)
                state.setTimeoutDuration(max(1, remaining))
        if rows["key"]:
            yield pd.DataFrame(rows)

    return stateful_transform(
        df,
        [key_col],
        update,
        state_schema="pending long, total double, count_all long, panes long, pane_start long",
        output_schema="key long, pane long, cause string, n_elements long, total double",
        output_mode="append",
        timeout=GroupStateTimeout.ProcessingTimeTimeout,
    )

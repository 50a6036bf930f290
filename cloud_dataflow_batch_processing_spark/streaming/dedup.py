"""Streaming deduplication — Beam ``RemoveDuplicates`` on an unbounded
stream (beam/transforms/util.py:189-194; its batch twin is
``operators/elementwise.py::remove_duplicates``).

The scale problem is STATE, not the dedup itself: a streaming
``dropDuplicates(keys)`` keeps one state row per distinct key forever,
which on an unbounded keyspace (doc ids, event ids) grows without
bound and eventually OOMs the state store. The production shape is
watermark-scoped dedup: a key's state may be dropped once the
watermark has passed its event time — re-deliveries (the at-least-once
source contract this repo's replayable socket/file sources exhibit)
land inside the watermark window, so bounded state still catches every
real duplicate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def remove_duplicates_stream(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str | None = None,
    delay: str = "0 seconds",
) -> DataFrame:
    """Drop duplicate rows by ``keys`` on a (possibly streaming) frame.

    With ``ts_col``, state is bounded: the event-time column gets a
    watermark of ``delay`` and dedup runs via
    ``dropDuplicatesWithinWatermark`` — two rows with equal keys are
    deduplicated as long as they arrive within ``delay`` of each other,
    and key state expires afterward. Size ``delay`` to the source's
    maximum re-delivery window (the Beam analog: deduplication state in
    the runner is similarly scoped to the window/GC horizon).

    Without ``ts_col``: exact global dedup — correct on batch frames
    and finite (availableNow) streams, but unbounded state on a truly
    unbounded stream; callers get the honest primitive either way.
    """
    if ts_col is None:
        return df.dropDuplicates(list(keys))
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))

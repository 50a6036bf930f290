"""Event-time windowing — Beam's window model on Structured Streaming.

Reference surface (beam/transforms/window.py):
- ``GlobalWindows``            :287 → plain (un-windowed) aggregation
- ``FixedWindows(size,offset)``:318 → ``F.window(ts, size)`` (tumbling);
  assignment math ``start = t - (t - offset) % size`` (:338-341) is
  exactly Spark's window bucketing
- ``SlidingWindows(size,period)``:370 → ``F.window(ts, size, period)``
- ``Sessions(gap)``            :429 → ``F.session_window(ts, gap)``
  (Spark implements the same merge-touching-windows algorithm the
  reference hand-rolls at :451-470)
- ``TimestampedValue``         :236 → the event-time column itself
- Watermarks/late data: Beam 2.5 Python hardcodes allowed_lateness=0
  (beam/transforms/core.py:1571) → ``withWatermark(ts, delay)`` with
  delay='0 seconds' reproduces drop-late-rows exactly. Beam's
  per-transform watermarks (beam/runners/direct/watermark_manager.py:32)
  are strictly finer than Spark's per-query watermark; for the
  reference's batch workloads the distinction is unobservable.
- Triggers (beam/transforms/trigger.py:233-676): no Structured
  Streaming equivalent for early/late firings — scoped to the default
  trigger (≈ append mode after watermark). See SURVEY.md §7 hard-part 1.

These helpers work identically on batch and streaming frames — the
batch path is what the DuckDB oracle checks; the streaming path is
driven by the foreachBatch/availableNow test harness (tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str = "0 seconds") -> DataFrame:
    """Beam-parity default: zero allowed lateness (core.py:1571)."""
    return df.withWatermark(ts_col, delay)


def _epoch_s(field: str):
    """ANSI- and NTZ-safe epoch seconds for a window bound. Under the
    driver's vanilla session (ANSI mode on, events.ts surfacing as
    TIMESTAMP_NTZ) a numeric CAST of the bound is illegal; a wall-clock
    timestampdiff against the NTZ epoch works for both TIMESTAMP_NTZ
    (pure wall arithmetic, timezone-free) and TIMESTAMP (the NTZ epoch
    literal coerces via the session zone, which this repo pins to
    UTC)."""
    return F.expr(f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {field})")


def tumbling(
    df: DataFrame,
    ts_col: str,
    size: str,
    keys: Sequence[str] = (),
    *aggs: Column,
) -> DataFrame:
    """FixedWindows → window(ts, size): groupBy(window, keys).agg(...),
    window bounds exposed as epoch-second columns (w_start, w_end)."""
    g = df.groupBy(F.window(ts_col, size), *keys).agg(*aggs)
    return g.select(
        _epoch_s("window.start").alias("w_start"),
        _epoch_s("window.end").alias("w_end"),
        *keys,
        *[c for c in g.columns if c != "window" and c not in keys],
    )


def sliding(
    df: DataFrame,
    ts_col: str,
    size: str,
    period: str,
    keys: Sequence[str] = (),
    *aggs: Column,
) -> DataFrame:
    """SlidingWindows → window(ts, size, period): each event lands in
    size/period windows (duplicate-assign happens inside the window
    expression, not via explode of the input)."""
    g = df.groupBy(F.window(ts_col, size, period), *keys).agg(*aggs)
    return g.select(
        _epoch_s("window.start").alias("w_start"),
        _epoch_s("window.end").alias("w_end"),
        *keys,
        *[c for c in g.columns if c != "window" and c not in keys],
    )


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    *aggs: Column,
) -> DataFrame:
    """Sessions(gap) → session_window(ts, gap): merge-on-touch session
    windows per key (the reference's merge algorithm window.py:451-470,
    natively)."""
    g = df.groupBy(F.session_window(ts_col, gap), *keys).agg(*aggs)
    return g.select(
        _epoch_s("session_window.start").alias("w_start"),
        _epoch_s("session_window.end").alias("w_end"),
        *keys,
        *[c for c in g.columns if c != "session_window" and c not in keys],
    )

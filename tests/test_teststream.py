"""Scripted watermark tests — TestStream parity
(beam/testing/test_stream.py): hold the watermark, advance it
explicitly, observe exactly when panes fire and that late data drops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloud_dataflow_batch_processing_spark.streaming.teststream import TestStream


def _window_counts(df):
    return (
        df.groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .select(
            F.col("window.start").cast("long").alias("w_start"), "n", "total"
        )
    )


@pytest.mark.slowsweep
def test_scripted_watermark_controls_pane_timing(spark, tmp_path):
    h0 = 1704067200  # 2024-01-01 00:00:00 UTC

    script = (
        TestStream("ts string, user long, v double")
        .add_elements(
            [
                {"ts": "2024-01-01 00:10:00", "user": 1, "v": 1.0},
                {"ts": "2024-01-01 00:20:00", "user": 2, "v": 2.0},
            ]
        )
        # More data, watermark still inside the 00:00 window — no pane.
        .add_elements([{"ts": "2024-01-01 00:40:00", "user": 1, "v": 3.0}])
        # Explicit advance past the window end — the on-time pane fires
        # HERE, with all 3 rows, even though no real element moved time.
        .advance_watermark_to("2024-01-01 01:00:01")
        # A late element for the closed window: dropped, fires nothing.
        .add_elements([{"ts": "2024-01-01 00:50:00", "user": 3, "v": 99.0}])
    )
    step_out = script.run(spark, _window_counts, str(tmp_path))

    assert step_out[0] == [] and step_out[1] == [], "no pane before the advance"
    fired = [(r.w_start, r.n, r.total) for r in step_out[2]]
    assert fired == [(h0, 3, 6.0)], "advance fires the on-time pane with all rows"
    assert step_out[3] == [], "late element after the advance is dropped"


@pytest.mark.slowsweep
def test_scripted_watermark_multiple_windows(spark, tmp_path):
    """Two windows closed by two separate scripted advances — each
    advance releases exactly its own window's pane."""
    h0 = 1704067200
    h1 = h0 + 3600

    script = (
        TestStream("ts string, user long, v double")
        .add_elements(
            [
                {"ts": "2024-01-01 00:30:00", "user": 1, "v": 1.0},
                {"ts": "2024-01-01 01:30:00", "user": 1, "v": 10.0},
            ]
        )
        .advance_watermark_to("2024-01-01 01:00:01")
        .add_elements([{"ts": "2024-01-01 01:45:00", "user": 2, "v": 20.0}])
        .advance_watermark_to("2024-01-01 02:00:01")
    )
    step_out = script.run(spark, _window_counts, str(tmp_path))

    assert [(r.w_start, r.n) for r in step_out[1]] == [(h0, 1)]
    assert step_out[2] == [], "01:00 window still open while watermark at 01:00:01"
    assert [(r.w_start, r.n, r.total) for r in step_out[3]] == [(h1, 2, 30.0)]

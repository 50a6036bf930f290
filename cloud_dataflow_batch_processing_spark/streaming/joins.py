"""Stream-stream joins (Beam windowed CoGroupByKey over two unbounded
PCollections, beam/transforms/util.py:87-90 + window.py:348 — in Beam
2.5 a two-stream join IS CoGroupByKey applied per (key, window)).

Structured Streaming expresses the same semantics as an equi-join on
(key, window(ts)) with watermarks on BOTH inputs: the window-equality
clause gives the state manager a provable expiry bound, so each side
buffers only the windows the watermark has not closed — bounded state
at any scale, no unbounded stream buffering. Append-only output, like
every stream-stream join in Spark.

Scale posture: the join shuffles both streams on (key, window) — the
same key distribution discipline as a batch join applies (skewed hot
keys split by AQE in batch; in streaming, pre-salt the key if one key
dominates a window). Outer-join null rows emit only when the watermark
passes the window end: a quiet stream delays them (the availableNow
tests drive this explicitly with a sentinel batch)."""

from __future__ import annotations

from cloud_dataflow_batch_processing_spark.streaming import windows
from pyspark.sql import DataFrame, functions as F


def windowed_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    size: str,
    how: str = "inner",
    watermark: str = "0 seconds",
    suffix: str = "_r",
) -> DataFrame:
    """Join two (possibly streaming) frames per (key, fixed window).

    Both sides get ``withWatermark(ts_col, watermark)`` and a
    ``window(ts_col, size)`` column; the join condition is key equality
    plus window equality. Right-side non-key columns are renamed with
    ``suffix`` so the output schema is unambiguous. Returns the joined
    frame with ``w_start``/``w_end`` epoch seconds.
    """
    # After window(ts) on a watermarked column BOTH ts and the window
    # struct carry event-time metadata; Spark allows at most one event
    # time column per stream, so each side projects the raw ts away and
    # keeps the window as its single event-time column.
    keep_l = [c for c in left.columns if c not in on and c != ts_col]
    lw = (
        left.withWatermark(ts_col, watermark)
        .withColumn("__w", F.window(ts_col, size))
        .select(*on, "__w", *keep_l)
    )
    keep_r = [c for c in right.columns if c not in on and c != ts_col]
    rw = (
        right.withWatermark(ts_col, watermark)
        .withColumn("__w", F.window(ts_col, size))
        .select(*on, "__w", *[F.col(c).alias(f"{c}{suffix}") for c in keep_r])
    )
    joined = lw.join(rw, on=[*on, "__w"], how=how)
    return joined.select(
        windows._epoch_s("__w.start").alias("w_start"),
        windows._epoch_s("__w.end").alias("w_end"),
        *[c for c in joined.columns if c != "__w"],
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
    suffix: str = "_d",
) -> DataFrame:
    """Stream-static enrichment: a streaming fact joined to a BATCH
    dimension (Beam's side-input pattern — AsDict side input consumed
    by a ParDo, operators/side_inputs.py — expressed as Spark's
    stream-static join).

    The static side carries an explicit broadcast hint: each
    micro-batch then hash-probes executor-local dim copies — the
    stream is never shuffled and no join state is kept (the static
    side is re-resolved per micro-batch, so a dim refresh between
    batches is picked up — exactly the slowly-changing-lookup posture
    a 100 TB pipeline wants; a dim too big to broadcast should instead
    be pre-bucketed on the key, same as batch).

    Right-side non-key columns get ``suffix`` to keep the output
    schema unambiguous. Left join by default: facts with no dim row
    survive with NULLs (inner would silently drop them)."""
    keep_d = [c for c in dim.columns if c not in on]
    d = dim.select(*on, *[F.col(c).alias(f"{c}{suffix}") for c in keep_d])
    return stream.join(F.broadcast(d), on=on, how=how)

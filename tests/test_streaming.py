"""Genuinely-streaming execution tests (SURVEY.md §5 item 3): the same
window helpers driven through Structured Streaming with a file source,
watermark = 0 (Beam 2.5 parity: allowed_lateness hardcoded 0,
beam/transforms/core.py:1571), availableNow trigger, memory sink."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from cloud_dataflow_batch_processing_spark.streaming.windows import (
    session,
    tumbling,
    with_watermark,
)


@pytest.fixture()
def stream_events(spark, tmp_path):
    """A small deterministic event stream written as JSON files, read
    back with readStream (file source = replayable unbounded source)."""
    rows = [
        # (ts, user, value) — two users, two 1-hour buckets
        ("2024-01-01 00:05:00", 1, 10.0),
        ("2024-01-01 00:15:00", 1, 5.0),
        ("2024-01-01 00:55:00", 2, 1.0),
        ("2024-01-01 01:05:00", 1, 2.0),
        ("2024-01-01 01:40:00", 2, 3.0),
    ]
    batch = spark.createDataFrame(rows, "ts_s string, user_id long, value double").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "value"
    )
    path = str(tmp_path / "events_json")
    batch.coalesce(1).write.mode("overwrite").json(path)
    return spark.readStream.schema("ts timestamp, user_id long, value double").json(path)


def _run_to_memory(sdf, name: str):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    return q


def test_streaming_tumbling(spark, stream_events):
    sdf = tumbling(
        with_watermark(stream_events, "ts"),
        "ts",
        "1 hour",
        ["user_id"],
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sum_value"),
    )
    _run_to_memory(sdf, "t_tumbling")
    got = {
        (r.w_start, r.user_id): (r.n, r.sum_value)
        for r in spark.sql("select * from t_tumbling").collect()
    }
    h0 = 1704067200  # 2024-01-01 00:00:00 UTC
    assert got[(h0, 1)] == (2, 15.0)
    assert got[(h0, 2)] == (1, 1.0)
    assert got[(h0 + 3600, 1)] == (1, 2.0)
    assert got[(h0 + 3600, 2)] == (1, 3.0)


def test_streaming_session(spark, stream_events):
    sdf = session(
        with_watermark(stream_events, "ts"),
        "ts",
        "30 minutes",
        ["user_id"],
        F.count(F.lit(1)).alias("n"),
    )
    _run_to_memory(sdf, "t_session")
    rows = spark.sql("select * from t_session").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.w_start, r.w_end, r.n))
    # user 1: events at 00:05 and 00:15 merge (gap 10m < 30m); 01:05 separate
    assert sorted(by_user[1]) == [
        (1704067500, 1704069900, 2),  # 00:05 → 00:45 (00:15 + 30m)
        (1704071100, 1704072900, 1),  # 01:05 → 01:35
    ]
    # user 2: 00:55 and 01:40 are 45m apart → two sessions
    assert len(by_user[2]) == 2


@pytest.mark.slowsweep
def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    """With watermark delay 0 and append mode, a row older than the
    watermark is dropped — Beam 2.5's allowed_lateness=0 semantics.
    Driven as two micro-batches via two availableNow runs over a
    growing file directory with checkpointing."""
    path = str(tmp_path / "late_json")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out_parquet")
    schema = "ts timestamp, user_id long, value double"

    def write_batch(rows):
        spark.createDataFrame(rows, "ts_s string, user_id long, value double").select(
            F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "value"
        ).coalesce(1).write.mode("append").json(path)

    def run_once():
        sdf = spark.readStream.schema(schema).json(path)
        agg = tumbling(
            with_watermark(sdf, "ts"),
            "ts",
            "1 hour",
            [],
            F.count(F.lit(1)).alias("n"),
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # Batch 1 advances the watermark to 03:00.
    write_batch([("2024-01-01 03:00:00", 1, 1.0)])
    run_once()
    # Batch 2: one in-order row and one 3-hours-late row (00:10 < wm).
    write_batch([("2024-01-01 03:30:00", 1, 1.0), ("2024-01-01 00:10:00", 9, 9.0)])
    run_once()
    # Batch 3: advance watermark far so the 03:00 window finalizes.
    write_batch([("2024-01-01 06:00:00", 1, 1.0)])
    run_once()

    got = {r.w_start: r.n for r in spark.read.parquet(out).collect()}
    h3 = 1704078000  # 03:00 UTC
    # The 03:00 window must contain ONLY the two on-time rows; the late
    # 00:10 row must not have produced a 00:00 window.
    assert got.get(h3) == 2
    assert 1704067200 not in got, "late row leaked past the watermark"


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """RemoveDuplicates on an unbounded stream: a re-delivered row
    (same key, within the watermark window) must be dropped across
    checkpointed runs, and state is watermark-bounded (the production
    posture for at-least-once sources)."""
    from cloud_dataflow_batch_processing_spark.streaming.dedup import (
        remove_duplicates_stream,
    )

    src = str(tmp_path / "dedup_src")
    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")

    def write_batch(rows, n):
        spark.createDataFrame(rows, "ts_s string, ev_id long").select(
            F.col("ts_s").cast("timestamp").alias("ts"), "ev_id"
        ).coalesce(1).write.mode("append").json(src)

    def run_once():
        sdf = spark.readStream.schema("ts timestamp, ev_id long").json(src)
        deduped = remove_duplicates_stream(sdf, ["ev_id"], ts_col="ts", delay="2 hours")
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    write_batch([("2024-01-01 00:10:00", 1), ("2024-01-01 00:20:00", 2)], 1)
    run_once()
    # Batch 2: ev_id=1 re-delivered (same key, inside the 2h window) +
    # one genuinely new event.
    write_batch([("2024-01-01 00:10:00", 1), ("2024-01-01 00:40:00", 3)], 2)
    run_once()

    got = sorted(r.ev_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3], got


@pytest.mark.slowsweep
def test_stream_stream_windowed_join_inner(spark, tmp_path):
    """Stream-stream inner join per (user, 1h window) — Beam's windowed
    CoGroupByKey over two unbounded inputs. Both sides are file streams;
    rows join only when key AND window agree."""
    from cloud_dataflow_batch_processing_spark.streaming.joins import (
        windowed_stream_join,
    )

    schema = "ts timestamp, user_id long, value double"

    def write(path, rows):
        spark.createDataFrame(rows, "ts_s string, user_id long, value double").select(
            F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "value"
        ).coalesce(1).write.mode("append").json(path)

    lpath, rpath = str(tmp_path / "imp"), str(tmp_path / "clk")
    write(
        lpath,
        [
            ("2024-01-01 00:10:00", 1, 10.0),  # joins: user 1, hour 0
            ("2024-01-01 00:20:00", 2, 20.0),  # no click for user 2
            ("2024-01-01 01:10:00", 1, 30.0),  # user 1 but hour 1: no click there
        ],
    )
    write(
        rpath,
        [
            ("2024-01-01 00:40:00", 1, 0.5),  # same user+window as the 00:10 row
            ("2024-01-01 02:05:00", 3, 0.7),  # key with no impression
        ],
    )
    left = spark.readStream.schema(schema).json(lpath)
    right = spark.readStream.schema(schema).json(rpath)
    joined = windowed_stream_join(left, right, ["user_id"], "ts", "1 hour")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_inner")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM ssj_inner").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.user_id, r.value, r.value_r) == (1, 10.0, 0.5)
    assert r.w_end - r.w_start == 3600


@pytest.mark.slowsweep
def test_stream_stream_windowed_join_left_outer_flush(spark, tmp_path):
    """Left-outer stream-stream join: unmatched left rows emit their
    null-padded result only after the watermark passes the window end —
    driven as checkpointed availableNow runs with a sentinel batch that
    advances the watermark (the same discipline as the late-row test)."""
    from cloud_dataflow_batch_processing_spark.streaming.joins import (
        windowed_stream_join,
    )

    schema = "ts timestamp, user_id long, value double"

    def write(path, rows):
        spark.createDataFrame(rows, "ts_s string, user_id long, value double").select(
            F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "value"
        ).coalesce(1).write.mode("append").json(path)

    lpath, rpath = str(tmp_path / "impL"), str(tmp_path / "clkL")
    out, ckpt = str(tmp_path / "outL"), str(tmp_path / "ckL")

    def run_once():
        left = spark.readStream.schema(schema).json(lpath)
        right = spark.readStream.schema(schema).json(rpath)
        joined = windowed_stream_join(
            left, right, ["user_id"], "ts", "1 hour", how="left_outer"
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write(lpath, [("2024-01-01 00:10:00", 1, 10.0), ("2024-01-01 00:20:00", 2, 20.0)])
    write(rpath, [("2024-01-01 00:40:00", 1, 0.5)])
    run_once()
    # Sentinel on BOTH streams pushes the watermark past 01:00 so the
    # unmatched user-2 row can flush as (20.0, null).
    write(lpath, [("2024-01-01 05:00:00", 99, 0.0)])
    write(rpath, [("2024-01-01 05:00:00", 98, 0.0)])
    run_once()
    run_once()  # one more cycle: outer results flush a batch behind

    got = {(r.user_id, r.value): r.value_r for r in spark.read.parquet(out).collect()}
    assert got[(1, 10.0)] == 0.5
    assert (2, 20.0) in got and got[(2, 20.0)] is None


def test_streaming_near_dup_suppression(spark, tmp_path):
    """suppress_near_exact_stream: exact re-sends and re-whitespaced
    copies (identical 16-lane signature) are suppressed within the
    watermark; a genuine near-dup (one token changed → ≥1 lane moves)
    passes through for the batch pipeline to score; short docs fall
    back to exact-text suppression (no cross-doc collapse). Streaming
    result must equal the batch model on the same data."""
    from cloud_dataflow_batch_processing_spark.streaming.neardup import (
        suppress_near_exact_stream,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        ("2024-01-01 00:01:00", 1, base),
        ("2024-01-01 00:02:00", 2, base),                     # exact re-send → suppressed
        ("2024-01-01 00:03:00", 3, "  " + base + "  "),       # re-whitespaced → suppressed
        ("2024-01-01 00:04:00", 4, base.replace("dog", "cat")),  # near-dup → kept
        ("2024-01-01 00:05:00", 5, "tiny doc"),               # short: kept
        ("2024-01-01 00:06:00", 6, "tiny doc"),               # short exact dup → suppressed
        ("2024-01-01 00:07:00", 7, "other tiny"),             # short distinct → kept
    ]
    batch = spark.createDataFrame(rows, "ts_s string, doc_id long, text string").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "doc_id", "text"
    )
    path = str(tmp_path / "docs_json")
    batch.coalesce(1).write.mode("overwrite").json(path)
    sdf = spark.readStream.schema("ts timestamp, doc_id long, text string").json(path)

    out = suppress_near_exact_stream(sdf, "text", "ts", delay="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("t_neardup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = sorted(r["doc_id"] for r in spark.sql("SELECT doc_id FROM t_neardup").collect())
    assert kept == [1, 4, 5, 7]

    # Batch twin gives the same verdicts (modulo which dup wins: with
    # one input file the stream preserves order, and batch
    # dropDuplicates keeps an arbitrary row — compare suppressed COUNT
    # per signature class via distinct texts kept).
    batch_kept = suppress_near_exact_stream(batch, "text", "ts")
    assert batch_kept.count() == 4


def test_stream_static_enrich(spark, stream_events, tmp_path):
    """Streaming facts enriched against a static broadcast dimension:
    matched rows carry dim attributes, unmatched survive with NULLs,
    and the aggregate over the enriched stream is correct."""
    from cloud_dataflow_batch_processing_spark.streaming.joins import (
        stream_static_enrich,
    )

    dim = spark.createDataFrame(
        [(1, "gold"), (3, "bronze")], "user_id long, tier string"
    )
    enriched = stream_static_enrich(stream_events, dim, ["user_id"])
    q = (
        enriched.writeStream.format("memory")
        .queryName("sse")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT user_id, value, tier_d FROM sse").collect()
    assert len(rows) == 5  # left join: every fact survives
    got = {(r.user_id, r.value): r.tier_d for r in rows}
    assert got[(1, 10.0)] == "gold" and got[(1, 5.0)] == "gold"
    assert got[(2, 1.0)] is None  # no dim row -> NULL, not dropped


def test_streaming_hll_register_table(spark, stream_events):
    """The mergeable HLL sketch under Structured Streaming: the
    register table (reg -> max rho) maintained incrementally per
    micro-batch in complete mode. Because merge is register-wise max,
    the streamed table — and therefore the estimate — is EXACTLY the
    batch sketch of the same rows (sketch-streaming composition with
    no new operator code)."""
    from pyspark.sql import functions as F

    from cloud_dataflow_batch_processing_spark.extensions import sketch as S

    regs = (
        stream_events.select(
            F.expr(S.hll_reg_sql("user_id")).alias("reg"),
            F.expr(S.hll_rho_sql("user_id")).alias("rho"),
        )
        .groupBy("reg")
        .agg(F.max("rho").alias("maxrho"))
    )
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    streamed = spark.sql("SELECT * FROM hll_regs")
    est_stream = S.hll_estimate(streamed).collect()[0]["est"]
    batch = spark.createDataFrame(
        [(1,), (1,), (2,), (1,), (2,)], "user_id long"
    )
    est_batch = S.hll_estimate(S.hll_register_table(batch, "user_id")).collect()[0]["est"]
    assert est_stream == est_batch  # exact, not approximate


def test_streaming_countmin_counter_table(spark, stream_events):
    """The Count-Min sketch under Structured Streaming: the counter
    table maintained per micro-batch in complete mode. CMS is linear
    (counter-wise sums), so the streamed table equals the batch sketch
    of the same rows EXACTLY — the second sketch-streaming composition
    (with HLL's register-max) requiring no new operator code."""
    from pyspark.sql import functions as F

    from cloud_dataflow_batch_processing_spark.extensions import sketch as S
    from cloud_dataflow_batch_processing_spark.functions.text import HASH_MOD as P

    depth, width = 3, 32
    v = (F.col("user_id").cast("long") % P + P) % P
    rows = stream_events.filter(F.col("user_id").isNotNull()).select(
        F.posexplode(
            F.array(*[S._cms_bucket(v, i, width) for i in range(depth)])
        ).alias("row_i", "bucket")
    )
    counters = rows.groupBy("row_i", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    q = (
        counters.writeStream.format("memory")
        .queryName("cms_counters")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    streamed = sorted(map(tuple, spark.sql("SELECT * FROM cms_counters").collect()))
    batch = spark.createDataFrame([(1,), (1,), (2,), (1,), (2,)], "user_id long")
    want = sorted(
        map(tuple, S.countmin_sketch(batch, F.col("user_id"), depth, width).collect())
    )
    assert streamed == want

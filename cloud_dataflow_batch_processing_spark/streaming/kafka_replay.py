"""kafka_replay — an executor-parallel, offset-faithful Kafka twin
over a directory-of-segments "broker log", via PySpark 4's Python Data
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
  ``latest`` / per-partition JSON with kafka's -2/-1 sentinels, and
  (like the connector) an explicit JSON must name EVERY partition
  present in the log for its topics.
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

Log layout (kafka's own on-disk shape — a partition is a directory of
immutable, base-offset-named segments)::

    <path>/<topic>-<partition>/<base:020d>.<count:010d>.<tag>.jsonl

Segment line k (0-based) IS offset ``base + k`` of that partition; a
line is one JSON object ``{"key": str|null, "value": str, "ts":
epoch_millis}``. ``tag`` records provenance (``m`` = manual
``append_records``; ``b<id>`` = producer batch <id>, used for
crash-remnant cleanup). Because a segment's END offset is derivable
from its NAME, microbatch planning (``latestOffset``) is a pure
directory listing — O(#segments) stats, zero file reads — which is
the production answer to per-plan line counting; and because segments
are published by atomic tmp+rename, a reader can never observe a torn
line. Range reads open only the segments overlapping [start, end).

SCALE POSTURE: the driver plans per-partition offset ranges from a
listing; executors read only overlapping segments; the producer stages
record files ON EXECUTORS and the driver publishes them by RENAME
only — no record bytes ever pass through the driver. At 100 TB the
same layout works on any Hadoop filesystem with atomic rename
(HDFS; on S3-like stores, swap the renames for the rollup store's
manifest-commit pattern).
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import shutil
import uuid
from collections.abc import Iterator, Sequence
from dataclasses import dataclass, field

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

_SEG_SUFFIX = ".jsonl"


def _parse_segment(fname: str) -> tuple[int, int, str] | None:
    """``<base>.<count>.<tag>.jsonl`` -> (base, count, tag)."""
    if not fname.endswith(_SEG_SUFFIX):
        return None
    parts = fname[: -len(_SEG_SUFFIX)].split(".")
    if len(parts) != 3 or not (parts[0].isdigit() and parts[1].isdigit()):
        return None
    return int(parts[0]), int(parts[1]), parts[2]


def _segment_name(base: int, count: int, tag: str) -> str:
    return f"{base:020d}.{count:010d}.{tag}{_SEG_SUFFIX}"


def _list_segments(part_dir: str) -> list[tuple[int, int, str]]:
    """Sorted (base, count, fname) for one topic-partition directory."""
    segs = []
    try:
        names = os.listdir(part_dir)
    except FileNotFoundError:
        return []
    for fname in names:
        parsed = _parse_segment(fname)
        if parsed is not None:
            segs.append((parsed[0], parsed[1], fname))
    segs.sort()
    return segs


def _scan_log(path: str, topics: set[str]) -> dict[str, dict[str, int]]:
    """End offsets per subscribed topic-partition: {topic: {"0": n}}.
    Pure listing — the end offset is (last segment base + count), read
    from segment NAMES, never file contents. Partition ids are STRING
    keys so the offset dict is byte-identical in shape to kafka's own
    startingOffsets/checkpoint JSON."""
    out: dict[str, dict[str, int]] = {}
    if not os.path.isdir(path):
        return out
    for dname in sorted(os.listdir(path)):
        topic, sep, part = dname.rpartition("-")
        if not sep or not part.isdigit() or topic not in topics:
            continue
        segs = _list_segments(os.path.join(path, dname))
        end = segs[-1][0] + segs[-1][1] if segs else 0
        out.setdefault(topic, {})[part] = end
    return out


def _publish_segment(part_dir: str, base: int, count: int, tag: str,
                     src_path: str) -> None:
    """Atomically move a fully-written record file into the log as the
    segment [base, base+count). Readers either see the whole segment or
    none of it — no torn lines, ever."""
    os.makedirs(part_dir, exist_ok=True)
    os.replace(src_path, os.path.join(part_dir, _segment_name(base, count, tag)))


def append_records(
    path: str,
    topic: str,
    partition: int,
    records: Sequence[tuple[str | None, str, int]],
) -> None:
    """Manual producer twin: append (key, value, ts_millis) records to
    one topic-partition as ONE new segment. Offsets continue from the
    current end (listing-derived); the segment appears atomically."""
    if not records:
        return
    part_dir = os.path.join(path, f"{topic}-{partition}")
    segs = _list_segments(part_dir)
    base = segs[-1][0] + segs[-1][1] if segs else 0
    os.makedirs(part_dir, exist_ok=True)
    tmp = os.path.join(part_dir, f"_tmp-{uuid.uuid4().hex}")
    with open(tmp, "w", encoding="utf-8") as f:
        for key, value, ts in records:
            f.write(json.dumps({"key": key, "value": value, "ts": ts}) + "\n")
    _publish_segment(part_dir, base, len(records), "m", tmp)


@dataclass
class KafkaReplayPartition(InputPartition):
    """One topic-partition offset range of one microbatch. The segment
    list is resolved at PLAN time on the driver, so executors read a
    consistent snapshot even if a producer publishes concurrently."""

    part_dir: str
    topic: str
    partition: int
    start: int
    end: int
    # (base, count, fname) for segments overlapping [start, end)
    segments: list[tuple[int, int, str]] = field(default_factory=list)


def _read_range(p: KafkaReplayPartition) -> Iterator[tuple]:
    for base, count, fname in p.segments:
        if base + count <= p.start or base >= p.end:
            continue
        with open(os.path.join(p.part_dir, fname), encoding="utf-8") as f:
            for k, line in enumerate(f):
                offset = base + k
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
                    _dt.datetime.fromtimestamp(
                        rec["ts"] / 1000.0, tz=_dt.timezone.utc
                    ),
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
                part_dir = os.path.join(path, f"{topic}-{pid}")
                segs = [
                    s
                    for s in _list_segments(part_dir)
                    if s[0] + s[1] > lo and s[0] < hi
                ]
                parts.append(
                    KafkaReplayPartition(part_dir, topic, int(pid), lo, hi, segs)
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
    # Connector fidelity: an explicit JSON must cover every partition
    # that exists for every subscribed topic ("you must specify all
    # TopicPartitions" — kafka connector's startingOffsets contract).
    # Silently starting an omitted partition — or a whole omitted
    # topic — at 0 would diverge from format("kafka"). (Partitions
    # that appear AFTER the stream starts are a different case:
    # discovery legitimately starts those at 0.)
    for topic, ps in latest.items():
        missing = set(ps) - set(out.get(topic, {}))
        if missing:
            raise ValueError(
                "startingOffsets JSON must specify all partitions of "
                f"subscribed topic {topic!r}; missing: {sorted(missing)}"
            )
    return out


def _resolve_starting_by_timestamp(
    by_ts: str, path: str, topics: set[str]
) -> dict[str, dict[str, int]]:
    """``startingOffsetsByTimestamp`` (connector semantics): for each
    named topic-partition, start at the FIRST offset whose record
    timestamp is >= the given epoch-millis; if no such record exists,
    start at latest. Record timestamps are stored per line, so this is
    a one-time scan of the named partitions' segments at stream start
    (the connector likewise asks the broker once via offsetsForTimes).
    Unnamed partitions of a topic that exists in the log are rejected,
    same contract as explicit startingOffsets."""
    latest = _scan_log(path, topics)
    explicit = json.loads(by_ts)
    out: dict[str, dict[str, int]] = {}
    for topic, ps in explicit.items():
        if topic not in topics:
            raise ValueError(
                f"startingOffsetsByTimestamp names unsubscribed topic {topic!r}"
            )
        out[topic] = {}
        for pid, ts_ms in ps.items():
            part_dir = os.path.join(path, f"{topic}-{pid}")
            found = latest.get(topic, {}).get(pid, 0)  # default: latest
            for base, count, fname in _list_segments(part_dir):
                hit = None
                with open(os.path.join(part_dir, fname), encoding="utf-8") as f:
                    for k, line in enumerate(f):
                        if json.loads(line)["ts"] >= int(ts_ms):
                            hit = base + k
                            break
                if hit is not None:
                    found = hit
                    break
            out[topic][pid] = found
    for topic, ps in latest.items():
        missing = set(ps) - set(out.get(topic, {}))
        if missing:
            raise ValueError(
                "startingOffsetsByTimestamp must specify all partitions of "
                f"subscribed topic {topic!r}; missing: {sorted(missing)}"
            )
    return out


def _resolve_start(
    starting: str, starting_by_ts: str | None, path: str, topics: set[str]
) -> dict[str, dict[str, int]]:
    if starting_by_ts is not None:
        return _resolve_starting_by_timestamp(starting_by_ts, path, topics)
    return _resolve_starting(starting, path, topics)


class KafkaReplayStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        path: str,
        topics: set[str],
        starting: str,
        starting_by_ts: str | None = None,
        max_offsets_per_trigger: int | None = None,
    ) -> None:
        self.path, self.topics, self.starting = path, topics, starting
        self.starting_by_ts = starting_by_ts
        self.max_per_trigger = max_offsets_per_trigger
        # Driver-side rate-limit state: the end of the last planned
        # microbatch. Rebuilt from the checkpoint via initialOffset /
        # the engine's start argument on restart — latestOffset caps
        # RELATIVE to it, so a restarted query resumes its pacing.
        self._last_end: dict[str, dict[str, int]] | None = None

    def initialOffset(self) -> dict:
        start = _resolve_start(self.starting, self.starting_by_ts, self.path, self.topics)
        self._last_end = start
        return start

    def latestOffset(self) -> dict:
        latest = _scan_log(self.path, self.topics)
        if self.max_per_trigger is None:
            return latest
        if self._last_end is None:
            # Checkpoint restart: the engine restores the start offset
            # itself and never calls initialOffset, so the cap has no
            # base yet — capping from offset 0 could plan an end BELOW
            # the restored start (an offset rewind). First post-restart
            # batch runs uncapped; partitions() then re-syncs the base
            # from the engine's authoritative range and pacing resumes.
            return latest
        # maxOffsetsPerTrigger (connector semantics): cap the total new
        # records this microbatch, apportioned across partitions
        # PROPORTIONALLY to their lag.
        base = self._last_end
        lags: dict[tuple[str, str], int] = {}
        for topic, ps in latest.items():
            for pid, hi in ps.items():
                lo = base.get(topic, {}).get(pid, 0)
                if hi > lo:
                    lags[(topic, pid)] = hi - lo
        total = sum(lags.values())
        if total > self.max_per_trigger:
            scale = self.max_per_trigger / total
            capped = {t: dict(ps) for t, ps in latest.items()}
            budget = self.max_per_trigger
            # floor-apportion, then hand out the remainder
            # deterministically (topic, partition) order
            take = {k: max(1, int(lag * scale)) for k, lag in lags.items()}
            while sum(take.values()) > self.max_per_trigger:
                for k in sorted(take, reverse=True):
                    if sum(take.values()) <= self.max_per_trigger:
                        break
                    if take[k] > 0:
                        take[k] -= 1
            for (topic, pid), n in take.items():
                lo = base.get(topic, {}).get(pid, 0)
                capped[topic][pid] = lo + n
            latest = capped
        self._last_end = latest
        return latest

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # The engine's planned range is authoritative (it includes the
        # checkpoint-restored start) — re-sync the rate-limit base.
        self._last_end = end
        return _plan_partitions(self.path, start, end)

    def read(self, partition: KafkaReplayPartition) -> Iterator[tuple]:
        return _read_range(partition)

    def commit(self, end: dict) -> None:
        pass  # retention: the log outlives the consumer (kafka semantics)


class KafkaReplayBatchReader(DataSourceReader):
    """Batch twin (``spark.read.format("kafka_replay")``): the
    startingOffsets..endingOffsets range (default ..latest), same
    schema, same partition plan."""

    def __init__(
        self,
        path: str,
        topics: set[str],
        starting: str,
        starting_by_ts: str | None = None,
        ending: str = "latest",
    ) -> None:
        self.path, self.topics, self.starting = path, topics, starting
        self.starting_by_ts = starting_by_ts
        self.ending = ending

    def _resolve_ending(self) -> dict[str, dict[str, int]]:
        latest = _scan_log(self.path, self.topics)
        if self.ending == "latest":
            return latest
        if self.ending == "earliest":
            raise ValueError("endingOffsets cannot be 'earliest'")  # connector contract
        explicit = json.loads(self.ending)
        out = {t: dict(ps) for t, ps in latest.items()}
        for topic, ps in explicit.items():
            if topic not in self.topics:
                raise ValueError(f"endingOffsets names unsubscribed topic {topic!r}")
            for pid, off in ps.items():
                if off == -2:
                    raise ValueError(
                        "endingOffsets does not accept the earliest sentinel (-2)"
                    )  # connector contract
                if off == -1:
                    off = latest.get(topic, {}).get(pid, 0)
                out.setdefault(topic, {})[pid] = int(off)
        return out

    def partitions(self) -> Sequence[InputPartition]:
        start = _resolve_start(self.starting, self.starting_by_ts, self.path, self.topics)
        return _plan_partitions(self.path, start, self._resolve_ending())

    def read(self, partition: KafkaReplayPartition) -> Iterator[tuple]:
        return _read_range(partition)


class KafkaReplayDataSource(DataSource):
    """``format("kafka_replay")`` — options: ``path`` (the log dir,
    required), ``subscribe`` (comma-separated topics, required),
    ``startingOffsets`` (earliest | latest | kafka-style JSON; default
    earliest), ``startingOffsetsByTimestamp`` (kafka-style JSON of
    epoch-millis; mutually exclusive with startingOffsets),
    ``endingOffsets`` (batch only: latest | JSON with -1 sentinels),
    ``maxOffsetsPerTrigger`` (stream only: records per microbatch,
    apportioned by lag)."""

    @classmethod
    def name(cls) -> str:
        return "kafka_replay"

    def schema(self) -> str:
        return KAFKA_SCHEMA

    def _conf(self) -> tuple[str, set[str], str, str | None]:
        if "path" not in self.options:
            raise ValueError("kafka_replay needs a path (the log directory)")
        if "subscribe" not in self.options:
            raise ValueError("kafka_replay needs subscribe=<topic[,topic...]>")
        topics = {t.strip() for t in self.options["subscribe"].split(",") if t.strip()}
        by_ts = self.options.get("startingoffsetsbytimestamp")
        if by_ts is not None and "startingoffsets" in self.options:
            raise ValueError(
                "specify only one of startingOffsets / startingOffsetsByTimestamp"
            )  # connector contract
        return (
            self.options["path"],
            topics,
            self.options.get("startingoffsets", "earliest"),
            by_ts,
        )

    def streamReader(self, schema) -> KafkaReplayStreamReader:
        mot = self.options.get("maxoffsetspertrigger")
        return KafkaReplayStreamReader(
            *self._conf(),
            max_offsets_per_trigger=int(mot) if mot is not None else None,
        )

    def reader(self, schema) -> KafkaReplayBatchReader:
        return KafkaReplayBatchReader(
            *self._conf(), ending=self.options.get("endingoffsets", "latest")
        )


_REGISTERED: set[int] = set()


def register(spark) -> None:
    """Idempotently register the source on a session."""
    key = id(spark)
    if key not in _REGISTERED:
        spark.dataSource.register(KafkaReplayDataSource)
        _REGISTERED.add(key)


# ---------------------------------------------------------------------------
# Producer half: executor-parallel, exactly-once foreachBatch writer
# ---------------------------------------------------------------------------


def _stage_partition(staging: str, num_partitions: int):
    """Executor-side stage function: write this task's rows into one
    record file per (log-partition, spark-task) pair under the staging
    dir. Runs via ``foreachPartition`` — record bytes never touch the
    driver. The final rename makes each staged file appear atomically,
    so a retried/speculative task attempt simply re-renames identical
    content over itself."""

    def stage(rows) -> None:
        handles: dict[int, tuple] = {}
        task_id = None
        for row in rows:
            if task_id is None:
                from pyspark import TaskContext

                ctx = TaskContext.get()
                task_id = ctx.partitionId() if ctx is not None else 0
            pid = int(row["__pid"])
            if pid not in handles:
                tmp = os.path.join(
                    staging, f"_tmp-{uuid.uuid4().hex}"
                )
                handles[pid] = (tmp, open(tmp, "w", encoding="utf-8"), [0])
            tmp, fh, counter = handles[pid]
            fh.write(
                json.dumps(
                    {"key": row["__key"], "value": row["__value"], "ts": row["__ts"]}
                )
                + "\n"
            )
            counter[0] += 1
        for pid, (tmp, fh, counter) in handles.items():
            fh.close()
            final = os.path.join(staging, f"{pid:05d}.{task_id:05d}.{counter[0]:010d}")
            os.replace(tmp, final)

    return stage


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

    Exactly-once where kafka's plain producer is only at-least-once,
    via a two-phase, rename-only commit:

    1. **Stage (executors):** rows are routed to log partitions inside
       the Spark plan (``crc32(key) % num_partitions``, JVM codegen;
       NULL keys spread by ``monotonically_increasing_id``) and each
       task writes one record file per log partition under
       ``_staging/<batch_id>/`` — no ``collect()``, no driver funnel.
    2. **Publish (driver, metadata-only):** staged files are renamed
       into the partition directories as base-offset-named segments
       tagged ``b<batch_id>`` (deterministic order: log partition,
       then task id), then ``_producer_meta.json`` commits the batch
       id tmp+rename.

    Crash safety: a replayed microbatch whose batch_id is already in
    the meta is skipped (no double-append); a crash BETWEEN publish
    renames and the meta commit leaves segments tagged with this
    batch_id, which the replay deletes before re-publishing — the
    re-published segments land on the same base offsets with the same
    contents, so even a consumer that read the orphans re-reads
    identical data. Torn lines are impossible: a segment is visible
    only after its atomic rename.
    """
    from pyspark.sql import functions as F

    meta_path = os.path.join(path, "_producer_meta.json")

    def write_batch(batch_df, batch_id: int) -> None:
        last = -1
        if os.path.exists(meta_path):
            with open(meta_path, encoding="utf-8") as f:
                last = json.load(f)["last_batch"]
        if batch_id <= last:
            return  # replayed microbatch: already committed

        tag = f"b{batch_id}"
        # Crash remnants: segments published by a previous attempt of
        # THIS batch (crash before the meta commit) are deleted so the
        # re-publish below reproduces them at identical offsets.
        if os.path.isdir(path):
            for dname in os.listdir(path):
                if not dname.startswith(f"{topic}-"):
                    continue
                part_dir = os.path.join(path, dname)
                for base, count, fname in _list_segments(part_dir):
                    if _parse_segment(fname)[2] == tag:
                        os.remove(os.path.join(part_dir, fname))

        staging = os.path.join(path, "_staging", str(batch_id))
        shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(staging, exist_ok=True)

        # Routing + coercion inside the plan (JVM codegen, executor-side).
        # Keys/values always serialize as str|None — matching
        # append_records' contract regardless of the input column types.
        key = (
            F.col(key_col).cast("string")
            if key_col
            else F.lit(None).cast("string")
        )
        ts = (
            F.coalesce(
                F.unix_millis(F.col(ts_col).cast("timestamp")), F.lit(0)
            )
            if ts_col
            else F.lit(0)
        )
        routed = batch_df.select(
            key.alias("__key"),
            F.col(value_col).cast("string").alias("__value"),
            ts.cast("long").alias("__ts"),
        ).withColumn(
            "__pid",
            F.when(
                F.col("__key").isNotNull(),
                F.crc32(F.col("__key").cast("binary")) % num_partitions,
            ).otherwise(
                F.pmod(F.monotonically_increasing_id(), F.lit(num_partitions))
            ).cast("int"),
        )
        routed.foreachPartition(_stage_partition(staging, num_partitions))

        # Publish: rename staged files into the log in deterministic
        # (pid, task) order so offsets are reproducible across replays.
        staged = sorted(
            f for f in os.listdir(staging) if not f.startswith("_tmp-")
        )
        next_base: dict[int, int] = {}
        for fname in staged:
            pid_s, _task_s, count_s = fname.split(".")
            pid, count = int(pid_s), int(count_s)
            part_dir = os.path.join(path, f"{topic}-{pid}")
            if pid not in next_base:
                segs = _list_segments(part_dir)
                next_base[pid] = segs[-1][0] + segs[-1][1] if segs else 0
            _publish_segment(
                part_dir, next_base[pid], count, tag, os.path.join(staging, fname)
            )
            next_base[pid] += count

        tmp = meta_path + ".tmp"
        os.makedirs(path, exist_ok=True)
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"last_batch": batch_id}, f)
        os.replace(tmp, meta_path)
        shutil.rmtree(staging, ignore_errors=True)

    return write_batch

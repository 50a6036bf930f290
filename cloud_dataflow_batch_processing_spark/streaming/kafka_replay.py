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
  present in the log for its topics. ``earliest`` / -2 resolve to the
  LOG-START offset (the first retained segment's base), not 0 —
  kafka's beginningOffsets semantics once retention has expired a
  prefix of the log.
- **Partition-parallel microbatches** — ``partitions(start, end)``
  returns one ``InputPartition`` per topic-partition offset range and
  ``read()`` runs on executors, exactly how the kafka connector plans
  (the log directory must be executor-visible: any filesystem
  ``pyarrow.fs`` can resolve — local, ``file://``, ``s3://``,
  ``hdfs://``, ``gs://``).
- **Replay / exactly-once resume** — a restarted checkpointed query
  re-reads only from its committed offsets; ``commit`` retains the
  log (kafka retention semantics), so committed ranges are re-servable
  for batch retries.
- **Partition discovery** — ``latestOffset`` rescans the directory,
  so topic-partitions created after the query starts are picked up
  with start offset = their log start, mirroring the connector's
  partition discovery.
- **Bounded retention** — ``expire_segments`` deletes whole fully-
  consumed / aged-out segments from the FRONT of each partition
  (kafka's log-retention shape: the active segment never goes;
  offsets stay monotonic; ``earliest`` moves forward to the first
  retained segment).

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
only — no record bytes ever pass through the driver. ALL segment and
meta I/O goes through ``pyarrow.fs`` resolved from the log path's URI
scheme (``_fs_for``), never naked POSIX calls — so the same code runs
against ``file://``, HDFS, or S3-class stores on a 1000-executor
cluster (pyarrow is import-safe inside Python data-source workers and
``foreachPartition`` tasks, where the JVM Hadoop-FS gateway is not).
Publish renames are atomic on POSIX/HDFS; on object stores ``move``
is copy+delete of a never-pre-existing destination, so readers still
see whole segments or nothing. The value tombstone gap is LOUD: a
NULL value raises at stage time (mirroring write_tfrecord's refusal)
rather than corrupting consumers later.
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import posixpath
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


# ---------------------------------------------------------------------------
# Filesystem layer: every byte of log I/O goes through pyarrow.fs so the
# log can live on any URI scheme pyarrow resolves. Executor-safe (no JVM
# gateway needed), which is why this is pyarrow.fs and not the py4j
# Hadoop FileSystem the rollup sink uses driver-side.
# ---------------------------------------------------------------------------


def _fs_for(path: str):
    """(pyarrow FileSystem, in-filesystem path) for a possibly-URI log
    path. Bare paths are local; ``scheme://`` resolves by scheme."""
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _ls_names(path: str) -> list[str]:
    """Child base-names of a directory ([] if it does not exist)."""
    from pyarrow import fs as pafs

    f, p = _fs_for(path)
    infos = f.get_file_info(pafs.FileSelector(p, allow_not_found=True))
    return [i.base_name for i in infos]


def _open_text(path: str) -> io.TextIOWrapper:
    f, p = _fs_for(path)
    return io.TextIOWrapper(f.open_input_stream(p), encoding="utf-8")


def _create_text(path: str) -> io.TextIOWrapper:
    f, p = _fs_for(path)
    return io.TextIOWrapper(f.open_output_stream(p), encoding="utf-8")


def _rename(src: str, dst: str) -> None:
    f, s = _fs_for(src)
    _, d = _fs_for(dst)
    f.move(s, d)


def _mkdirs(path: str) -> None:
    f, p = _fs_for(path)
    f.create_dir(p, recursive=True)


def _delete_file(path: str) -> None:
    f, p = _fs_for(path)
    f.delete_file(p)


def _delete_dir(path: str) -> None:
    f, p = _fs_for(path)
    try:
        f.delete_dir(p)
    except FileNotFoundError:
        pass


def _exists(path: str) -> bool:
    from pyarrow import fs as pafs

    f, p = _fs_for(path)
    return f.get_file_info(p).type != pafs.FileType.NotFound


# ---------------------------------------------------------------------------
# Segment / log model
# ---------------------------------------------------------------------------


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
    for fname in _ls_names(part_dir):
        parsed = _parse_segment(fname)
        if parsed is not None:
            segs.append((parsed[0], parsed[1], fname))
    segs.sort()
    return segs


def _parse_partition_dir(dname: str) -> tuple[str, str] | None:
    """``<topic>-<partition>`` -> (topic, partition) or None. The ONLY
    way partition directories are matched anywhere in this module —
    prefix tests like ``startswith(f"{topic}-")`` collide across topics
    sharing the log dir (topic 'out' would match 'out-of-band-0')."""
    topic, sep, part = dname.rpartition("-")
    if not sep or not part.isdigit() or not topic:
        return None
    return topic, part


def _partition_dirs(path: str, topics: set[str]) -> list[tuple[str, str, str]]:
    """Sorted (dirname, topic, partition) under ``path`` whose topic is
    subscribed — exact topic equality, digit partition suffix."""
    out = []
    for dname in sorted(_ls_names(path)):
        parsed = _parse_partition_dir(dname)
        if parsed is not None and parsed[0] in topics:
            out.append((dname, parsed[0], parsed[1]))
    return out


def _scan_log(path: str, topics: set[str]) -> dict[str, dict[str, int]]:
    """End offsets per subscribed topic-partition: {topic: {"0": n}}.
    Pure listing — the end offset is (last segment base + count), read
    from segment NAMES, never file contents. Partition ids are STRING
    keys so the offset dict is byte-identical in shape to kafka's own
    startingOffsets/checkpoint JSON."""
    out: dict[str, dict[str, int]] = {}
    for dname, topic, part in _partition_dirs(path, topics):
        segs = _list_segments(posixpath.join(path, dname))
        end = segs[-1][0] + segs[-1][1] if segs else 0
        out.setdefault(topic, {})[part] = end
    return out


def _log_starts(path: str, topics: set[str]) -> dict[str, dict[str, int]]:
    """LOG-START offsets (first retained segment's base) — kafka's
    beginningOffsets. 0 until retention expires a prefix; monotone
    non-decreasing afterwards. Listing-only, like ``_scan_log``."""
    out: dict[str, dict[str, int]] = {}
    for dname, topic, part in _partition_dirs(path, topics):
        segs = _list_segments(posixpath.join(path, dname))
        out.setdefault(topic, {})[part] = segs[0][0] if segs else 0
    return out


def _publish_segment(part_dir: str, base: int, count: int, tag: str,
                     src_path: str) -> None:
    """Atomically move a fully-written record file into the log as the
    segment [base, base+count). Readers either see the whole segment or
    none of it — no torn lines, ever."""
    _mkdirs(part_dir)
    _rename(src_path, posixpath.join(part_dir, _segment_name(base, count, tag)))


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
    part_dir = posixpath.join(path, f"{topic}-{partition}")
    segs = _list_segments(part_dir)
    base = segs[-1][0] + segs[-1][1] if segs else 0
    _mkdirs(part_dir)
    tmp = posixpath.join(part_dir, f"_tmp-{uuid.uuid4().hex}")
    with _create_text(tmp) as f:
        for key, value, ts in records:
            if value is None:
                raise ValueError(
                    "kafka_replay: NULL value is not representable in the "
                    "str-value log contract (kafka tombstones unsupported); "
                    f"refusing record with key={key!r} on {topic}-{partition}"
                )
            f.write(json.dumps({"key": key, "value": value, "ts": ts}) + "\n")
    _publish_segment(part_dir, base, len(records), "m", tmp)


def expire_segments(
    path: str,
    topics: set[str] | Sequence[str],
    *,
    retention_ms: int | None = None,
    now_ms: int | None = None,
    committed: dict[str, dict[str, int]] | None = None,
) -> list[str]:
    """Kafka-style bounded retention: delete whole segments from the
    FRONT of each subscribed topic-partition, never the last (active)
    segment, so offsets stay monotonic and the remaining log is a
    contiguous suffix. ``earliest`` afterwards resolves to the first
    retained segment's base (``_log_starts``).

    A leading segment is expirable when BOTH bounds that were given
    hold (at least one must be):

    - ``retention_ms``: the segment's newest record timestamp is older
      than ``now_ms - retention_ms`` (kafka ``retention.ms`` — needs
      one read of the segment's last line; this is a maintenance call,
      not the planning path).
    - ``committed``: the segment ends at-or-below the committed
      consumer offset ``{topic: {"0": n}}`` — the safety floor kafka
      itself lacks: data no consumer has committed past is never
      dropped.

    Returns the deleted segment paths.
    """
    if retention_ms is None and committed is None:
        raise ValueError("expire_segments needs retention_ms and/or committed")
    topics = set(topics)
    deadline = None
    if retention_ms is not None:
        if now_ms is None:
            raise ValueError("retention_ms needs now_ms (no wall clock here)")
        deadline = now_ms - retention_ms
    deleted: list[str] = []
    for dname, topic, part in _partition_dirs(path, topics):
        part_dir = posixpath.join(path, dname)
        segs = _list_segments(part_dir)
        # A partition absent from `committed` means NO consumer has
        # committed anything there yet — floor 0 (nothing expirable by
        # the committed bound), never None (which would disable the
        # safety check and drop unconsumed data).
        if committed is not None:
            floor = committed.get(topic, {}).get(part, 0)
        else:
            floor = None
        for base, count, fname in segs[:-1]:  # active segment never expires
            if floor is not None and base + count > floor:
                break  # not yet consumed past — and neither is anything later
            if deadline is not None:
                last_ts = None
                with _open_text(posixpath.join(part_dir, fname)) as f:
                    for line in f:
                        last_ts = json.loads(line)["ts"]
                if last_ts is not None and last_ts >= deadline:
                    break  # segment still inside the retention window
            seg_path = posixpath.join(part_dir, fname)
            _delete_file(seg_path)
            deleted.append(seg_path)
    return deleted


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
        with _open_text(posixpath.join(p.part_dir, fname)) as f:
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
            part_dir = posixpath.join(path, f"{topic}-{pid}")
            lo = starts.get(pid)
            segs = _list_segments(part_dir)
            if lo is None:
                # discovered mid-stream -> from its log start
                lo = segs[0][0] if segs else 0
            if hi > lo:
                overlap = [s for s in segs if s[0] + s[1] > lo and s[0] < hi]
                parts.append(
                    KafkaReplayPartition(part_dir, topic, int(pid), lo, hi, overlap)
                )
    if not parts:
        # Nothing to read this plan (start == end everywhere — e.g. a
        # timestamp seek past every record, or a microbatch with no new
        # data). The Python DataSource API substitutes a None partition
        # for an EMPTY sequence and then calls read(None) — return one
        # explicit empty range instead so read() stays total.
        parts.append(KafkaReplayPartition("", "", -1, 0, 0, []))
    return parts


def _resolve_starting(
    starting: str, path: str, topics: set[str]
) -> dict[str, dict[str, int]]:
    latest = _scan_log(path, topics)
    if starting == "earliest":
        return _log_starts(path, topics)
    if starting == "latest":
        return latest
    starts = _log_starts(path, topics)
    explicit = json.loads(starting)  # kafka's per-partition JSON form
    out: dict[str, dict[str, int]] = {}
    for topic, ps in explicit.items():
        if topic not in topics:
            raise ValueError(f"startingOffsets names unsubscribed topic {topic!r}")
        out[topic] = {}
        for pid, off in ps.items():
            if off == -2:  # kafka sentinel: earliest (log start, not 0)
                off = starts.get(topic, {}).get(pid, 0)
            elif off == -1:  # kafka sentinel: latest
                off = latest.get(topic, {}).get(pid, 0)
            out[topic][pid] = int(off)
    # Connector fidelity: an explicit JSON must cover every partition
    # that exists for every subscribed topic ("you must specify all
    # TopicPartitions" — kafka connector's startingOffsets contract).
    # Silently starting an omitted partition — or a whole omitted
    # topic — at 0 would diverge from format("kafka"). (Partitions
    # that appear AFTER the stream starts are a different case:
    # discovery legitimately starts those at their log start.)
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
            part_dir = posixpath.join(path, f"{topic}-{pid}")
            found = latest.get(topic, {}).get(pid, 0)  # default: latest
            for base, count, fname in _list_segments(part_dir):
                hit = None
                with _open_text(posixpath.join(part_dir, fname)) as f:
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
        cap = self.max_per_trigger
        if total > cap:
            # Floor-apportion by lag share with the connector's min-1
            # floor per lagging partition, then hand out the remainder
            # in deterministic (topic, partition) order, never past a
            # partition's real lag; trim floor-driven overshoot the
            # same way but never below 1 (like kafka's own proration,
            # the plan can exceed the cap only when cap < number of
            # lagging partitions).
            take = {k: max(1, lag * cap // total) for k, lag in lags.items()}
            order = sorted(take)
            assigned = sum(take.values())
            i = 0
            while assigned < cap:
                k = order[i % len(order)]
                if take[k] < lags[k]:
                    take[k] += 1
                    assigned += 1
                i += 1
            i = 0
            while assigned > cap and any(v > 1 for v in take.values()):
                k = order[i % len(order)]
                if take[k] > 1:
                    take[k] -= 1
                    assigned -= 1
                i += 1
            capped = {t: dict(ps) for t, ps in latest.items()}
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
    driver; I/O goes through pyarrow.fs, so the staging dir can live on
    the shared store next to the log. The final rename makes each
    staged file appear atomically, so a retried/speculative task
    attempt simply re-renames identical content over itself."""

    def stage(rows) -> None:
        handles: dict[int, tuple] = {}
        task_id = None
        for row in rows:
            if task_id is None:
                from pyspark import TaskContext

                ctx = TaskContext.get()
                task_id = ctx.partitionId() if ctx is not None else 0
            if row["__value"] is None:
                raise ValueError(
                    "kafka_replay producer: NULL value (kafka tombstones are "
                    "not representable in the str-value log contract) — "
                    "filter NULLs or encode them explicitly upstream; "
                    f"offending key={row['__key']!r}"
                )
            pid = int(row["__pid"])
            if pid not in handles:
                tmp = posixpath.join(staging, f"_tmp-{uuid.uuid4().hex}")
                handles[pid] = (tmp, _create_text(tmp), [0])
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
            final = posixpath.join(
                staging, f"{pid:05d}.{task_id:05d}.{counter[0]:010d}"
            )
            _rename(tmp, final)

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
       NULL values raise HERE (loud writer-side refusal, like
       write_tfrecord) instead of corrupting consumers later.
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
    identical data. Remnant matching parses directory names exactly
    (``_parse_partition_dir``) so a sibling topic sharing the log dir
    can never lose segments to another topic's cleanup. Torn lines are
    impossible: a segment is visible only after its atomic rename.
    """
    from pyspark.sql import functions as F

    meta_path = posixpath.join(path, "_producer_meta.json")

    def write_batch(batch_df, batch_id: int) -> None:
        last = -1
        if _exists(meta_path):
            with _open_text(meta_path) as f:
                last = json.load(f)["last_batch"]
        if batch_id <= last:
            return  # replayed microbatch: already committed

        tag = f"b{batch_id}"
        # Crash remnants: segments published by a previous attempt of
        # THIS batch (crash before the meta commit) are deleted so the
        # re-publish below reproduces them at identical offsets.
        for dname, _topic, _part in _partition_dirs(path, {topic}):
            part_dir = posixpath.join(path, dname)
            for base, count, fname in _list_segments(part_dir):
                if _parse_segment(fname)[2] == tag:
                    _delete_file(posixpath.join(part_dir, fname))

        staging = posixpath.join(path, "_staging", str(batch_id))
        _delete_dir(staging)
        _mkdirs(staging)

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
        staged = sorted(f for f in _ls_names(staging) if not f.startswith("_tmp-"))
        next_base: dict[int, int] = {}
        for fname in staged:
            pid_s, _task_s, count_s = fname.split(".")
            pid, count = int(pid_s), int(count_s)
            part_dir = posixpath.join(path, f"{topic}-{pid}")
            if pid not in next_base:
                segs = _list_segments(part_dir)
                next_base[pid] = segs[-1][0] + segs[-1][1] if segs else 0
            _publish_segment(
                part_dir, next_base[pid], count, tag, posixpath.join(staging, fname)
            )
            next_base[pid] += count

        tmp = meta_path + ".tmp"
        _mkdirs(path)
        with _create_text(tmp) as f:
            f.write(json.dumps({"last_batch": batch_id}))
        _rename(tmp, meta_path)
        _delete_dir(staging)

    return write_batch

"""Replayable socket source — a PubSub/Kafka-shaped stream with REAL
offset semantics, via PySpark 4's Python Data Source API.

Why this exists: Spark's built-in ``socket`` source has no durable
offsets — restarting a checkpointed query dies with ``Offsets committed
out of order: N followed by -1`` — and its read thread never reconnects
after an EOF. That makes it unusable for the reference's unbounded-
source contract (beam/io/gcp/pubsub.py:106-180): subscribe, consume,
ack, resume after failure. The kafka format has the right semantics but
needs a jar this container doesn't ship.

This source closes the gap with the semantics Beam's PubSub actually
promises — at-least-once delivery from a *replayable* broker:

- offset = count of lines consumed from the logical stream (dict
  ``{"n": int}``, checkpoint-JSON-serializable);
- on EOF/connection loss it reconnects with backoff and expects the
  server to replay the transcript from line 0 (the test server does;
  a real broker replays from the subscription cursor) — already-seen
  lines are skipped by position, new lines append;
- a restarted query resumes from its committed offset: ``read(start)``
  serves ``buf[start:]``, so the replayed prefix is never re-delivered
  downstream — exactly the ack/resume contract;
- ``readBetweenOffsets`` re-serves committed ranges for batch retries.

SCALE POSTURE: a ``SimpleDataSourceStreamReader`` is driver-side by
design (Spark prefetches on the driver and ships rows to executors) —
right for contract parity and control-plane streams, NOT for a 100 TB
firehose; that path is the jar-gated kafka branch of
``streaming/sources.py::read_stream`` (partitioned, executor-side).
"""

from __future__ import annotations

import socket
import time
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class ReplayableSocketReader(SimpleDataSourceStreamReader):
    """Driver-side reader: keeps every line seen this process in
    ``buf`` (index == stream offset), polls the socket non-blocking,
    reconnects on EOF. Correct even if Spark rebuilds the reader
    per batch: the replayable server refills ``buf`` identically, and
    offsets index into the logical transcript, not the connection."""

    def __init__(self, host: str, port: int) -> None:
        self.host, self.port = host, port
        self.buf: list[str] = []
        self._sock: socket.socket | None = None
        self._residual = b""
        self._conn_seen = 0  # lines consumed on the CURRENT connection

    def initialOffset(self) -> dict:
        return {"n": 0}

    def _connect(self) -> None:
        self._sock = socket.create_connection((self.host, self.port), timeout=5)
        self._sock.settimeout(0.05)
        self._residual = b""
        self._conn_seen = 0  # server replays from line 0

    def _drop(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
        self._sock = None

    def _poll(self, budget: float = 0.3) -> None:
        """Drain whatever the server has, for at most ``budget`` secs."""
        deadline = time.monotonic() + budget
        while time.monotonic() < deadline:
            if self._sock is None:
                try:
                    self._connect()
                except OSError:
                    time.sleep(0.1)
                    continue
            try:
                chunk = self._sock.recv(65536)
            except TimeoutError:
                return  # drained; nothing pending
            except OSError:
                self._drop()
                continue
            if not chunk:  # EOF — broker dropped us; reconnect + replay
                self._drop()
                continue
            self._residual += chunk
            *lines, self._residual = self._residual.split(b"\n")
            for raw in lines:
                self._conn_seen += 1
                if self._conn_seen > len(self.buf):  # new, not replayed
                    self.buf.append(raw.decode("utf-8", errors="replace"))

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        self._poll()
        n = start["n"]
        rows = [(v,) for v in self.buf[n:]]
        return iter(rows), {"n": n + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter((v,) for v in self.buf[start["n"] : end["n"]])

    def commit(self, end: dict) -> None:
        # Lines stay buffered: a replayable broker keeps the transcript;
        # trimming would break readBetweenOffsets retries after reader
        # rebuilds. Bounded by the logical stream size at test scale.
        pass


class ReplayableSocketDataSource(DataSource):
    """``spark.readStream.format("replayable_socket")`` — options
    ``host`` (default 127.0.0.1) and ``port`` (required)."""

    @classmethod
    def name(cls) -> str:
        return "replayable_socket"

    def schema(self) -> str:
        return "value string"

    def simpleStreamReader(self, schema) -> ReplayableSocketReader:
        return ReplayableSocketReader(
            self.options.get("host", "127.0.0.1"), int(self.options["port"])
        )


_REGISTERED: set[int] = set()


def register(spark) -> None:
    """Idempotently register the source on a session."""
    key = id(spark)
    if key not in _REGISTERED:
        spark.dataSource.register(ReplayableSocketDataSource)
        _REGISTERED.add(key)

"""Keyed state on the Spark 4 ``transformWithStateInPandas`` API —
the successor to ``applyInPandasWithState`` (streaming/state.py keeps
the classic path; both express Beam's stateful-DoFn state+timers,
beam/runners/direct/transform_evaluator.py:676-789).

What the new API buys at scale:
- TYPED state cells (ValueState / ListState / MapState) instead of one
  struct row — each cell is an independent RocksDB column entry, so a
  key with a big list doesn't rewrite its scalar counters.
- Declarative TTL per state cell — the store evicts expired state by
  itself; no hand-rolled timeout plumbing in the processor body.
- Timers (processing/event time) registered per key.
- Requires the RocksDB state-store provider (changelog-checkpointed,
  the 100 TB posture: state lives off-heap/on-disk per task, scales
  with keys × cells, not executor heap).

``ensure_rocksdb_state_store`` flips the session conf the API needs;
call it before starting a transformWithState query (Spark refuses the
HDFS-backed provider for this operator).

Environment gate: the transformWithState state server speaks protobuf
between the JVM and the Python workers; ``google.protobuf`` is not
installed in this container, so these operators cannot EXECUTE here
(the driver-side python worker crashes on import — verified, the
tests skip on exactly that probe). Same posture as the kafka jar: the
code path is real and runs where the dependency exists; nothing here
is stubbed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def tws_available() -> bool:
    """True when transformWithState can actually execute: its JVM↔
    Python state protocol needs google.protobuf at runtime."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def ensure_rocksdb_state_store(spark: SparkSession) -> None:
    """transformWithState requires RocksDB state store; set it on the
    session (affects queries started after the call). Raises a clear
    error when the protobuf runtime dependency is missing instead of
    letting the query die with a cryptic worker crash."""
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(google.protobuf) for its state server protocol; install "
            "protobuf or use streaming/state.py (applyInPandasWithState)."
        )
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)


class RunningCountProcessor(StatefulProcessor):
    """Per-key running count in a ValueState cell — the minimal
    combining-state example, on the typed-cell API. Emits (key, total)
    every micro-batch the key appears in (update semantics)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("count", "total long")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n = sum(len(pdf) for pdf in rows)
        prev = self._count.get()
        total = (prev[0] if prev is not None else 0) + n
        self._count.update((total,))
        yield pd.DataFrame({"key": [key[0]], "total": [total]})

    def close(self) -> None:
        pass


def running_count_per_key_tws(df: DataFrame, key_col: str) -> DataFrame:
    """streaming/state.py::running_count_per_key on the new API —
    value-identical output, RocksDB-backed typed state."""
    return (
        df.select(df[key_col].alias("key"))
        .groupBy("key")
        .transformWithStateInPandas(
            RunningCountProcessor(),
            outputStructType="key long, total long",
            outputMode="Update",
            timeMode="None",
        )
    )


class DistinctPerKeyProcessor(StatefulProcessor):
    """Streaming distinct-count per key using a MapState cell as the
    seen-set: each distinct value is ONE RocksDB entry, so arrival of
    a new value never rewrites the whole set (the ListState/struct-row
    equivalent rewrites everything — the reason MapState exists)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getMapState("seen", "v long", "one int")
        self._n = handle.getValueState("n", "n long")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        prev = self._n.get()
        n = prev[0] if prev is not None else 0
        for pdf in rows:
            for v in pdf["v"]:
                k = (int(v),)
                if not self._seen.containsKey(k):
                    self._seen.updateValue(k, (1,))
                    n += 1
        self._n.update((n,))
        yield pd.DataFrame({"key": [key[0]], "n_distinct": [n]})

    def close(self) -> None:
        pass


def distinct_count_per_key_tws(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Exact streaming distinct-count per key (MapState seen-set).
    State is keys × distinct values — for approximate-at-scale use the
    mergeable HLL sketch (extensions/sketch.py) instead; this is the
    exact small-domain tool."""
    return (
        df.select(df[key_col].alias("key"), df[value_col].alias("v"))
        .groupBy("key")
        .transformWithStateInPandas(
            DistinctPerKeyProcessor(),
            outputStructType="key long, n_distinct long",
            outputMode="Update",
            timeMode="None",
        )
    )

"""Streaming → incremental rollup: fold each micro-batch into a
persisted partial-aggregate store (extensions/rollup.py lifted to
Structured Streaming via foreachBatch).

This is the streaming half of the materialized-rollup story: batch
pipelines merge daily partials; a stream merges per micro-batch. The
store IS the rollup_partial accumulator table (decimal-exact sums, so
merge order can never perturb totals), which keeps the two ingestion
modes interchangeable — a backfill job and the live stream write the
same cells.

Durability / delivery contract (the part foreachBatch makes YOU own):
- The store is versioned: ``v=<batch_id>/`` parquet plus a ``_meta``
  JSON naming the latest committed version and its predecessor. The
  meta write is the commit point — a crash between the version write
  and the meta write leaves the old version live.
- At-least-once redelivery (task retry, restart from checkpoint) is
  idempotent: a batch_id the meta already names as latest committed is
  a NO-OP (its version is complete by the commit-point invariant, and
  skipping means the live version directory is never rewritten in
  place); a batch_id whose version write crashed before the meta
  commit recomputes from the predecessor the meta still names —
  deterministic, double-merge impossible.
- Versions older than (latest, prev) are pruned — the store holds at
  most two snapshots.
- The store is bound to ONE checkpoint lineage: batch_ids must be
  monotonic, which Spark guarantees per checkpointLocation. Restarting
  the stream with a FRESH checkpoint restarts batch_ids at 0 and would
  fold batch 0 on top of the existing store — point a new checkpoint
  at a new store (or a store seeded from a batch backfill via the
  directly-invokable sink).

Scale posture (100 TB): each micro-batch shuffles ONLY its own rows
into (groups × shards) accumulator cells; the merge input is the
cell table (orders of magnitude below raw data), one hash-agg, no raw
rescan ever. The read-merge-write of the cell table is the standard
compaction trade — at very high group cardinality you'd partition the
store by a group-key prefix and merge only touched partitions (same
posture as the span-hash store in extensions/substring.py).
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from cloud_dataflow_batch_processing_spark.extensions.rollup import (
    rollup_finalize,
    rollup_merge,
    rollup_partial,
)

_META = "_meta"


def _read_meta(store_dir: str) -> dict | None:
    p = os.path.join(store_dir, _META)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _version_path(store_dir: str, version: int) -> str:
    return os.path.join(store_dir, f"v={version}")


def incremental_rollup_sink(
    store_dir: str,
    keys: Sequence[str],
    measures: Sequence[str],
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function maintaining the partials store.

    Usage::

        q = (stream.writeStream
             .foreachBatch(incremental_rollup_sink(store, ["k"], ["v"]))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())

    The returned callable is also directly invokable with (DataFrame,
    batch_id) — that is how the redelivery tests drive it, and how a
    batch backfill can reuse the exact streaming code path."""
    if "://" in store_dir:
        # The meta/prune bookkeeping is driver-local POSIX I/O; on an
        # object store os.path.exists() is silently False every batch
        # and the store would degrade to last-batch-only totals. Refuse
        # loudly (same posture as the avro fallback's non-local guard);
        # a distributed store needs Hadoop-FS meta I/O.
        raise ValueError(
            f"incremental_rollup_sink requires a local filesystem store_dir, got {store_dir!r}"
        )
    keys = list(keys)
    measures = list(measures)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        meta = _read_meta(store_dir)
        if meta is not None and meta["latest"] == batch_id:
            # Redelivery of a COMMITTED batch: its version is complete
            # (meta is written only after the parquet write), so do
            # nothing — rewriting the live directory in place would
            # open a crash window the commit-point design forbids.
            return
        base_version = meta["latest"] if meta is not None else None

        partial = rollup_partial(batch_df, keys, measures)
        if base_version is not None:
            base = spark.read.parquet(_version_path(store_dir, base_version))
            merged = rollup_merge(base.unionByName(partial), keys, measures)
        else:
            merged = rollup_merge(partial, keys, measures)

        out = _version_path(store_dir, batch_id)
        merged.write.mode("overwrite").parquet(out)
        os.makedirs(store_dir, exist_ok=True)
        tmp = os.path.join(store_dir, _META + ".tmp")
        with open(tmp, "w") as f:
            json.dump({"latest": batch_id, "prev": base_version}, f)
        os.replace(tmp, os.path.join(store_dir, _META))  # commit point

        keep = {f"v={batch_id}"} | (
            {f"v={base_version}"} if base_version is not None else set()
        )
        for entry in os.listdir(store_dir):
            if entry.startswith("v=") and entry not in keep:
                shutil.rmtree(os.path.join(store_dir, entry), ignore_errors=True)

    return sink


def read_rollup(
    spark: SparkSession,
    store_dir: str,
    keys: Sequence[str],
    measures: Sequence[str],
) -> DataFrame:
    """Finalized view of the committed store (sum/count/min/max/mean
    per key) — what a dashboard or downstream join reads. Raises if
    nothing has committed yet.

    Concurrency caveat: the returned frame is LAZY and pinned to the
    version committed at call time; the pruner keeps only (latest,
    prev), so against a LIVE stream the frame must be acted on within
    one further commit (collect/write promptly, or pause the stream
    for long analysis). A snapshot-isolated reader would need the
    pruner disabled or a retention count knob."""
    meta = _read_meta(store_dir)
    if meta is None:
        raise FileNotFoundError(f"no committed rollup in {store_dir}")
    cells = spark.read.parquet(_version_path(store_dir, meta["latest"]))
    return rollup_finalize(
        rollup_merge(cells, list(keys), list(measures)), list(keys), list(measures)
    )

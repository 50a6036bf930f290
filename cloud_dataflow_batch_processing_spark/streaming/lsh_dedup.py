"""Streaming MinHash-LSH near-dup FILTER against a durable signature
store — the ingestion-edge twin of the batch incremental pipeline
(``extensions/dedup.py::incremental_near_dups``).

``streaming/neardup.py`` suppresses NEAR-EXACT duplicates (16-lane
signature equality) with in-query state; this operator applies the full
banded-LSH + Jaccard-threshold semantics (``jaccard >= threshold``,
the ``dedup_minhash_pairs`` contract) across micro-batches, which
cannot live in query state: the candidate check needs the shingle sets
of every previously seen document. The state is therefore the
SIGNATURE STORE — the same (__id, __sh, mh0..15) parquet frame the
batch incremental path persists — written once per micro-batch under
``store_dir/batch=N``.

Per micro-batch (``foreachBatch``):

1. signatures of the batch (one Arrow tokenize pass),
2. ``incremental_near_dups(store, batch)`` — probe side is ONLY the
   batch, the store contributes one scan; old x old pairs are never
   generated (the 100 TB property of the batch path, unchanged here),
3. drop verdict per pair: the batch-side document loses (a new copy of
   anything already SEEN — survivor or not — must not re-enter the
   corpus); within-batch pairs drop the greater id (the
   ``dedup_minhash_pairs`` survivor rule),
4. survivors append to ``out_dir/batch=N``; ALL batch signatures
   append to the store (store-all semantics, see 3).

Exactly-once across failures: both writes go to batch-id-keyed
partition directories with ``mode=overwrite``, and the store read
excludes partitions ``>= batch_id`` — a redelivered micro-batch
recomputes against exactly the pre-batch store version and overwrites
its own partial output (same versioned-store discipline as
``streaming/triggers.py``'s pane baseline). Store/out paths resolve
through ``pyarrow.fs`` (file://, s3://, hdfs://) like kafka_replay's
log I/O.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession, functions as F

from cloud_dataflow_batch_processing_spark.extensions.dedup import (
    incremental_near_dups,
    minhash_signatures,
)
from cloud_dataflow_batch_processing_spark.streaming.kafka_replay import _fs_for


def _store_partitions(store_dir: str, before_batch: int) -> list[str]:
    """Store partition paths ``batch=N`` with N < before_batch (the
    pre-batch store version — redelivery must not read its own partial
    write)."""
    from pyarrow import fs as pafs

    fsys, base = _fs_for(store_dir)
    info = fsys.get_file_info(base)
    if info.type != pafs.FileType.Directory:
        return []
    out = []
    for child in fsys.get_file_info(pafs.FileSelector(base)):
        name = posixpath.basename(child.path.rstrip("/"))
        if child.type == pafs.FileType.Directory and name.startswith("batch="):
            try:
                n = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if n < before_batch:
                out.append(posixpath.join(store_dir.rstrip("/"), name))
    return sorted(out)


def process_lsh_dedup_batch(
    bdf: DataFrame,
    batch_id: int,
    id_col: str,
    text_col: str,
    store_dir: str,
    out_dir: str,
    threshold: float = 0.8,
    max_bucket_size: int = 1000,
) -> None:
    """One micro-batch of the streaming LSH dedup (module-level so
    redelivery is directly testable). Idempotent per ``batch_id``."""
    spark = bdf.sparkSession
    sigs = minhash_signatures(bdf, id_col, text_col).localCheckpoint(eager=True)
    parts = _store_partitions(store_dir, before_batch=batch_id)
    if parts:
        store = spark.read.parquet(*parts)
    else:
        from cloud_dataflow_batch_processing_spark.sources.create import local_df

        store = local_df(spark, [], sigs.schema)  # empty JVM frame, no Python RDD
    pairs = incremental_near_dups(
        store, sigs, threshold=threshold, max_bucket_size=max_bucket_size
    )
    new_ids = sigs.select(F.col("__id").alias("doc_b"), F.lit(True).alias("__b_new"))
    drops = (
        pairs.join(F.broadcast(new_ids), "doc_b", "left")
        .select(
            F.when(F.col("__b_new").isNotNull(), F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("__drop_id")
        )
        .distinct()
    )
    survivors = bdf.join(
        drops, bdf[id_col] == drops["__drop_id"], "left_anti"
    )
    survivors.write.mode("overwrite").parquet(
        posixpath.join(out_dir.rstrip("/"), f"batch={batch_id}")
    )
    sigs.write.mode("overwrite").parquet(
        posixpath.join(store_dir.rstrip("/"), f"batch={batch_id}")
    )


def run_streaming_lsh_dedup(
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    max_bucket_size: int = 1000,
) -> None:
    """Drive ``stream_df`` (a streaming frame carrying ``id_col``/
    ``text_col``) through the LSH dedup filter to exhaustion
    (availableNow). Survivors land under ``out_dir/batch=N`` — read
    the whole sink with ``spark.read.parquet(out_dir)``."""

    def _process(bdf: DataFrame, batch_id: int) -> None:
        process_lsh_dedup_batch(
            bdf, batch_id, id_col, text_col, store_dir, out_dir,
            threshold=threshold, max_bucket_size=max_bucket_size,
        )

    q = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_survivors(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """The accumulated survivor sink (partition column ``batch``), or
    None when no batch has ever committed (an all-empty stream)."""
    from pyarrow import fs as pafs

    fsys, base = _fs_for(out_dir)
    info = fsys.get_file_info(base)
    if info.type != pafs.FileType.Directory:
        return None
    has_parts = any(
        child.type == pafs.FileType.Directory
        and posixpath.basename(child.path.rstrip("/")).startswith("batch=")
        for child in fsys.get_file_info(pafs.FileSelector(base))
    )
    if not has_parts:
        return None
    return spark.read.parquet(out_dir)

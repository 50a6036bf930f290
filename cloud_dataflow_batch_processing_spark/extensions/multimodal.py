"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (SURVEY.md §2.3 / BASELINE.json north-star).

Spark-side plumbing is real and tested: schemas, binaryFile ingestion,
Arrow-batched mapInPandas transforms with explicit batch-size control,
and partition sizing for large blobs. The actual media decoding is
STUBBED — the container has no image/audio libraries — behind
``decode_stub`` (deterministic fake features derived from the bytes) so
the distributed plumbing is exercised end-to-end; swap ``_decode_impl``
for a real decoder (PIL/torchaudio/ffmpeg) in production.

Scale posture:
- Blobs never pass through Python row-at-a-time; mapInPandas streams
  Arrow batches, and ``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds per-batch memory for fat rows (set it small for video).
- Feature extraction is 1→1 per blob and embarrassingly parallel —
  repartition by size before heavy decode so stragglers don't pin a
  task (``balance_by_size``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FEATURE_DIM = 8


def _decode_impl(kind: str, content: bytes) -> list[float]:
    """STUB decoder. Production: replace with PIL.Image.open /
    soundfile / ffmpeg frame sampling. The fake feature is a
    deterministic function of the bytes so tests are stable."""
    if content is None:
        return [0.0] * FEATURE_DIM
    digest = hashlib.sha256(content).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def decode_and_featurize(df: DataFrame, batch_size: int = 64) -> DataFrame:
    """Arrow-batched decode → feature pipeline over a MEDIA_SCHEMA frame.

    The mapInPandas generator is the Beam ``DoFn.process`` twin with
    bundle lifecycle (start = generator entry, finish = exhaustion);
    batch size is capped via the Arrow config rather than element
    count so fat video rows don't blow executor memory.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_impl(k, c) for k, c in zip(pdf["kind"], pdf["content"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "sha256": [
                        hashlib.sha256(c).hexdigest() if c is not None else None
                        for c in pdf["content"]
                    ],
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing: 1→1 binary transform. STUB: passes bytes
    through and stamps the target dims in metadata (a real impl swaps
    the content). Kept relational where possible — only the byte
    transform would need Python."""
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def frame_sample_plan(df: DataFrame, every_ms: int) -> DataFrame:
    """Video frame-sampling *plan*: explodes each video row into frame
    timestamps (relational — the decode of each frame is the stubbed
    Python step). Shows the 1→N shape without touching bytes."""
    n_frames = F.greatest(
        (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast("int"), F.lit(0)
    )
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames)).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


def balance_by_size(df: DataFrame, target_partition_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Repartition so each task holds ~target bytes of blob content —
    the knob that keeps 100 TB of video from making straggler tasks."""
    total = df.agg(F.sum(F.length("content"))).head()[0] or 0
    parts = max(1, int(total / target_partition_bytes))
    return df.repartition(parts)

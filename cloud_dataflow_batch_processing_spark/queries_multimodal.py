"""Multimodal decode query: REAL binary decode under the driver's
oracle gate (VERDICT r2 #6).

The Spark side builds deterministic BMP and WAV blobs per document
(parameters are closed-form functions of doc_id), writes them into a
real BinaryType column, then decodes them back with the pure-Python
codecs (``extensions/media_codecs.py``) inside an Arrow-batched
mapInPandas and emits exact integer features. The DuckDB oracle never
sees the bytes — it computes the same features analytically from
doc_id — so a hash match certifies the full encode → binary column →
distributed decode → feature path recovers every pixel and sample
exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from cloud_dataflow_batch_processing_spark.extensions.multimodal import (
    extract_exact_features,
)
from cloud_dataflow_batch_processing_spark.queries import register
from cloud_dataflow_batch_processing_spark.sources.testdata import load_tables

_N_DOCS = 60
_SAMPLE_RATE = 8000


def _img_dims(doc_id: int) -> tuple[int, int]:
    return doc_id % 6 + 2, doc_id % 4 + 2


def _wav_frames(doc_id: int) -> int:
    return (doc_id % 20 + 1) * 40  # multiple of 8 → exact integer ms


def _sum_channel_sql(off: int) -> str:
    """Analytic channel sum: pixel byte at flat index 3p+c is
    (doc_id*31 + (3p+c)*7) % 256."""
    npix = "((doc_id % 6 + 2) * (doc_id % 4 + 2))"
    return (
        f"CAST(list_sum(list_transform(range(0, {npix}), "
        f"p -> (doc_id * 31 + 21 * p + {off * 7}) % 256)) AS BIGINT)"
    )


def _png_dims(doc_id: int) -> tuple[int, int]:
    return doc_id % 5 + 2, doc_id % 3 + 2


def _sum_channel_png_sql(off: int) -> str:
    """Analytic PNG channel sum: pixel byte at flat index 3p+c is
    (doc_id*37 + (3p+c)*11) % 256."""
    npix = "((doc_id % 5 + 2) * (doc_id % 3 + 2))"
    return (
        f"CAST(list_sum(list_transform(range(0, {npix}), "
        f"p -> (doc_id * 37 + 33 * p + {off * 11}) % 256)) AS BIGINT)"
    )


_WAV_N = "((doc_id % 20 + 1) * 40)"
_ORACLE = f"""
WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < {_N_DOCS})
SELECT doc_id + {2 * _N_DOCS} AS media_id,
       'png' AS format,
       CAST(doc_id % 5 + 2 AS BIGINT) AS img_w,
       CAST(doc_id % 3 + 2 AS BIGINT) AS img_h,
       {_sum_channel_png_sql(0)} AS sum_r,
       {_sum_channel_png_sql(1)} AS sum_g,
       {_sum_channel_png_sql(2)} AS sum_b,
       CAST(NULL AS BIGINT) AS wav_frames,
       CAST(NULL AS BIGINT) AS wav_duration_ms,
       CAST(NULL AS BIGINT) AS wav_sum
FROM docs
UNION ALL
SELECT doc_id * 2 AS media_id,
       'bmp' AS format,
       CAST(doc_id % 6 + 2 AS BIGINT) AS img_w,
       CAST(doc_id % 4 + 2 AS BIGINT) AS img_h,
       {_sum_channel_sql(0)} AS sum_r,
       {_sum_channel_sql(1)} AS sum_g,
       {_sum_channel_sql(2)} AS sum_b,
       CAST(NULL AS BIGINT) AS wav_frames,
       CAST(NULL AS BIGINT) AS wav_duration_ms,
       CAST(NULL AS BIGINT) AS wav_sum
FROM docs
UNION ALL
SELECT doc_id * 2 + 1 AS media_id,
       'wav' AS format,
       CAST(NULL AS BIGINT) AS img_w,
       CAST(NULL AS BIGINT) AS img_h,
       CAST(NULL AS BIGINT) AS sum_r,
       CAST(NULL AS BIGINT) AS sum_g,
       CAST(NULL AS BIGINT) AS sum_b,
       CAST({_WAV_N} AS BIGINT) AS wav_frames,
       CAST({_WAV_N} // 8 AS BIGINT) AS wav_duration_ms,
       CAST(list_sum(list_transform(range(0, {_WAV_N}),
            i -> (doc_id * 17 + 13 * i) % 4096)) - 2048 * {_WAV_N} AS BIGINT) AS wav_sum
FROM docs
"""


@register("multimodal_decode_features", oracle=_ORACLE)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode → BinaryType column → Arrow-batched decode → exact
    features, for one BMP image, one PNG image (filter type cycling
    through all five per doc_id — every decoder filter path runs under
    the oracle gate), and one PCM16 WAV per document. The decode step
    is the real pure-Python codec path (magic-byte dispatch), not a
    stub; the oracle reproduces every feature analytically, pinning
    the codecs' byte-level correctness at driver scale."""
    from cloud_dataflow_batch_processing_spark.extensions import media_codecs as M

    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < _N_DOCS)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = _img_dims(doc_id)
                rgb = bytes((doc_id * 31 + i * 7) % 256 for i in range(3 * w * h))
                rows.append({"media_id": doc_id * 2, "content": M.encode_bmp(w, h, rgb)})
                pw, ph = _png_dims(doc_id)
                prgb = bytes((doc_id * 37 + i * 11) % 256 for i in range(3 * pw * ph))
                rows.append(
                    {
                        "media_id": doc_id + 2 * _N_DOCS,
                        "content": M.encode_png(pw, ph, prgb, filter_type=doc_id % 5),
                    }
                )
                n = _wav_frames(doc_id)
                samples = [((doc_id * 17 + 13 * i) % 4096) - 2048 for i in range(n)]
                rows.append(
                    {
                        "media_id": doc_id * 2 + 1,
                        "content": M.encode_wav(samples, _SAMPLE_RATE),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = d.select("doc_id").mapInPandas(build, schema="media_id long, content binary")
    return extract_exact_features(media)

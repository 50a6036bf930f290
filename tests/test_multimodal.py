"""Multimodal plumbing tests: schema, Arrow batch shape, deterministic
stub features, 1→N frame sampling (SURVEY.md §2.3)."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row

from cloud_dataflow_batch_processing_spark.extensions.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_and_featurize,
    frame_sample_plan,
    resize_stub,
)


def _media_df(spark):
    rows = [
        Row(
            media_id=i,
            kind=["image", "audio", "video"][i % 3],
            content=bytes([i]) * (10 + i),
            meta=Row(mime="x/fake", width=4, height=4, duration_ms=1000 * i),
        )
        for i in range(9)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_features_deterministic(spark):
    df = _media_df(spark)
    out = decode_and_featurize(df, batch_size=4).orderBy("media_id").collect()
    assert len(out) == 9
    for r in out:
        content = bytes([r.media_id]) * (10 + r.media_id)
        assert r.n_bytes == len(content)
        assert r.sha256 == hashlib.sha256(content).hexdigest()
        digest = hashlib.sha256(content).digest()
        assert len(r.feature) == FEATURE_DIM
        assert abs(r.feature[0] - digest[0] / 255.0) < 1e-6


def test_resize_stub_stamps_dims(spark):
    out = resize_stub(_media_df(spark), 224, 224).select("meta.width", "meta.height").distinct().collect()
    assert [(r.width, r.height) for r in out] == [(224, 224)]


def test_frame_sample_explodes(spark):
    df = _media_df(spark).filter("kind = 'video'")  # media_id 2,5,8
    out = frame_sample_plan(df, every_ms=500)
    got = {r.media_id for r in out.collect()}
    assert got == {2, 5, 8}
    # media_id 2 → 2000ms → frames 0..4 at 500ms
    frames = sorted(
        r.frame_ts_ms for r in out.filter("media_id = 2").collect()
    )
    assert frames == [0, 500, 1000, 1500, 2000]


def test_extract_exact_features_arrow_twin(spark):
    """mapInArrow path must be value-identical to the mapInPandas path
    (same codecs, no pandas bridge for the blobs)."""
    from cloud_dataflow_batch_processing_spark.extensions import media_codecs as M
    from cloud_dataflow_batch_processing_spark.extensions.multimodal import (
        extract_exact_features,
        extract_exact_features_arrow,
    )

    rgb = bytes((i * 7) % 256 for i in range(3 * 4 * 3))
    media = spark.createDataFrame(
        [
            (0, M.encode_bmp(4, 3, rgb)),
            (1, M.encode_wav([5, -5, 100, -2048], 8000)),
            (2, b"\x00\x01garbage"),
            (3, None),
        ],
        "media_id long, content binary",
    )
    a = sorted(map(tuple, extract_exact_features_arrow(media, batch_size=2).collect()))
    p = sorted(map(tuple, extract_exact_features(media, batch_size=2).collect()))
    assert a == p
    assert len(a) == 4

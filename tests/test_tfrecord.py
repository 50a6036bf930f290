"""TFRecord framing tests: roundtrip, CRC verification, multi-file
(beam/io/tfrecordio.py parity)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from cloud_dataflow_batch_processing_spark.sources.tfrecord import (
    crc32c,
    decode_records,
    encode_records,
    read_tfrecord,
    write_tfrecord,
)


def test_crc32c_known_vectors():
    # Canonical check value + RFC 3720 §B.4 iSCSI test vectors
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_encode_decode_roundtrip():
    recs = [b"hello", b"", b"x" * 1000, bytes(range(256))]
    assert decode_records(encode_records(recs)) == recs


def test_corrupt_crc_detected():
    buf = bytearray(encode_records([b"payload"]))
    buf[-1] ^= 0xFF  # flip a data-crc byte
    with pytest.raises(ValueError, match="data CRC mismatch"):
        decode_records(bytes(buf))
    assert decode_records(bytes(buf), verify_crc=False) == [b"payload"]


def test_spark_roundtrip(spark, tmp_path):
    out = str(tmp_path / "tfr")
    df = spark.createDataFrame(
        [(f"rec{i}".encode(),) for i in range(50)], "value binary"
    ).repartition(3)
    write_tfrecord(df, "value", out)
    back = read_tfrecord(spark, out + "/*.tfrecord")
    vals = sorted(bytes(r.record).decode() for r in back.collect())
    assert vals == sorted(f"rec{i}" for i in range(50))
    # per-file indices start at 0
    assert back.filter(F.col("record_index") == 0).count() == 3

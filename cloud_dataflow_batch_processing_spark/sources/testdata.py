"""Loaders for the driver-generated test tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os
from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Timestamp storage in the driver's parquet differs per table:
# - lineitem.l_shipdate / orders.o_orderdate: timestamp[ms] → Spark
#   reads TimestampNTZ natively; nothing to do (matches DuckDB naive).
# - events.ts: TIMESTAMP(NANOS) → vanilla Spark rejects it
#   (PARQUET_TYPE_ILLEGAL); with spark.sql.legacy.parquet.nanosAsLong
#   it surfaces as int64 nanos and we convert to microsecond
#   timestamps here. DuckDB (the oracle) also truncates nanos → micros,
#   so `DIV 1000` keeps both engines identical.
# The conversion below is conditional on LongType, so listing a column
# that reads natively is a no-op (robust to the driver regenerating
# data with different units).
_NANO_TS_COLS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _restore_timestamps(df: DataFrame, name: str) -> DataFrame:
    for c in _NANO_TS_COLS.get(name, []):
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            # Keep the raw int64 nanos as {c}__ns: predicates on the
            # *converted* timestamp cannot reach the parquet scan
            # (pushdown doesn't traverse timestamp_micros), but a
            # redundant filter on the raw column can — see
            # ns_cutoff()/q1 for the pattern. At 100 TB that's the
            # difference between row-group skipping and a full scan.
            df = df.withColumn(f"{c}__ns", F.col(c)).withColumn(
                c, F.timestamp_micros(F.expr(f"{c} DIV 1000"))
            )
    return df


# DataFrame handles are immutable plans — reuse them across queries so
# repeated load_tables calls don't re-list files / re-read parquet
# footers (10 tables x every query adds up in bench and the driver's
# correctness sweep). Keyed by Spark application so a fresh driver
# session gets fresh frames.
_FRAME_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _FRAME_CACHE.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = _restore_timestamps(spark.read.parquet(table_path(sf_dir, name)), name)
    _FRAME_CACHE[key] = df
    return df


class _LazyTables(Mapping):
    """Mapping facade over :func:`load_table` that reads a table's
    parquet footer only when the table is actually ACCESSED. Queries
    touch 1-3 of the 10 tables, so the eager dict paid 7-9 needless
    footer reads/schema inferences per call on a cold frame cache —
    and it required every table to exist, which broke running a
    registered query against a partial directory (e.g. the bench's
    documents-only 50k scale corpus)."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getitem__(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(name)
        return load_table(self._spark, self._sf_dir, name)

    def __iter__(self):
        return iter(TABLES)

    def __len__(self) -> int:
        return len(TABLES)


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> Mapping[str, DataFrame]:
    return _LazyTables(spark, sf_dir or DEFAULT_SF_DIR)

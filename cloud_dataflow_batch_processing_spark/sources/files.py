"""Columnar / container-file sources: parquet, JSON, Avro, binary.

Reference surface: ReadFromAvro / WriteToAvro (beam/io/avroio.py:66,380),
generic Read/Write over BoundedSource/Sink (beam/io/iobase.py:829,879),
FileBasedSource glob+split (beam/io/filebasedsource.py:53-299). All of
that is Spark's FileScan machinery; these wrappers only pin options.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Beam twin: ReadFromAvro (beam/io/avroio.py:66). Requires the
    spark-avro package on the classpath; raises a clear error otherwise
    (the test container has no spark-avro jar — gated, not vendored).
    """
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:  # AnalysisException: Failed to find data source
        raise RuntimeError(
            "avro support needs the org.apache.spark:spark-avro package on "
            "the Spark classpath (spark-submit --packages)"
        ) from e


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Opaque file ingestion for multimodal columns: (path, modificationTime,
    length, content: binary). SURVEY.md §2.3 multimodal plan.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)

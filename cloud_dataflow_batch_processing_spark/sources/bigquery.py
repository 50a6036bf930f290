"""BigQuery source/sink abstraction with a local warehouse fallback.

Reference surface:
- ``BigQuerySource(query=... | table=...)`` (beam/io/gcp/bigquery.py:339-446)
- ``BigQuerySink(table, schema, create_disposition, write_disposition)``
  (beam/io/gcp/bigquery.py:448-601; buffered writer :684-735; used
  dataflow_pipeline.py:167-179, 210-222)
- dispositions (beam/io/gcp/bigquery.py:255-283)

Spark-first design: when the spark-bigquery connector is on the
classpath we use ``format("bigquery")``; otherwise (tests, local dev,
this container) the same API reads/writes a parquet "warehouse"
directory with table-name subdirs, so pipelines are testable without
GCP. The disposition pair maps onto Spark SaveModes:

  WRITE_TRUNCATE → overwrite      (reference :268-270)
  WRITE_APPEND   → append         (reference :264-267)
  WRITE_EMPTY    → errorifexists  (reference :271-274)
  CREATE_NEVER + missing table → error at load time (reference :255-263)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class CreateDisposition:
    CREATE_IF_NEEDED = "CREATE_IF_NEEDED"
    CREATE_NEVER = "CREATE_NEVER"


class WriteDisposition:
    WRITE_TRUNCATE = "WRITE_TRUNCATE"
    WRITE_APPEND = "WRITE_APPEND"
    WRITE_EMPTY = "WRITE_EMPTY"


_MODE = {
    WriteDisposition.WRITE_TRUNCATE: "overwrite",
    WriteDisposition.WRITE_APPEND: "append",
    WriteDisposition.WRITE_EMPTY: "errorifexists",
}


def disposition_to_mode(write_disposition: str) -> str:
    try:
        return _MODE[write_disposition]
    except KeyError:
        raise ValueError(f"unknown write disposition: {write_disposition!r}") from None


def _connector_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "com.google.cloud.spark.bigquery.BigQueryRelationProvider"
        )
        return True
    except Exception:
        return False


def _local_table_path(warehouse: str, table: str) -> str:
    # "dataset.table" → warehouse/dataset/table
    return os.path.join(warehouse, *table.split("."))


def read_table(
    spark: SparkSession,
    table: str | None = None,
    query: str | None = None,
    warehouse: str | None = None,
) -> DataFrame:
    """Beam twin: BigQuerySource — table *or* SQL query mode
    (beam/io/gcp/bigquery.py:339-446). Local fallback registers the
    warehouse's parquet tables as temp views and runs ``spark.sql``.
    """
    if (table is None) == (query is None):
        raise ValueError("pass exactly one of table= or query=")
    if _connector_available(spark):
        reader = spark.read.format("bigquery")
        return reader.option("table", table).load() if table else reader.option(
            "query", query
        ).load()
    warehouse = warehouse or os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/bq_warehouse")
    if table:
        return spark.read.parquet(_local_table_path(warehouse, table))
    # query mode: register every table in the warehouse as a view
    for dataset in os.listdir(warehouse):
        dpath = os.path.join(warehouse, dataset)
        if not os.path.isdir(dpath):
            continue
        for t in os.listdir(dpath):
            spark.read.parquet(os.path.join(dpath, t)).createOrReplaceTempView(t)
    return spark.sql(query)


def write_table(
    df: DataFrame,
    table: str,
    create_disposition: str = CreateDisposition.CREATE_IF_NEEDED,
    write_disposition: str = WriteDisposition.WRITE_EMPTY,
    warehouse: str | None = None,
) -> None:
    """Beam twin: BigQuerySink (beam/io/gcp/bigquery.py:448-601).

    Note the default matches Beam's (WRITE_EMPTY → errorifexists); the
    reference pipelines pass WRITE_TRUNCATE (dataflow_pipeline.py:176).
    The 1000-row insert buffering (reference :694) is connector-internal
    in Spark — no user-level twin needed.
    """
    mode = disposition_to_mode(write_disposition)
    spark = df.sparkSession
    if _connector_available(spark):
        df.write.format("bigquery").mode(mode).option("table", table).save()
        return
    warehouse = warehouse or os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/bq_warehouse")
    path = _local_table_path(warehouse, table)
    if create_disposition == CreateDisposition.CREATE_NEVER and not os.path.isdir(path):
        raise RuntimeError(
            f"table {table} does not exist and create_disposition=CREATE_NEVER "
            "(reference beam/io/gcp/bigquery.py:255-263)"
        )
    df.write.mode(mode).parquet(path)

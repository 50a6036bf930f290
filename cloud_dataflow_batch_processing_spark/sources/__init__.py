from cloud_dataflow_batch_processing_spark.sources.text import read_text, read_csv, write_text, write_csv
from cloud_dataflow_batch_processing_spark.sources.files import (
    read_parquet,
    read_json,
    read_avro,
    read_binary_files,
    write_parquet,
)
from cloud_dataflow_batch_processing_spark.sources.create import create
from cloud_dataflow_batch_processing_spark.sources.bigquery import (
    CreateDisposition,
    WriteDisposition,
    disposition_to_mode,
    read_table,
    write_table,
)
from cloud_dataflow_batch_processing_spark.sources.testdata import load_tables, table_path

__all__ = [
    "read_text",
    "read_csv",
    "write_text",
    "write_csv",
    "read_parquet",
    "read_json",
    "read_avro",
    "read_binary_files",
    "write_parquet",
    "create",
    "CreateDisposition",
    "WriteDisposition",
    "disposition_to_mode",
    "read_table",
    "write_table",
    "load_tables",
    "table_path",
]

"""BigQuery JSON TableSchema → Spark StructType.

The reference loads I/O schemas from JSON files shaped like BigQuery's
TableSchema (reference: resources/schema.json, resources/
schema_transformed.json) via ``parse_table_schema_from_json``
(reference: beam/io/gcp/bigquery.py:218-254). This module is the Spark
twin: the same JSON dialect mapped onto ``pyspark.sql.types``.

Type mapping (reference types observed at resources/schema.json:4,9,34,65):
  INTEGER → LongType, STRING → StringType, FLOAT → DoubleType,
  DATE → DateType; plus the rest of the BigQuery legacy-SQL type set for
  capability completeness. RECORD nests; mode REPEATED → ArrayType;
  NULLABLE/REQUIRED → nullability.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

_BQ_TO_SPARK: dict[str, T.DataType] = {
    "INTEGER": T.LongType(),
    "INT64": T.LongType(),
    "STRING": T.StringType(),
    "FLOAT": T.DoubleType(),
    "FLOAT64": T.DoubleType(),
    "NUMERIC": T.DecimalType(38, 9),
    "BIGNUMERIC": T.DecimalType(38, 18),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampType(),
    "DATETIME": T.TimestampNTZType(),
    "TIME": T.StringType(),
    "BYTES": T.BinaryType(),
    "GEOGRAPHY": T.StringType(),
    "JSON": T.StringType(),
}


def _field_to_spark(field: dict[str, Any]) -> T.StructField:
    ftype = str(field.get("type", "STRING")).upper()
    mode = str(field.get("mode", "NULLABLE")).upper()
    if ftype in ("RECORD", "STRUCT"):
        dtype: T.DataType = T.StructType(
            [_field_to_spark(f) for f in field.get("fields", [])]
        )
    else:
        try:
            dtype = _BQ_TO_SPARK[ftype]
        except KeyError:
            raise ValueError(f"unsupported BigQuery type: {ftype!r}") from None
    if mode == "REPEATED":
        dtype = T.ArrayType(dtype, containsNull=False)
    nullable = mode != "REQUIRED"
    return T.StructField(field["name"], dtype, nullable=nullable)


def bq_schema_to_struct(schema: str | list[dict[str, Any]] | dict[str, Any]) -> T.StructType:
    """Parse a BigQuery JSON TableSchema into a ``StructType``.

    Accepts the three shapes the reference handles: a JSON string, a
    ``{"fields": [...]}`` dict (the wrapped form built at reference
    dataflow_pipeline.py:43-44), or the bare field list (the on-disk
    form of resources/schema.json).
    """
    if isinstance(schema, str):
        schema = json.loads(schema)
    if isinstance(schema, dict):
        schema = schema.get("fields", [])
    return T.StructType([_field_to_spark(f) for f in schema])


def bq_schema_file_to_struct(path: str) -> T.StructType:
    """Load a schema JSON file (the reference's resources/*.json layout)."""
    with open(path, encoding="utf-8") as f:
        return bq_schema_to_struct(f.read())


def all_string_struct(schema: T.StructType) -> T.StructType:
    """The reference's parse stage keeps every CSV field as a string and
    lets the sink schema coerce types (dataflow_pipeline.py:64-66
    docstring: "data is not transformed"). This returns the string-typed
    twin of a schema for that permissive first-read mode.
    """
    return T.StructType(
        [T.StructField(f.name, T.StringType(), True) for f in schema.fields]
    )

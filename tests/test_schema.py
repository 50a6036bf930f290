"""Schema mapper tests — BigQuery JSON TableSchema → StructType
(reference: beam/io/gcp/bigquery.py:218-254; resources/schema.json)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from cloud_dataflow_batch_processing_spark.schema import (
    all_string_struct,
    bq_schema_to_struct,
)

# The reference's own schema shape (resources/schema.json — including
# the verbatim 'longtiude' typo at :38-40, preserved for fidelity).
NYC_FIELDS = [
    {"name": "id", "type": "INTEGER"},
    {"name": "name", "type": "STRING"},
    {"name": "host_id", "type": "INTEGER"},
    {"name": "host_name", "type": "STRING"},
    {"name": "neighbourhood_group", "type": "STRING"},
    {"name": "neighbourhood", "type": "STRING"},
    {"name": "latitude", "type": "FLOAT"},
    {"name": "longtiude", "type": "FLOAT"},
    {"name": "room_type", "type": "STRING"},
    {"name": "price", "type": "INTEGER"},
    {"name": "minimum_nights", "type": "INTEGER"},
    {"name": "number_of_reviews", "type": "INTEGER"},
    {"name": "last_review", "type": "DATE"},
    {"name": "reviews_per_month", "type": "FLOAT"},
    {"name": "calculated_host_listings_count", "type": "INTEGER"},
    {"name": "availability_365", "type": "INTEGER"},
]


def test_reference_schema_maps():
    st = bq_schema_to_struct(NYC_FIELDS)
    assert len(st.fields) == 16
    assert st["id"].dataType == T.LongType()
    assert st["latitude"].dataType == T.DoubleType()
    assert st["longtiude"].dataType == T.DoubleType()
    assert st["last_review"].dataType == T.DateType()
    assert st["neighbourhood"].dataType == T.StringType()


def test_wrapped_and_string_forms():
    wrapped = json.dumps({"fields": NYC_FIELDS})
    assert bq_schema_to_struct(wrapped) == bq_schema_to_struct(NYC_FIELDS)


def test_modes_and_nesting():
    st = bq_schema_to_struct(
        [
            {"name": "k", "type": "STRING", "mode": "REQUIRED"},
            {"name": "tags", "type": "STRING", "mode": "REPEATED"},
            {
                "name": "rec",
                "type": "RECORD",
                "fields": [{"name": "x", "type": "INTEGER"}],
            },
        ]
    )
    assert not st["k"].nullable
    assert st["tags"].dataType == T.ArrayType(T.StringType(), containsNull=False)
    assert st["rec"].dataType == T.StructType([T.StructField("x", T.LongType())])


def test_all_string_twin():
    st = all_string_struct(bq_schema_to_struct(NYC_FIELDS))
    assert all(f.dataType == T.StringType() for f in st.fields)
    assert [f.name for f in st.fields] == [f["name"] for f in NYC_FIELDS]

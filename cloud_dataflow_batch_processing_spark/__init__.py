"""cloud_dataflow_batch_processing_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``tchken/Cloud-Dataflow-Batch-Processing`` (a GCP Cloud Dataflow / Apache
Beam 2.5 batch ETL; see ``/root/reference``) on Apache Spark.

Design stance (SURVEY.md §7): no custom execution engine, no custom IR —
Catalyst's logical plan *is* the IR. The package is a thin, well-tested
library of:

- ``session``    — tuned SparkSession factory (AQE, shuffle partitions, UTC)
- ``schema``     — BigQuery JSON TableSchema → StructType mapper
- ``sources``    — text/CSV/parquet/avro readers, Beam-shaped (skip_header,
                   dispositions), plus a BigQuery abstraction w/ local fallback
- ``operators``  — Beam 2.5 operator surface (Map/FlatMap/Filter/Partition/
                   Flatten/GroupByKey/CoGroupByKey/Combine*/Count/Mean/Top/
                   Sample/ToList/ToDict/Distinct/Reshuffle) as DataFrame
                   compositions
- ``functions``  — scalar/vector helpers (text analysis, cosine similarity)
- ``extensions`` — LLM-data-pipeline operators: dedup (exact/MinHash-LSH/
                   SimHash), ANN similarity search, multimodal binary columns
- ``streaming``  — Structured Streaming windows/watermark layer
- ``sql``        — SQL entry façade: engine tables as temp views, any
                   ANSI SQL straight to Catalyst (a superset of the
                   reference, which has no SQL surface)
- ``plans``      — plan-inspection helpers (pushdown/broadcast assertions)
"""

from cloud_dataflow_batch_processing_spark.session import get_spark
from cloud_dataflow_batch_processing_spark.sql import register_views, sql

__all__ = ["get_spark", "register_views", "sql"]
__version__ = "0.1.0"

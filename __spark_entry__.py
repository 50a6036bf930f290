"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference workload of
tchken/Cloud-Dataflow-Batch-Processing re-expressed — see
cloud_dataflow_batch_processing_spark/queries.py::flagship_group_sum)
at sf0.001. ``queries()`` / ``oracle_sql()`` expose the full operator
registry for the driver's DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cloud_dataflow_batch_processing_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.flagship_group_sum(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()

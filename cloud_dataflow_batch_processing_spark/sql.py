"""SQL entry façade: run ANSI SQL directly against the engine's tables.

The reference has no SQL surface at all (its pipeline is composed
Python transforms — dataflow_pipeline.py:180-210); this is a deliberate
user-visible superset: every table the engine's DataFrame queries read
(TESTDATA.md / sources/testdata.py) is registered as a temp view, so
the exact oracle-SQL strings the registry carries for DuckDB — and any
ad-hoc ANSI query a user writes — run on Catalyst unchanged.

Scale posture: ``spark.sql`` over temp views IS the DataFrame API —
same logical plan, same Catalyst optimization (pushdown through the
view into the parquet scan, broadcast/AQE decisions), zero extra cost.
The views are plain lazy frame aliases, not materializations.

Dialect note: the registry's oracle strings target DuckDB, whose SQL
overlaps ANSI Spark SQL for the relational core (SELECT / JOIN /
GROUP BY / window functions / CASE / CAST AS DOUBLE-BIGINT). DuckDB
extensions (``json_extract_string``, ``LIST(...)``, ``x::type`` casts,
``CAST(... AS VARCHAR)`` without length) do NOT parse on Spark; the
verbatim-compatible subset is certified in tests/test_sql_facade.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cloud_dataflow_batch_processing_spark.sources.testdata import (
    DEFAULT_SF_DIR,
    TABLES,
    load_tables,
)


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> tuple[str, ...]:
    """Register every engine table under ``sf_dir`` as a temp view
    (idempotent; re-registering re-points the views at ``sf_dir``).
    Goes through ``load_tables`` so the timestamp-restoration rules
    apply identically to SQL and DataFrame consumers."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    return TABLES


def sql(
    spark: SparkSession,
    query: str,
    sf_dir: str = DEFAULT_SF_DIR,
    dialect: str = "spark",
) -> DataFrame:
    """Run ``query`` against the engine tables: the one-call SQL entry
    point (``engine.sql(...)`` in the README's terms). Returns the lazy
    DataFrame — compose it further or ``.collect()``.

    ``dialect='duckdb'`` routes the string through the mechanical
    translator first (sql_dialect.translate_duckdb) so DuckDB-dialect
    SQL — list literals, 1-based subscripts, QUALIFY, ASOF LEFT JOIN,
    … — runs on Catalyst; certified per-construct in
    tests/test_sql_dialect.py and per-registry-oracle in
    tests/test_sql_facade.py."""
    if dialect == "duckdb":
        from cloud_dataflow_batch_processing_spark.sql_dialect import translate_duckdb

        query = translate_duckdb(query)
    elif dialect != "spark":
        raise ValueError(f"dialect must be 'spark' or 'duckdb', got {dialect!r}")
    register_views(spark, sf_dir)
    return spark.sql(query)

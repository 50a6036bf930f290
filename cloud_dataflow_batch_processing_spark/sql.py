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

import itertools
import re

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


def _skip_literal(s: str, i: int) -> int:
    """Index just past the quoted literal opening at s[i] (single- or
    double-quoted; handles both '' doubling and backslash escapes —
    post-translation Spark SQL uses C-style escapes)."""
    q = s[i]
    i += 1
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\":
            i += 2
            continue
        if c == q:
            if i + 1 < n and s[i + 1] == q:
                i += 2
                continue
            return i + 1
        i += 1
    return i


_CTE_HEAD = re.compile(r"\s*([A-Za-z_]\w*)\s+AS\s*\(", flags=re.IGNORECASE)


def split_ctes(query: str) -> tuple[list[tuple[str, str]], str]:
    """Split a top-level ``WITH a AS (...), b AS (...) <tail>`` into
    ``([(name, body), ...], tail)``; a query with no leading WITH comes
    back as ``([], query)``. Only the OUTER WITH is split — a nested
    WITH inside a CTE body stays in that body. Depth-0 scan that skips
    string literals, so commas/parens inside strings never miscount.
    ``WITH RECURSIVE`` is refused (see run_recursive_cte for that)."""
    if re.match(r"\s*WITH\s+RECURSIVE\b", query, flags=re.IGNORECASE):
        raise ValueError("recursive CTEs need run_recursive_cte, not split_ctes")
    m = re.match(r"\s*WITH\s+", query, flags=re.IGNORECASE)
    if not m:
        return [], query
    i = m.end()
    n = len(query)
    ctes: list[tuple[str, str]] = []
    while True:
        hm = _CTE_HEAD.match(query, i)
        if not hm:
            raise ValueError(f"cannot parse CTE header at offset {i}: {query[i:i+60]!r}")
        name = hm.group(1)
        j = hm.end()  # just past the opening '('
        depth = 1
        start = j
        while j < n and depth:
            c = query[j]
            if c in "'\"":
                j = _skip_literal(query, j)
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        if depth:
            raise ValueError(f"unbalanced parens in CTE {name!r}")
        ctes.append((name, query[start : j - 1]))
        k = j
        while k < n and query[k].isspace():
            k += 1
        if k < n and query[k] == ",":
            i = k + 1
            continue
        return ctes, query[k:]


_NESTED_WITH = re.compile(r"\(\s*WITH\b", flags=re.IGNORECASE)
_NESTED_WITH_REC = re.compile(r"\(\s*WITH\s+RECURSIVE\b", flags=re.IGNORECASE)


def _lift_nested_withs(spark: SparkSession, s: str, gen) -> str:
    """Rewrite every parenthesized ``(WITH ...)`` subquery in ``s`` into
    ``(SELECT * FROM <fresh view>)``, executing the inner query through
    ``_run_with_cte_barriers`` (mutual recursion) and checkpointing the
    result. The ``(SELECT * FROM v)`` spelling stays valid in every
    subquery position (FROM item, IN, scalar). Literal-aware scan so
    parens/WITH inside strings never match."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in "'\"":
            j = _skip_literal(s, i)
            out.append(s[i:j])
            i = j
            continue
        if c == "(" and _NESTED_WITH.match(s, i) and not _NESTED_WITH_REC.match(s, i):
            j, depth = i + 1, 1
            while j < n and depth:
                cj = s[j]
                if cj in "'\"":
                    j = _skip_literal(s, j)
                    continue
                if cj == "(":
                    depth += 1
                elif cj == ")":
                    depth -= 1
                j += 1
            if depth:
                raise ValueError("unbalanced parens in nested WITH subquery")
            name = f"__barrier_sub_{next(gen)}"
            _run_with_cte_barriers(spark, s[i + 1 : j - 1], gen).localCheckpoint(
                eager=True
            ).createOrReplaceTempView(name)
            out.append(f"(SELECT * FROM {name})")
            i = j
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _run_with_cte_barriers(spark: SparkSession, query: str, gen=None) -> DataFrame:
    """Execute each top-level CTE as its own job with a lineage-cutting
    ``localCheckpoint`` between stages, then run the tail against the
    materialized views. RECURSIVE: a parenthesized ``(WITH ...)``
    subquery anywhere (e.g. ``dropped AS (SELECT ... FROM (WITH th_t AS
    ...) p)`` — the corpus_clean_pipeline / corpus_audit_report oracle
    shape) is lifted into its own barriered view first, so no nested
    WITH ever reaches Catalyst as one un-barriered plan.

    Why: Catalyst's CollapseProject inlines a CTE column's defining
    expression into EVERY downstream reference. For the char-fold /
    minhash oracles, where ``sig`` references ``sh`` 16× and ``sh``
    references the full tokenize pipeline, that inlining multiplies the
    higher-order-function work combinatorially (the measured
    "CollapseProject trap", NOTES r3/r8). A checkpoint is a real
    barrier: downstream plans see a LogicalRDD, nothing can inline
    through it, and each CTE's work runs exactly once — the same
    stage-boundary-materialization posture corpus_build_full uses at
    scale. Cost: pushdown/pruning stop at each barrier, so this is
    OPT-IN for the known trap queries, not the default path.

    View-name scoping: nested scopes may reuse a CTE name the outer
    query also defines (corpus_audit_report defines ``sh_t`` twice).
    Registration order is inner-first, and every registered view is
    EAGERLY checkpointed before any later registration can overwrite
    the name, so a consumer always captured the LogicalRDD of the
    version it referenced — later re-registration cannot retroactively
    rebind it."""
    if gen is None:
        gen = itertools.count()
    ctes, tail = split_ctes(query)
    for name, body in ctes:
        _run_with_cte_barriers(spark, body, gen).localCheckpoint(
            eager=True
        ).createOrReplaceTempView(name)
    return spark.sql(_lift_nested_withs(spark, tail, gen))


def sql(
    spark: SparkSession,
    query: str,
    sf_dir: str = DEFAULT_SF_DIR,
    dialect: str = "spark",
    materialize_ctes: bool = False,
) -> DataFrame:
    """Run ``query`` against the engine tables: the one-call SQL entry
    point (``engine.sql(...)`` in the README's terms). Returns the lazy
    DataFrame — compose it further or ``.collect()``.

    ``dialect='duckdb'`` routes the string through the mechanical
    translator first (sql_dialect.translate_duckdb) so DuckDB-dialect
    SQL — list literals, 1-based subscripts, QUALIFY, ASOF LEFT JOIN,
    … — runs on Catalyst; certified per-construct in
    tests/test_sql_dialect.py and per-registry-oracle in
    tests/test_sql_facade.py.

    ``materialize_ctes=True`` executes each top-level CTE behind a
    checkpoint barrier (see _run_with_cte_barriers) — the escape hatch
    for repeated-HOF queries where CollapseProject inlining would
    multiply work combinatorially."""
    if dialect == "duckdb":
        from cloud_dataflow_batch_processing_spark.sql_dialect import translate_duckdb

        query = translate_duckdb(query)
    elif dialect != "spark":
        raise ValueError(f"dialect must be 'spark' or 'duckdb', got {dialect!r}")
    register_views(spark, sf_dir)
    if materialize_ctes:
        return _run_with_cte_barriers(spark, query)
    return spark.sql(query)

"""Unit tests for the DuckDB → Spark SQL dialect shim (VERDICT r8 #5).

Each rewrite class in sql_dialect.translate_duckdb is keyed to a
measured Spark/DuckDB equivalence; these tests pin the TRANSLATION
(string → string) and, for the semantically subtle classes, execute
both engines on literal inputs and compare values. The registry-wide
certification (every translated oracle value-matched against its
DataFrame twin) lives in tests/test_sql_facade.py.
"""

from __future__ import annotations

import duckdb
import pytest

from cloud_dataflow_batch_processing_spark.sql_dialect import translate_duckdb


def _spark_val(spark, expr_sql: str):
    return spark.sql(f"SELECT {expr_sql} AS v").collect()[0].v


def _duck_val(expr_sql: str):
    return duckdb.sql(f"SELECT {expr_sql} AS v").fetchone()[0]


def _both(spark, duck_expr: str):
    """Translate a DuckDB scalar expression and evaluate it on both
    engines; returns (duck, spark)."""
    translated = translate_duckdb(f"SELECT {duck_expr} AS v")
    got = spark.sql(translated).collect()[0].v
    want = _duck_val(duck_expr)
    return want, got


CASES = [
    # bracket literals and 1-based subscripts (element_at contract)
    "[10, 20, 30][2]",
    "[10, 20, 30][-1]",
    "len([1, 2, 3])",
    "list_contains([1, 2, 3], 2)",
    # list_distinct's output order is unspecified in DuckDB — compare sorted
    "list_sort(list_distinct([1, 2, 2, 3]))",
    "list_min(list_transform([1, 2, 3], x -> x * 10))",
    # explicit-init fold (list_prepend spelling) and no-init fold
    "list_reduce(list_prepend(CAST(0 AS BIGINT), [1, 2, 3]), (a, x) -> a + x)",
    "list_reduce([5, 6, 7], (a, x) -> a + x)",
    # zip + transform → zip_with
    "list_transform(list_zip([1, 2], [10, 20]), p -> p[1] + p[2])",
    # inclusive-end slice
    "list_slice([1, 2, 3, 4, 5], 2, 4)",
    # expression-position range is end-exclusive
    "range(1, 5)",
    "len(range(0, 10))",
    # typed empty list
    "len(CAST([] AS BIGINT[]))",
    # integer division
    "7 // 2",
    # string functions
    "string_split('a b c', ' ')",
    "unicode('A')",
    "array_to_string([1, 2, 3], '-')",
    # regexp 'g' flag (Spark is global by default)
    "regexp_replace('aXbXc', 'X', '-', 'g')",
    # backslash classes must survive Spark's C-style literal parsing
    "regexp_replace('a 1 b 22', '\\d+', '#', 'g')",
    "len(string_split_regex(trim('a  b   c'), '\\s+'))",
    # 3-arg stepped range stays end-exclusive (sequence is inclusive)
    "range(0, 10, 3)",
    "range(0, 9, 3)",   # B lands exactly on a step: must be excluded
    "len(range(1, 8, 24))",
    # bitwise shift OPERATORS (Spark's parser has none)
    "(5 >> 1) & 1",
    "CAST(1 AS BIGINT) << 4",
    "list_transform([1, 2, 3], h -> (h >> 1) & 1)",
    # shift operands follow DuckDB precedence: + - * / % bind TIGHTER
    # than >>/<< (ADVICE r9 — 16 >> 1 + 2 is 16 >> 3 = 2, not 10)
    "16 >> 1 + 2",
    "16 + 1 >> 2",
    "2 << 1 * 3",
    "96 >> 2 * 2",
    "-3 >> 1",               # unary sign absorbed into the operand
    "16 >> 1 + 1 << 1",      # chained shifts stay left-associative
    "1 << 2 << 1",
    # standalone list_prepend (outside the fold-init spelling)
    "list_prepend(CAST(0 AS BIGINT), [7, 8])",
    # 2-arg trim = Spark btrim
    "trim('xxhixx', 'x')",
    # epoch family on a timestamp literal
    "epoch(TIMESTAMP '2024-01-02 03:04:05')",
    "epoch_us(TIMESTAMP '2024-01-02 03:04:05.250')",
    # isinf / json_valid
    "isinf(CAST('Infinity' AS DOUBLE))",
    "isinf(1.5)",
    "json_valid('{\"a\": 1}')",
    "json_valid('{not json')",
    "json_extract_string('{\"a\": \"x\"}', '$.a')",
]


@pytest.mark.parametrize("expr", CASES)
def test_scalar_equivalence(spark, expr):
    want, got = _both(spark, expr)
    assert got == want, f"{expr!r}: duck={want!r} spark={got!r}"


def test_time_bucket_equivalence(spark):
    want, got = _both(
        spark,
        "time_bucket(INTERVAL 15 MINUTE, TIMESTAMP '2024-03-01 10:37:11')",
    )
    assert str(got) == str(want)


def test_ordered_aggregate(spark):
    q = (
        "SELECT list(v ORDER BY k) AS vs FROM "
        "(VALUES (3, 'c'), (1, 'a'), (2, 'b')) t(k, v)"
    )
    want = duckdb.sql(q).fetchone()[0]
    got = spark.sql(translate_duckdb(q)).collect()[0].vs
    assert list(got) == list(want)


def test_qualify_rewrite(spark):
    q = (
        "SELECT k, v, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS rn "
        "FROM (VALUES (1, 10), (1, 20), (2, 30)) t(k, v) QUALIFY rn = 1 "
        "ORDER BY k"
    )
    want = duckdb.sql(q).fetchall()
    got = [tuple(r) for r in spark.sql(translate_duckdb(q)).collect()]
    assert got == want


def test_subscript_of_call_result(spark):
    want, got = _both(spark, "string_split('a,b,c', ',')[2]")
    assert got == want


def test_nested_brackets(spark):
    want, got = _both(spark, "[[1, 2], [3]][1][2]")
    assert got == want


def test_string_subscript_passes_through(spark):
    """ADVICE r9: m['k'] is a map/struct key lookup — element_at takes
    the string verbatim; wrapping it in CAST(... AS INT) only surfaced
    as a runtime cast error because ANSI mode is on."""
    out = translate_duckdb("SELECT m['k'] AS v FROM t")
    assert "element_at(m, 'k')" in out and "CAST" not in out
    # executable on Spark against a real map column
    translated = translate_duckdb("SELECT m['k'] AS v FROM t")
    got = spark.sql(
        translated.replace("FROM t", "FROM (SELECT map('k', 42) AS m) t")
    ).collect()[0].v
    assert got == 42


def test_slice_subscript_raises(spark):
    """DuckDB list slicing xs[2:3] has no element_at equivalent — the
    shim must fail loudly at translate time, not emit CAST(2:3 AS INT)."""
    with pytest.raises(ValueError, match="slice"):
        translate_duckdb("SELECT xs[2:3] AS v FROM t")


def test_keyword_then_bracket_is_literal(spark):
    want, got = _both(
        spark, "len(CASE WHEN 1 = 1 THEN [1, 2] ELSE [] END)"
    )
    assert got == want


def test_string_literals_untouched(spark):
    # brackets/functions inside literals must never rewrite
    want, got = _both(spark, "'len([1,2]) // x'")
    assert got == want


def test_exclude_star_modifier(spark):
    q = "SELECT * EXCLUDE (b) FROM (VALUES (1, 2), (3, 4)) t(a, b) ORDER BY a"
    want = duckdb.sql(q).fetchall()
    got = [tuple(r) for r in spark.sql(translate_duckdb(q)).collect()]
    assert got == want


def test_comment_with_apostrophe_does_not_derail_literals(spark):
    """An apostrophe inside a -- comment must not open a phantom
    string literal that swallows (and skips rewriting) the rest of the
    query — the measured udtf_split_segments failure mode."""
    q = (
        "SELECT\n"
        "  -- Python's str.split() analog, note the apostrophe\n"
        "  len(string_split('a b c', ' ')) AS v"
    )
    want = duckdb.sql(q).fetchone()[0]
    got = spark.sql(translate_duckdb(q)).collect()[0].v
    assert got == want


def test_asof_left_join(spark):
    """ASOF LEFT JOIN → correlated LATERAL top-1: per left row the
    single greatest right timestamp ≤ the left one, NULLs when none —
    compared against live DuckDB on the same literal tables."""
    q = (
        "WITH l(k, x) AS (VALUES (1, 10), (1, 25), (2, 5)), "
        "r(k, y, v) AS (VALUES (1, 8, 'a'), (1, 20, 'b'), (1, 30, 'c')) "
        "SELECT l.k, l.x, r.v, r.y FROM l ASOF LEFT JOIN r "
        "ON l.k = r.k AND l.x >= r.y ORDER BY l.k, l.x"
    )
    want = duckdb.sql(q).fetchall()
    got = [tuple(row) for row in spark.sql(translate_duckdb(q)).collect()]
    assert got == want


def test_unknown_constructs_pass_through():
    # conservative: unknown syntax passes through (and would fail
    # loudly in Spark's parser), never silently approximated
    s = "SELECT foo_bar_baz(x) FROM t ASOF JOIN u ON t.k = u.k"
    assert "foo_bar_baz(x)" in translate_duckdb(s)
    assert "ASOF JOIN" in translate_duckdb(s)


def test_list_comprehension_with_filter(spark):
    """[e FOR x IN xs IF p] → list_transform(list_filter(xs, x -> p),
    x -> e) — DuckDB's documented filter-then-map order, compared
    against live DuckDB."""
    q = "SELECT [x * 10 FOR x IN range(1, 8) IF x % 2 = 0] AS v"
    want = _duck_val("[x * 10 FOR x IN range(1, 8) IF x % 2 = 0]")
    got = spark.sql(translate_duckdb(q)).collect()[0].v
    assert list(got) == list(want)


def test_list_comprehension_no_filter(spark):
    want, got = _both(spark, "[x + 1 FOR x IN [5, 6, 7]]")
    assert list(got) == list(want)


def test_list_comprehension_subscript_body(spark):
    """The registry shape: body subscripts an outer column, the IF
    condition calls list_filter over another column."""
    q = (
        "WITH t(arr) AS (VALUES ([10, 20, 30, 40])) "
        "SELECT [arr[p] FOR p IN range(1, len(arr) + 1) IF p <> 2] AS v FROM t"
    )
    want = duckdb.sql(q).fetchone()[0]
    got = spark.sql(translate_duckdb(q)).collect()[0].v
    assert list(got) == list(want)


def test_struct_literal(spark):
    """{'k': v, ...} → named_struct — field names and order preserved."""
    q = "SELECT {'a': 1 + 1, 'b': [1, 2]} AS v"
    want = _duck_val("{'a': 1 + 1, 'b': [1, 2]}")
    got = spark.sql(translate_duckdb(q)).collect()[0].v.asDict()
    assert got["a"] == want["a"] and list(got["b"]) == list(want["b"])


def test_struct_literal_sorts_like_duckdb(spark):
    """list_sort over structs (the iv_doc CTE shape) orders by fields
    lexicographically in both engines."""
    q = (
        "WITH t(a, b) AS (VALUES (2, 1), (1, 9), (1, 2)) "
        "SELECT list_sort(list({'s': a, 'e': b})) AS v FROM t"
    )
    want = duckdb.sql(q).fetchone()[0]
    got = [r.asDict() for r in spark.sql(translate_duckdb(q)).collect()[0].v]
    assert got == [{"s": d["s"], "e": d["e"]} for d in want]


def test_unsupported_brace_raises():
    with pytest.raises(ValueError, match="brace"):
        translate_duckdb("SELECT {x: 1}")  # unquoted key: not a struct literal


def test_alias_in_where_inline(spark):
    """Opt-in alias-in-WHERE inlining (corpus_build_full's ex CTE
    shape): the alias reference in WHERE becomes the defining
    expression; OFF by default (pass-through)."""
    q = "SELECT len([1, 2, 3]) AS n FROM (SELECT 1) WHERE n > 2"
    want = duckdb.sql("SELECT len([1,2,3]) AS n WHERE n > 2").fetchall()
    translated = translate_duckdb(q, inline_where_aliases=True)
    got = [tuple(r) for r in spark.sql(translated).collect()]
    assert got == want == [(3,)]
    # default: untouched (Spark then fails loudly on the bare alias)
    assert "WHERE n > 2" in translate_duckdb(q)


def test_alias_in_where_generator_raises():
    with pytest.raises(ValueError, match="generator"):
        translate_duckdb(
            "SELECT unnest(xs) AS h FROM t WHERE h > 0",
            inline_where_aliases=True,
        )


def test_recursive_cte_fixpoint(spark, sf_dir):
    """WITH RECURSIVE ... UNION (DISTINCT) runs as sql.py's driver-side
    fixpoint loop (reached via materialize_ctes=True), matching live
    DuckDB's recursion semantics on a transitive-closure graph."""
    from cloud_dataflow_batch_processing_spark.sql import sql as engine_sql

    q = (
        "WITH RECURSIVE e(s, d) AS (SELECT * FROM (VALUES (1, 2), (2, 3), "
        "(3, 4), (10, 11))), "
        "reach(node, comp) AS ("
        "  SELECT s, s FROM (SELECT DISTINCT s FROM e) "
        "  UNION "
        "  SELECT e.d, r.comp FROM reach r JOIN e ON e.s = r.node"
        ") "
        "SELECT node, MIN(comp) AS component_id FROM reach GROUP BY node"
    )
    want = sorted(duckdb.sql(q).fetchall())
    got = sorted(
        tuple(r) for r in engine_sql(spark, q, sf_dir, materialize_ctes=True).collect()
    )
    assert got == want


def test_division_is_null_safe(spark):
    """`/` → try_divide: DuckDB division is NULL on a zero divisor
    (int and double), ANSI Spark raises — try_divide is the exact
    translation (r10; first exposed by 0/0 jaccard on empty shingle
    sets in the adversarial sweep)."""
    for expr in ["1 / 0", "1.5 / 0.0", "CAST(0 AS DOUBLE) / 0"]:
        want, got = _both(spark, expr)
        assert got == want is None, (expr, want, got)
    want, got = _both(spark, "7 / 2")
    assert got == want == 3.5
    # precedence: * binds with /, + does not; windowed divisor absorbed
    want, got = _both(spark, "1 + 2 * 3 / 4")
    assert got == want == 2.5


def test_range_empty_and_null(spark):
    """range(A, B) with B <= A is EMPTY (a bare sequence(A, B-1) runs
    DESCENDING — silently wrong); NULL end stays NULL (greatest() must
    not swallow it — a downstream no-init fold would explode on [])."""
    want, got = _both(spark, "range(5, 1)")
    assert list(got) == list(want) == []
    want, got = _both(spark, "range(1, 1)")
    assert list(got) == list(want) == []
    q = "SELECT range(1, CAST(NULL AS INT)) AS v"
    assert duckdb.sql(q).fetchone()[0] is None
    assert spark.sql(translate_duckdb(q)).collect()[0].v is None


def test_division_cast_stays_on_operand(spark):
    """`a / b::T` casts the DIVISOR, not the quotient: the right-operand
    scan absorbs a trailing `::type` (ADVICE r10 — `7 / 2::INT` was
    silently emitting `try_divide(7, 2)::INT` = 3 instead of 3.5).
    Left-side casts, parameterized types, and chains included."""
    for expr in [
        "7 / 2::INT",
        "7::INT / 2",
        "7 / 2::DECIMAL(10,2)",
        "9 / 2::INT::DOUBLE",
        "3 * 7::INT / 2",
    ]:
        want, got = _both(spark, expr)
        assert float(got) == float(want), (expr, want, got)


def test_division_windowed_and_case_numerators(spark):
    """The left-operand scan extends across `OVER (...)` / `OVER w` and
    `CASE ... END` (ADVICE r10 — a windowed numerator emitted invalid
    SQL `SUM(x) OVER try_divide((...), cnt)`; a CASE numerator raised
    at translate time)."""
    q = (
        "WITH t(k, x, cnt) AS (VALUES (1, 10, 4), (1, 30, 4)) "
        "SELECT SUM(x) OVER (PARTITION BY k) / cnt AS v FROM t"
    )
    want = sorted(r[0] for r in duckdb.sql(q).fetchall())
    got = sorted(r.v for r in spark.sql(translate_duckdb(q)).collect())
    assert got == want == [10.0, 10.0]
    for expr, expect in [
        ("CASE WHEN 1 > 0 THEN 1 ELSE 2 END / 2", 0.5),
        ("10 / CASE WHEN 1 > 0 THEN 4 ELSE 2 END", 2.5),
        ("CASE WHEN 1 > 0 THEN CASE WHEN 2 > 1 THEN 3 ELSE 1 END ELSE 2 END / 2", 1.5),
    ]:
        want, got = _both(spark, expr)
        assert got == want == expect, (expr, want, got)
    q2 = (
        "WITH t(k, x) AS (VALUES (1, 10), (1, 30)) "
        "SELECT avg(x) OVER w / 2 AS v FROM t WINDOW w AS (PARTITION BY k)"
    )
    got2 = sorted(r.v for r in spark.sql(translate_duckdb(q2)).collect())
    assert got2 == [10.0, 10.0]


def test_asof_left_join_with_trailing_where(spark):
    """ASOF LEFT JOIN followed by WHERE / another join must not swallow
    the trailing clause into the ON condition (ADVICE r10 — a second
    `_CLAUSE_END` definition shadowed the scanner's clause-terminator
    set and this shape raised 'without a recognizable inequality')."""
    q = (
        "WITH l(k, x) AS (VALUES (1, 10), (1, 25), (2, 5)), "
        "r(k, y, v) AS (VALUES (1, 8, 'a'), (1, 20, 'b')) "
        "SELECT l.k, l.x, r.v FROM l ASOF LEFT JOIN r "
        "ON l.k = r.k AND l.x >= r.y WHERE l.x > 6 ORDER BY l.k, l.x"
    )
    want = duckdb.sql(q).fetchall()
    got = [tuple(row) for row in spark.sql(translate_duckdb(q)).collect()]
    assert got == want


def test_asof_left_join_select_star_raises():
    """A bare SELECT * (or r.*) over the rewritten ASOF join would
    silently include the helper __asof_end column — schema divergence
    from DuckDB — so it raises loudly (ADVICE r10)."""
    base = "FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.x >= r.y"
    for sel in ["SELECT * ", "SELECT l.*, r.* "]:
        with pytest.raises(ValueError, match="__asof_end"):
            translate_duckdb(sel + base)
    # explicit projections and a * confined to a subquery are fine
    translate_duckdb("SELECT l.*, r.v " + base)
    translate_duckdb("SELECT l.id, r.v FROM (SELECT * FROM x) l "
                     "ASOF LEFT JOIN r ON l.k = r.k AND l.x >= r.y")


def test_materialize_ctes_drops_views_after_run(spark, sf_dir):
    """materialize_ctes=True must not leak CTE-named temp views into
    the session catalog (ADVICE r10): a later query referencing a
    same-named but UNDEFINED CTE would silently read the stale eager
    checkpoint instead of failing. The returned frame stays valid —
    spark.sql analyzes eagerly, so the views resolved before the drop."""
    from pyspark.sql.utils import AnalysisException

    from cloud_dataflow_batch_processing_spark.sql import sql as engine_sql

    q = (
        "WITH __leak_probe AS (SELECT 1 AS a UNION ALL SELECT 2), "
        "__leak_sub AS (SELECT a, (SELECT MAX(b) FROM (WITH inner_w AS "
        "(SELECT 3 AS b) SELECT b FROM inner_w)) AS m FROM __leak_probe) "
        "SELECT a, m FROM __leak_sub"
    )
    df = engine_sql(spark, q, sf_dir, materialize_ctes=True)
    assert sorted((r.a, r.m) for r in df.collect()) == [(1, 3), (2, 3)]
    names = {t.name for t in spark.catalog.listTables()}
    leaked = {n for n in names if n.startswith(("__leak_", "__barrier_sub_", "inner_w"))}
    assert leaked == set(), leaked
    with pytest.raises(AnalysisException):
        spark.sql("SELECT * FROM __leak_probe").collect()


def test_recursive_fixpoint_drops_views(spark, sf_dir):
    """The WITH RECURSIVE driver-side fixpoint also unregisters its
    working/member views after the tail is analyzed."""
    from cloud_dataflow_batch_processing_spark.sql import sql as engine_sql

    q = (
        "WITH RECURSIVE __leak_e(s, d) AS (SELECT * FROM (VALUES (1, 2), (2, 3))), "
        "__leak_reach(node) AS ("
        "  SELECT s FROM (SELECT DISTINCT s FROM __leak_e)"
        "  UNION "
        "  SELECT e.d FROM __leak_reach r JOIN __leak_e e ON e.s = r.node"
        ") "
        "SELECT COUNT(*) AS n FROM __leak_reach"
    )
    df = engine_sql(spark, q, sf_dir, materialize_ctes=True)
    assert df.collect()[0].n == 3
    names = {t.name for t in spark.catalog.listTables()}
    assert not {n for n in names if n.startswith("__leak_")}, names

"""Seeded-random property sweep of the dialect shim (VERDICT r9 #8).

The shim is a token rewriter with known sharp edges (comment/literal
interplay, backslash re-escaping, operator precedence); the 60+
hand-written units each pin ONE rewrite class. This sweep composes the
classes randomly — nested HOFs, subscripts of slices of comprehensions,
folds over transformed ranges, shifts of CASE results — and asserts
Spark-after-translate == DuckDB-original value-for-value.

Deterministic (seeded ``random.Random``), so a failure reproduces; bump
N_EXPRS locally for a deeper dig. The generator stays inside the
CERTIFIED envelope — constructs whose divergence is already pinned by a
unit with a documented contract are avoided, not re-litigated:

- subscripts are generated IN-BOUNDS (out-of-range: DuckDB NULL vs
  Spark ANSI element_at error — pinned loud),
- ``range(a, b)`` ascending only (descending: DuckDB [] vs Spark
  descending sequence),
- ``//`` gets non-negative dividends (negative: DuckDB floors, Spark
  ``div`` truncates),
- folds never see empty lists (pinned loud on both engines).
"""

from __future__ import annotations

import random

import duckdb
import pytest

from cloud_dataflow_batch_processing_spark.sql_dialect import translate_duckdb

SEED = 20260816
N_EXPRS = 120
BATCH = 20


def _gen_list(r: random.Random, depth: int) -> tuple[str, int]:
    """A DuckDB list expression with STATICALLY KNOWN length (so
    subscripts/slices stay in-bounds by construction)."""
    if depth <= 0 or r.random() < 0.35:
        k = r.randint(1, 6)
        return "[" + ", ".join(str(r.randint(-9, 9)) for _ in range(k)) + "]", k
    c = r.choice(["transform", "slice", "prepend", "sort", "range", "compr"])
    if c == "transform":
        sql, k = _gen_list(r, depth - 1)
        return f"list_transform({sql}, x -> x * {r.randint(-3, 3)} + {r.randint(-5, 5)})", k
    if c == "slice":
        sql, k = _gen_list(r, depth - 1)
        i = r.randint(1, k)
        j = r.randint(i, k)
        return f"list_slice({sql}, {i}, {j})", j - i + 1
    if c == "prepend":
        sql, k = _gen_list(r, depth - 1)
        return f"list_prepend({r.randint(-9, 9)}, {sql})", k + 1
    if c == "sort":
        sql, k = _gen_list(r, depth - 1)
        return f"list_sort({sql})", k
    if c == "range":
        a, k = r.randint(-5, 5), r.randint(1, 6)
        return f"range({a}, {a + k})", k
    sql, k = _gen_list(r, depth - 1)
    return f"[x * {r.randint(1, 3)} FOR x IN {sql}]", k


def _gen_int(r: random.Random, depth: int) -> str:
    if depth <= 0 or r.random() < 0.25:
        return str(r.randint(-9, 9))
    c = r.choice(
        ["add", "mul", "len", "subscript", "fold", "floordiv", "truediv",
         "mod", "shift", "minmax", "case", "filtered_len",
         "truediv_cast", "case_div"]
    )
    if c == "add":
        return f"({_gen_int(r, depth - 1)} + {_gen_int(r, depth - 1)})"
    if c == "mul":
        return f"({_gen_int(r, depth - 1)} * {r.randint(-4, 4)})"
    if c == "len":
        sql, _ = _gen_list(r, depth - 1)
        return f"len({sql})"
    if c == "subscript":
        sql, k = _gen_list(r, depth - 1)
        return f"({sql}[{r.randint(1, k)}])"
    if c == "fold":
        sql, _ = _gen_list(r, depth - 1)
        return f"list_reduce(list_prepend(0, {sql}), (acc, x) -> acc + x)"
    if c == "floordiv":
        return f"(abs({_gen_int(r, depth - 1)}) // {r.randint(1, 5)})"
    if c == "truediv":
        # zero divisors allowed: `/` → try_divide matches DuckDB's
        # NULL-on-zero exactly (r10); result is DOUBLE — wrap in a
        # floor to stay on the exact-int comparison path
        return (
            f"CAST(floor(coalesce(({_gen_int(r, depth - 1)})"
            f" / ({r.randint(0, 3)}), 0)) AS BIGINT)"
        )
    if c == "truediv_cast":
        # `::` casts adjacent to either division operand (ADVICE r10:
        # a divisor-side cast was silently relocated onto the quotient)
        if r.random() < 0.5:
            return (
                f"CAST(floor(coalesce(({_gen_int(r, depth - 1)})"
                f" / {r.randint(0, 3)}::BIGINT, 0)) AS BIGINT)"
            )
        return (
            f"CAST(floor(coalesce({r.randint(-9, 9)}::BIGINT"
            f" / ({_gen_int(r, depth - 1)}), 0)) AS BIGINT)"
        )
    if c == "case_div":
        # CASE blocks as division operands (ADVICE r10: a CASE
        # numerator raised at translate time; a CASE divisor raised too)
        a, b = _gen_int(r, depth - 1), _gen_int(r, depth - 1)
        t, e = _gen_int(r, depth - 1), r.randint(1, 5)
        case = f"CASE WHEN {a} >= {b} THEN {t} ELSE {e} END"
        roll = r.random()
        if roll < 0.33:
            return f"CAST(floor(coalesce(({case}) / {r.randint(0, 3)}, 0)) AS BIGINT)"
        if roll < 0.66:
            # bare (unparenthesized) CASE numerator — the backward-scan
            # END...CASE extension path
            return f"CAST(floor(coalesce({case} / {r.randint(0, 3)}, 0)) AS BIGINT)"
        return (
            f"CAST(floor(coalesce({r.randint(-9, 9)} / {case}, 0)) AS BIGINT)"
        )
    if c == "mod":
        return f"({_gen_int(r, depth - 1)} % {r.randint(1, 5)})"
    if c == "shift":
        # non-negative operand: DuckDB errors on shifting a negative
        # (Out of Range), Spark's shiftleft/right accept it — an
        # engine divergence outside the shim, pinned by staying clear
        op = r.choice([">>", "<<"])
        return f"(abs({_gen_int(r, depth - 1)}) {op} {r.randint(0, 3)})"
    if c == "minmax":
        fn = r.choice(["list_min", "list_max"])
        sql, _ = _gen_list(r, depth - 1)
        return f"{fn}({sql})"
    if c == "case":
        a, b = _gen_int(r, depth - 1), _gen_int(r, depth - 1)
        t, e = _gen_int(r, depth - 1), _gen_int(r, depth - 1)
        return f"(CASE WHEN {a} >= {b} THEN {t} ELSE {e} END)"
    sql, _ = _gen_list(r, depth - 1)
    return f"len(list_filter({sql}, x -> x % 2 = 0))"


def _gen_str(r: random.Random, depth: int) -> str:
    """A string expression over a small safe op set (ASCII-only words:
    unicode-collation differences in list_sort are out of scope)."""
    words = ["alpha", "bee", "ceee", "dd", "e"]
    if depth <= 0 or r.random() < 0.4:
        return f"'{r.choice(words)}'"
    c = r.choice(["concat", "upper", "lower", "btrim", "split_join", "substr"])
    if c == "concat":
        return f"({_gen_str(r, depth - 1)} || {_gen_str(r, depth - 1)})"
    if c == "upper":
        return f"upper({_gen_str(r, depth - 1)})"
    if c == "lower":
        return f"lower({_gen_str(r, depth - 1)})"
    if c == "btrim":
        return f"trim({_gen_str(r, depth - 1)}, 'ae')"
    if c == "split_join":
        return (
            f"array_to_string(string_split({_gen_str(r, depth - 1)}, 'e'), '-')"
        )
    return f"substring({_gen_str(r, depth - 1)}, 1, {r.randint(1, 4)})"


def _gen_expr(r: random.Random) -> str:
    roll = r.random()
    if roll < 0.25:
        sql, _ = _gen_list(r, 3)
        return sql
    if roll < 0.4:
        return _gen_str(r, 3)
    return _gen_int(r, 3)


def _norm(v):
    if isinstance(v, (list, tuple)):
        return [int(x) for x in v]
    if isinstance(v, str):
        return v
    return int(v)


def _batches():
    r = random.Random(SEED)
    exprs = [_gen_expr(r) for _ in range(N_EXPRS)]
    return [exprs[i : i + BATCH] for i in range(0, N_EXPRS, BATCH)]


@pytest.mark.parametrize("batch_id", range(N_EXPRS // BATCH))
def test_random_composition_matches_duckdb(spark, batch_id):
    exprs = _batches()[batch_id]
    select = "SELECT " + ", ".join(
        f"{e} AS c{i}" for i, e in enumerate(exprs)
    )
    want = duckdb.sql(select).fetchone()
    got = spark.sql(translate_duckdb(select)).collect()[0]
    for i, e in enumerate(exprs):
        w, g = want[i], got[i]
        assert _norm(g) == _norm(w), (
            f"expr {batch_id}:{i} diverged\n  duckdb: {w!r}\n  spark: {g!r}\n"
            f"  expr: {e}\n  translated: {translate_duckdb('SELECT ' + e)}"
        )

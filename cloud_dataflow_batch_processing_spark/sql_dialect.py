"""Mechanical DuckDB → Spark SQL dialect shim (VERDICT r8 #5).

The registry's oracle strings target DuckDB; ~half already run verbatim
on Catalyst (tests/test_sql_facade.py VERBATIM_CERTIFIED). The rest use
DuckDB-isms with exact Spark equivalents. ``translate_duckdb`` rewrites
those mechanically — a token/paren-level source transform, not a SQL
parser — so the façade can execute the DuckDB strings too. Every
translated string is certified by value-matching its DataFrame twin
(tests/test_sql_facade.py TRANSLATED_CERTIFIED); translation is only
trusted where that certification exists.

Rewrite classes (each keyed to a measured Spark/DuckDB equivalence —
see tests/test_sql_dialect.py):

- list literals ``[a, b]`` → ``array(a, b)``; typed empty-list casts
  ``CAST([] AS BIGINT[])`` → ``CAST(array() AS ARRAY<BIGINT>)``
- subscripts ``xs[i]`` → ``element_at(xs, i)`` (DuckDB indexing is
  1-based and supports negatives; Spark's ``[]`` is 0-based, but
  ``element_at`` is exactly DuckDB's contract)
- ``list_reduce(list_prepend(INIT, XS), FN)`` → ``aggregate(XS, INIT,
  FN)`` (DuckDB has no explicit-init fold; the oracles spell it with
  list_prepend — which IS aggregate's contract)
- ``list_transform(list_zip(A, B), p -> ...p[1]...p[2]...)`` →
  ``zip_with(A, B, (p__1, p__2) -> ...)``
- ``list_slice(L, A, B)`` (inclusive end) → ``slice(L, A, B-A+1)``
- standalone ``list_prepend(x, xs)`` → ``concat(array(x), xs)``
- ``range(A, B)`` in expression position (end-exclusive list) →
  ``sequence(A, B - 1)`` (inclusive); stepped ``range(A, B, S)`` →
  ``filter(sequence(A, B, S), __r -> __r < B)`` (drop a landing-on-B
  element); the table-valued ``FROM range`` form is left alone — both
  engines are end-exclusive there
- shift OPERATORS ``A >> B`` / ``A << B`` → ``shiftright/shiftleft(A,
  B)`` (Spark's parser has neither operator)
- 2-arg ``trim(str, chars)`` → ``btrim(str, chars)``
- ``* EXCLUDE (cols)`` → ``* EXCEPT (cols)``
- ``--`` comments are stripped during literal protection (an
  apostrophe inside a comment must not open a phantom literal)
- ``epoch(X)`` / ``epoch_us(X)`` → ``unix_seconds/unix_micros(CAST(X
  AS TIMESTAMP))`` (testdata timestamps are NTZ; the cast attaches the
  session zone, UTC in this engine's sessions)
- ``time_bucket(INTERVAL n unit, X)`` → epoch-floor arithmetic
- ``QUALIFY pred`` → wrap the SELECT: ``SELECT * EXCEPT (__q) FROM
  (SELECT ..., pred AS __q ...) WHERE __q``
- ``AGG(x ORDER BY k)`` (DuckDB ordered aggregate) → sort-by-struct:
  ``transform(array_sort(agg(struct(k, x))), s -> s.x)``
- function renames: list_* → array_*/HOF names, len → cardinality,
  unicode → ascii, string_split → split, unnest → explode,
  quantile_cont → percentile, array_to_string → array_join, …
- ``//`` → ``div``, bare ``VARCHAR`` → ``STRING``, 1-arg ``encode`` →
  utf-8, 4-arg regexp_replace 'g' flag dropped (Spark is global),
  ``json_valid(x)`` → ``get_json_object(x, '$') IS NOT NULL``,
  ``isinf(x)`` → ``abs(x) = CAST('Infinity' AS DOUBLE)``

- ``A / B`` → ``try_divide(A, B)`` — DuckDB division is NULL on a zero
  divisor, ANSI Spark raises; identical for every nonzero divisor (r10)
- ``ASOF LEFT JOIN ... ON eq AND l.x >= r.y`` → equi-join against the
  right side augmented with its LEAD/LAG next-match boundary (at most
  one match per left row; replaced the r9 correlated-LATERAL spelling,
  which planned as a BroadcastNestedLoopJoin — 455× at sf0.1)
- list comprehensions ``[e FOR x IN xs IF p]`` →
  ``list_transform(list_filter(xs, ..), ..)``; struct literals
  ``{'k': v}`` → ``named_struct`` (r10)
- opt-in per query (tests/test_sql_facade.py TRANSLATED_OPTS):
  ``double_literals`` (decimal literals CAST to DOUBLE — DuckDB's
  mixed-arithmetic promotion), ``inline_where_aliases`` (DuckDB
  alias-in-WHERE inlined textually)

NOT translated (left to fail loudly, stay DataFrame-only): inner
ASOF JOIN (no oracle uses it) and DuckDB-private functions with no
Spark twin (nfc_normalize). Recursive CTEs with UNION DISTINCT and
the quadratic-HOF char-fold pipelines DO run — through sql.py's
driver-side fixpoint loop and checkpoint-barrier runner respectively
(``sql(..., materialize_ctes=True)``), not through this module alone.
"""

from __future__ import annotations

import re

_ID = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


# ---------------------------------------------------------------------------
# literal protection + low-level scanners
# ---------------------------------------------------------------------------


def _protect(sql: str) -> tuple[str, list[str]]:
    """Strip ``--`` comments and stash single-quoted literals (with ''
    escapes) behind \\x00<n>\\x00 placeholders so every later rewrite can
    treat the text as code. One combined left-to-right scan: an
    apostrophe INSIDE a comment (``-- Python's str.split()``) must not
    open a literal — a regex-only stash would swallow the rest of the
    query into a phantom literal and silently skip every rewrite there
    (measured: udtf_split_segments)."""
    lits: list[str] = []
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":  # '' escape
                        j += 2
                        continue
                    break
                j += 1
            lits.append(sql[i : j + 1])
            out.append(f"\x00{len(lits) - 1}\x00")
            i = j + 1
        elif ch == "-" and i + 1 < n and sql[i + 1] == "-":
            while i < n and sql[i] != "\n":
                i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out), lits


def _restore(sql: str, lits: list[str]) -> str:
    # DuckDB string literals are raw; Spark's parser applies C-style
    # escapes (default escapedStringLiterals=false), so '\s+' would
    # silently become 's+'. Double every backslash on the way out.
    return re.sub(
        r"\x00(\d+)\x00",
        lambda m: lits[int(m.group(1))].replace("\\", "\\\\"),
        sql,
    )


def _lit(lits: list[str], text: str) -> str:
    """Register a NEW string literal mid-rewrite, returning its placeholder."""
    lits.append(text)
    return f"\x00{len(lits) - 1}\x00"


def _close_paren(s: str, i: int) -> int:
    """Index of the ')' matching s[i] == '(' (literals already stashed)."""
    depth = 0
    for j in range(i, len(s)):
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
            if depth == 0:
                return j
    raise ValueError(f"unbalanced parens at {i}: {s[i:i+60]!r}")


def _split_args(body: str) -> list[str]:
    """Split a call's argument text on top-level commas."""
    args, depth, start = [], 0, 0
    for j, ch in enumerate(body):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            args.append(body[start:j])
            start = j + 1
    args.append(body[start:])
    return [a.strip() for a in args]


def _find_calls(s: str, name: str):
    """Yield (start, open_paren) for each call of ``name`` (word-bounded),
    scanning left to right; caller mutates, so re-scan after each edit."""
    for m in re.finditer(rf"\b{name}\s*\(", s, flags=re.IGNORECASE):
        yield m.start(), m.end() - 1


def _rewrite_calls(s: str, name: str, fn) -> str:
    """Innermost-first rewrite of every ``name(...)`` call: ``fn(args)``
    returns the replacement text (WITHOUT trailing handling) or None to
    leave the call untouched."""
    while True:
        changed = False
        # rightmost-first: nested same-name calls sit to the right of
        # their enclosing call's start, so they rewrite first and the
        # enclosing call sees the already-rewritten text on re-scan;
        # args text is passed through verbatim either way. A None from
        # ``fn`` just moves on to the next (outer/earlier) hit.
        for start, op in reversed(list(_find_calls(s, name))):
            cp = _close_paren(s, op)
            inner = s[op + 1 : cp]
            rep = fn(_split_args(inner) if inner.strip() else [])
            if rep is None:
                continue
            s = s[:start] + rep + s[cp + 1 :]
            changed = True
            break  # offsets moved; re-scan
        if not changed:
            return s


# ---------------------------------------------------------------------------
# composite rewrites
# ---------------------------------------------------------------------------


def _rw_list_reduce(s: str) -> str:
    def fn(args):
        if len(args) != 2:
            return None
        m = re.match(r"list_prepend\s*\(", args[0], flags=re.IGNORECASE)
        if m:
            inner = args[0][m.end() - 1 + 1 : -1]  # inside list_prepend(...)
            init, xs = _split_args(inner)[0], ", ".join(_split_args(inner)[1:])
            return f"aggregate({xs}, {init}, {args[1]})"
        # no-init form: DuckDB seeds the fold with the FIRST element
        # (list_reduce([]) errors there; the oracles guard empties, and
        # Spark's element_at on [] raising keeps that loudness)
        xs = args[0]
        return (
            f"aggregate(slice({xs}, 2, GREATEST(cardinality({xs}) - 1, 0)), "
            f"element_at({xs}, 1), {args[1]})"
        )

    return _rewrite_calls(s, "list_reduce", fn)


def _rw_list_prepend(s: str) -> str:
    """Standalone list_prepend(x, xs) → concat(array(x), xs). Runs
    AFTER _rw_list_reduce, which consumes the fold-init spelling."""

    def fn(args):
        if len(args) < 2:
            return None
        return f"concat(array({args[0]}), {', '.join(args[1:])})"

    return _rewrite_calls(s, "list_prepend", fn)


def _find_kw_depth0(text: str, kw: str, start: int = 0) -> int:
    """Offset of the first depth-0 (parens AND brackets) occurrence of
    word ``kw`` in masked ``text``, or -1."""
    pat = re.compile(rf"{kw}\b", flags=re.IGNORECASE)
    d, i, n = 0, start, len(text)
    while i < n:
        c = text[i]
        if c in "([":
            d += 1
        elif c in ")]":
            d -= 1
        elif d == 0 and pat.match(text, i) and (
            i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_")
        ):
            return i
        i += 1
    return -1


def _rw_list_comprehensions(s: str) -> str:
    """DuckDB list comprehension → HOF composition::

        [expr FOR x IN xs IF cond]  →  list_transform(list_filter(xs,
                                         x -> cond), x -> expr)
        [expr FOR x IN xs]          →  list_transform(xs, x -> expr)

    (same evaluation order DuckDB documents: filter first, then map).
    Emits the DuckDB names so the later rename/bracket passes process
    the pieces uniformly. Restart-scan per rewrite; nested
    comprehensions resolve on subsequent passes (outer first — the
    inner one sits inside brackets, depth > 0)."""
    progress = True
    while progress:
        progress = False
        i = 0
        while i < len(s):
            if s[i] != "[":
                i += 1
                continue
            d, j = 0, i
            while j < len(s):
                if s[j] == "[":
                    d += 1
                elif s[j] == "]":
                    d -= 1
                    if d == 0:
                        break
                j += 1
            if d:
                raise ValueError("unbalanced brackets")
            inner = s[i + 1 : j]
            f = _find_kw_depth0(inner, "FOR")
            if f < 0:
                i += 1
                continue
            expr, rest = inner[:f], inner[f + 3 :]
            m = re.match(r"\s*([A-Za-z_]\w*)\s+IN\b", rest, flags=re.IGNORECASE)
            if not m:
                raise ValueError(f"unparseable list comprehension: {inner[:80]!r}")
            var, rest2 = m.group(1), rest[m.end() :]
            fi = _find_kw_depth0(rest2, "IF")
            if fi >= 0:
                xs, cond = rest2[:fi], rest2[fi + 2 :]
                repl = (
                    f"list_transform(list_filter({xs}, {var} -> {cond}), "
                    f"{var} -> {expr})"
                )
            else:
                repl = f"list_transform({rest2}, {var} -> {expr})"
            s = s[:i] + repl + s[j + 1 :]
            progress = True
            break
    return s


def _rw_struct_literals(s: str) -> str:
    """DuckDB struct literal ``{'k1': v1, 'k2': v2}`` →
    ``named_struct('k1', v1, 'k2', v2)``. Keys are masked string
    literals at this point; an opening brace whose first depth-0 entry
    is not ``<mask>:`` is left alone (fails loudly downstream rather
    than guessing)."""
    while True:
        i = s.find("{")
        if i < 0:
            return s
        d, j = 0, i
        while j < len(s):
            if s[j] == "{":
                d += 1
            elif s[j] == "}":
                d -= 1
                if d == 0:
                    break
            j += 1
        if d:
            raise ValueError("unbalanced braces in struct literal")
        inner = s[i + 1 : j]
        parts = _depth0_spans(inner, 0, len(inner)) if inner.strip() else []
        fields: list[str] = []
        ok = True
        for a, b in parts:
            em = re.match(r"\s*(\x00\d+\x00)\s*:\s*(.+)\s*$", inner[a:b], re.DOTALL)
            if not em:
                ok = False
                break
            fields.append(f"{em.group(1)}, {em.group(2)}")
        if not ok or not fields:
            raise ValueError(f"unsupported brace construct: {{{inner[:60]!r}}}")
        s = s[:i] + f"named_struct({', '.join(fields)})" + s[j + 1 :]


def _rw_trim_chars(s: str) -> str:
    """2-arg trim(str, chars) → btrim(str, chars) (exact contract);
    1-arg trim passes through untouched."""

    def fn(args):
        if len(args) != 2:
            return None
        return f"btrim({args[0]}, {args[1]})"

    return _rewrite_calls(s, "trim", fn)


_PRIMARY_FWD = re.compile(r"\s*(\x00\d+\x00|[A-Za-z_]\w*|\d+(?:\.\d+)?)")


def _rw_shifts(s: str) -> str:
    """Bitwise shift OPERATORS → functions: Spark's parser has no
    ``>>``/``<<`` (PARSE_SYNTAX_ERROR), DuckDB uses them freely.
    ``A >> B`` → shiftright(A, B). Operands honor DuckDB's (PostgreSQL)
    precedence, where ``* / %`` and ``+ -`` bind TIGHTER than shifts:
    each side starts as the adjacent primary (identifier chain / call /
    parenthesized / literal placeholder — the same scans the subscript
    pass uses) and is then extended across arithmetic-joined primaries,
    so ``16 >> 1 + 2`` becomes shiftright(16, 1 + 2) = 2, matching
    DuckDB — not shiftright(16, 1) + 2 (ADVICE r9)."""

    def fwd_primary(j: int) -> int | None:
        """End index (exclusive) of the primary starting at/after s[j]
        — word, number, literal placeholder, call, or parenthesized."""
        pm = _PRIMARY_FWD.match(s, j)
        if pm:
            j2 = pm.end()
            k2 = j2
            while k2 < len(s) and s[k2].isspace():
                k2 += 1
            if k2 < len(s) and s[k2] == "(":
                j2 = _close_paren(s, k2) + 1  # a call: include its parens
            return j2
        k2 = j
        while k2 < len(s) and s[k2].isspace():
            k2 += 1
        if k2 >= len(s) or s[k2] != "(":
            return None
        return _close_paren(s, k2) + 1

    while True:
        # (?<!-)/(?!>) keep JSON '->>'-style and '>>>' tokens out —
        # unrecognized operators must pass through and fail loudly,
        # never half-rewrite
        m = re.search(r"((?<![->])>>(?!>)|<<)", s)
        if not m:
            return s
        op = "shiftright" if m.group(1) == ">>" else "shiftleft"
        # left primary
        k = m.start() - 1
        while k >= 0 and s[k].isspace():
            k -= 1
        b0 = _expr_start(s, k)
        if b0 is None:
            raise ValueError(f"cannot parse shift left-operand before {m.start()}")
        # extend left across higher-precedence arithmetic: `a * 2 >> 1`
        # shifts (a * 2), not 2
        while True:
            k3 = b0 - 1
            while k3 >= 0 and s[k3].isspace():
                k3 -= 1
            if k3 < 0 or s[k3] not in "+-*/%":
                break
            k4 = k3 - 1
            while k4 >= 0 and s[k4].isspace():
                k4 -= 1
            nb = _expr_start(s, k4) if k4 >= 0 else None
            if nb is not None and s[nb : k4 + 1].upper() in _SUBSCRIPT_KEYWORDS:
                nb = None  # `... AND -x >> 1`: AND is not an operand
            if nb is None:
                # unary sign prefix (`(-3 << 1)`): absorb it and stop
                if s[k3] in "+-":
                    b0 = k3
                break
            b0 = nb
        left = s[b0 : k + 1]
        # right primary
        j2 = fwd_primary(m.end())
        if j2 is None:
            raise ValueError(f"cannot parse shift right-operand at {m.end()}")
        # extend right across higher-precedence arithmetic:
        # `16 >> 1 + 2` shifts by (1 + 2)
        while True:
            k2 = j2
            while k2 < len(s) and s[k2].isspace():
                k2 += 1
            if k2 >= len(s) or s[k2] not in "+-*/%":
                break
            if s[k2] == "-" and k2 + 1 < len(s) and s[k2 + 1] == ">":
                break  # JSON -> / ->> binds looser, not arithmetic
            j3 = k2 + 1
            while j3 < len(s) and s[j3].isspace():
                j3 += 1
            if j3 < len(s) and s[j3] in "+-":  # unary sign on the term
                j3 += 1
            nj = fwd_primary(j3)
            if nj is None:
                raise ValueError(f"cannot parse shift right-operand at {k2}")
            j2 = nj
        right = s[m.end() : j2].strip()
        s = s[:b0] + f"{op}({left}, {right})" + s[j2:]


_ASOF = re.compile(
    r"\bASOF\s+LEFT\s+(?:OUTER\s+)?JOIN\s+([A-Za-z_]\w*)"
    r"(?:\s+(?:AS\s+)?(?!ON\b)([A-Za-z_]\w*))?\s+ON\s+",
    flags=re.IGNORECASE,
)

_CLAUSE_END = re.compile(
    r"\b(WHERE|GROUP|ORDER|LIMIT|QUALIFY|HAVING|UNION|INTERSECT|EXCEPT|"
    r"JOIN|ASOF|LEFT|RIGHT|INNER|FULL|CROSS|WINDOW)\b",
    flags=re.IGNORECASE,
)


def _match_case_backward(s: str, end_start: int) -> int | None:
    """Given the index of the ``E`` of a trailing ``END``, return the
    index of the matching ``CASE`` (handles nesting); None if absent."""
    depth = 1
    for wm in reversed(
        list(re.finditer(r"\b(CASE|END)\b", s[:end_start], flags=re.IGNORECASE))
    ):
        if wm.group(1).upper() == "END":
            depth += 1
        else:
            depth -= 1
            if depth == 0:
                return wm.start()
    return None


def _left_operand_start(s: str, k: int) -> int | None:
    """Start of the operand primary ENDING at s[k], extended across the
    constructs ``_expr_start``'s right-to-left scan cannot see (ADVICE
    r10): a ``CASE ... END`` block, a windowed value ``fn(...) OVER
    (...)`` / ``fn(...) OVER w`` (where the right-to-left scan only
    sees the OVER clause or the window name), and ``expr::type`` cast
    chains (where it only sees the type name). None = unparseable."""
    b0 = _expr_start(s, k)
    if b0 is None:
        return None
    word = s[b0 : k + 1].upper()
    if word == "END":
        b0 = _match_case_backward(s, b0)
        if b0 is None:
            return None
    elif word in _SUBSCRIPT_KEYWORDS:
        return None
    while True:
        p = b0 - 1
        while p >= 0 and s[p].isspace():
            p -= 1
        if p >= 1 and s[p] == ":" and s[p - 1] == ":":
            q = p - 2
            while q >= 0 and s[q].isspace():
                q -= 1
            if q < 0:
                return None
            nb = _left_operand_start(s, q)
            if nb is None:
                return None
            b0 = nb
            continue
        if p >= 0 and (s[p].isalnum() or s[p] == "_"):
            q = p
            while q >= 0 and (s[q].isalnum() or s[q] == "_"):
                q -= 1
            if s[q + 1 : p + 1].upper() == "OVER":
                q2 = q
                while q2 >= 0 and s[q2].isspace():
                    q2 -= 1
                if q2 < 0 or s[q2] != ")":
                    return None
                nb = _expr_start(s, q2)
                if nb is None or s[nb : q2 + 1].upper() in _SUBSCRIPT_KEYWORDS:
                    return None
                b0 = nb
                continue
        return b0


def _rw_division(s: str) -> str:
    """``A / B`` → ``try_divide(A, B)``: DuckDB division returns NULL
    on a zero divisor (int AND double), Spark under ANSI raises
    DIVIDE_BY_ZERO. ``try_divide`` is numerically identical for every
    nonzero divisor and NULL exactly where DuckDB is NULL — the exact
    mechanical translation, not an approximation (first exposed by the
    adversarial corpus: two EMPTY shingle sets band-collide and the
    jaccard denominator is 0; DuckDB drops the pair via NULL, the
    translated SQL crashed — r10). ``//`` is excluded (integer
    division, handled later as ``div``).

    Operand capture mirrors _rw_shifts: the left side starts at the
    adjacent primary (via _expr_start) and extends left across the
    same-precedence ``*``/``%`` tier (left-assoc, so an earlier ``/``
    is already a try_divide call-primary); the right side is one
    optionally-signed primary plus its trailing ``.field`` / call /
    subscript chain. A bare SQL keyword as either operand raises —
    nothing half-rewrites."""
    while True:
        m = re.search(r"(?<!/)/(?!/)", s)
        if not m:
            return s
        i = m.start()
        # ---- left operand
        k = i - 1
        while k >= 0 and s[k].isspace():
            k -= 1
        b0 = _left_operand_start(s, k) if k >= 0 else None
        if b0 is None:
            raise ValueError(
                f"cannot parse division left operand before offset {i}: "
                f"{s[max(0, i - 60) : i]!r}"
            )
        while True:
            k3 = b0 - 1
            while k3 >= 0 and s[k3].isspace():
                k3 -= 1
            if k3 < 0 or s[k3] not in "*%":
                break
            k4 = k3 - 1
            while k4 >= 0 and s[k4].isspace():
                k4 -= 1
            nb = _left_operand_start(s, k4) if k4 >= 0 else None
            if nb is None:
                break
            b0 = nb
        left = s[b0 : k + 1]
        # ---- right operand: [sign] primary [.field | (...) | [...]]*
        n = len(s)
        j = i + 1
        while j < n and s[j].isspace():
            j += 1
        if j < n and s[j] in "+-":
            j += 1
            while j < n and s[j].isspace():
                j += 1
        pm = _PRIMARY_FWD.match(s, j)
        if pm:
            if pm.group(1).upper() == "CASE":
                # forward scan to the matching END (nesting-aware)
                depth2 = 1
                j2 = pm.end()
                for wm in re.finditer(r"\b(CASE|END)\b", s[pm.end() :], flags=re.IGNORECASE):
                    depth2 += 1 if wm.group(1).upper() == "CASE" else -1
                    if depth2 == 0:
                        j2 = pm.end() + wm.end()
                        break
                if depth2:
                    raise ValueError(
                        f"unterminated CASE in division right operand at offset {j}"
                    )
                j = j2
            elif pm.group(1).upper() in _SUBSCRIPT_KEYWORDS:
                raise ValueError(
                    f"cannot parse division right operand at offset {j}: "
                    f"{s[j : j + 60]!r}"
                )
            else:
                j = pm.end()
        elif j < n and s[j] == "(":
            j = _close_paren(s, j) + 1
        else:
            raise ValueError(
                f"cannot parse division right operand at offset {j}: "
                f"{s[j : j + 60]!r}"
            )
        while j < n:
            k2 = j
            while k2 < n and s[k2].isspace():
                k2 += 1
            if k2 < n and s[k2] == "(":
                j = _close_paren(s, k2) + 1
                continue
            if k2 < n and s[k2] == "[":
                d, t = 0, k2
                while t < n:
                    if s[t] == "[":
                        d += 1
                    elif s[t] == "]":
                        d -= 1
                        if d == 0:
                            break
                    t += 1
                if d:
                    raise ValueError("unbalanced subscript in division operand")
                j = t + 1
                continue
            dm = re.match(r"\.\s*\w+", s[k2:])
            if k2 < n and dm:
                j = k2 + dm.end()
                continue
            # a window function divisor: absorb `OVER (...)` or a
            # named `OVER w` so the whole windowed value divides
            # (rolling_avg_events shape)
            om = re.match(r"OVER\s*\(", s[k2:], flags=re.IGNORECASE)
            if k2 < n and om:
                j = _close_paren(s, k2 + om.end() - 1) + 1
                continue
            onm = re.match(r"OVER\s+(\w+)", s[k2:], flags=re.IGNORECASE)
            if k2 < n and onm:
                j = k2 + onm.end()
                continue
            # a `::type` cast binds tighter than `/` — absorb it so the
            # CAST stays on the divisor (`a / b::INT` was silently
            # emitting `try_divide(a, b)::INT`, casting the quotient —
            # ADVICE r10). Parameterized types (DECIMAL(10,2)) included.
            tm = re.match(r"::\s*\w+(\s*\([^()]*\))?", s[k2:])
            if k2 < n and tm:
                j = k2 + tm.end()
                continue
            break
        right = s[i + 1 : j].strip()
        s = s[:b0] + f"try_divide({left}, {right})" + s[j:]


def _rw_asof_left_join(s: str) -> str:
    """``L ASOF LEFT JOIN R r ON eq AND l.x >= r.y`` → an EQUI-join
    against the right side augmented with its next-match boundary::

        LEFT JOIN (SELECT __asof_r.*,
                          LEAD(__asof_r.y) OVER (PARTITION BY <eq cols>
                                                 ORDER BY __asof_r.y) AS __asof_end
                   FROM R AS __asof_r WHERE __asof_r.y IS NOT NULL) AS r
          ON eq AND l.x >= r.y
             AND (r.__asof_end IS NULL OR NOT (l.x >= r.__asof_end))

    Within an equality group the right rows sorted by y tile the x axis
    into half-open intervals, so each left row matches AT MOST ONE
    right row — the greatest y ≤ x: DuckDB's ASOF LEFT JOIN contract
    (NULLs when none; NULL-y right rows can never match an inequality
    and are filtered inside the derived table). Ascending variants
    (``l.x <= r.y`` — first value at-or-after) use LAG for the
    boundary. The join stays an EQUI join plus filters — it plans as
    SortMergeJoin/ShuffledHashJoin on the equality keys.

    This REPLACED the r9 correlated-LATERAL-top-1 spelling: Spark
    decorrelates the LIMIT-1 lateral into a WindowGroupLimit over a
    BroadcastNestedLoopJoin — measured 455× the DataFrame twin at
    sf0.1 (VERDICT r9 #3 A/B, NOTES r10) and quadratic per equality
    group at scale.

    The derived table exposes one extra ``__asof_end`` column under the
    right alias; a bare ``SELECT *`` (or ``r.*``) over the join would
    silently include it — a schema divergence from DuckDB — so that
    shape RAISES (ADVICE r10): project columns explicitly. Plain
    (inner) ASOF JOIN is left untouched → fails loudly."""
    while True:
        m = _ASOF.search(s)
        if m is None:
            return s
        rtbl, ralias = m.group(1), m.group(2) or m.group(1)
        _reject_star_over_asof(s, m.start(), ralias)
        # condition extent: depth-0 scan to the next clause keyword /
        # closing paren / end of string
        j, depth, end = m.end(), 0, len(s)
        while j < len(s):
            ch = s[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth < 0:
                    end = j
                    break
            elif depth == 0:
                t = _CLAUSE_END.match(s, j)
                if t and (j == 0 or not (s[j - 1].isalnum() or s[j - 1] == "_")):
                    end = j
                    break
            j += 1
        cond = s[m.end() : end].strip()
        # find the single inequality term (order key + direction) and
        # the equality terms' right-side columns (window partition)
        terms = _split_top_and(cond)
        r_ref = re.compile(rf"^{re.escape(ralias)}\.(\w+)$", re.IGNORECASE)
        order_col = direction = lhs_expr = ineq_op = None
        part_cols: list[str] = []
        for t in terms:
            cm = re.match(
                r"^(.+?)\s*(>=|<=|>|<|=)\s*(.+)$", t.strip(), flags=re.DOTALL
            )
            if not cm:
                raise ValueError(f"unparseable ASOF join term: {t.strip()!r}")
            lhs, op, rhs = cm.group(1).strip(), cm.group(2), cm.group(3).strip()
            if op == "=":
                if r_ref.match(rhs):
                    part_cols.append(r_ref.match(rhs).group(1))
                elif r_ref.match(lhs):
                    part_cols.append(r_ref.match(lhs).group(1))
                else:
                    raise ValueError(
                        f"ASOF equality term without a bare {ralias}.<col> side: "
                        f"{t.strip()!r}"
                    )
                continue
            if r_ref.match(rhs) and not r_ref.match(lhs):
                order_col = r_ref.match(rhs).group(1)
                direction = "DESC" if op in (">=", ">") else "ASC"
                lhs_expr, ineq_op = lhs, op
            elif r_ref.match(lhs) and not r_ref.match(rhs):
                order_col = r_ref.match(lhs).group(1)
                direction = "ASC" if op in (">=", ">") else "DESC"
                lhs_expr = rhs
                ineq_op = {">=": "<=", "<=": ">=", ">": "<", "<": ">"}[op]
        if order_col is None:
            raise ValueError(f"ASOF LEFT JOIN without a recognizable inequality: {cond!r}")
        bound_fn = "LEAD" if direction == "DESC" else "LAG"
        part = (
            "PARTITION BY " + ", ".join(f"__asof_r.{c}" for c in part_cols) + " "
            if part_cols
            else ""
        )
        derived = (
            f"(SELECT __asof_r.*, {bound_fn}(__asof_r.{order_col}) OVER "
            f"({part}ORDER BY __asof_r.{order_col}) AS __asof_end "
            f"FROM {rtbl} AS __asof_r "
            f"WHERE __asof_r.{order_col} IS NOT NULL)"
        )
        # boundary term: the NEXT candidate does not also satisfy the
        # inequality — NOT (lhs <op> boundary), NULL boundary = last row
        extra = (
            f" AND ({ralias}.__asof_end IS NULL OR "
            f"NOT (({lhs_expr}) {ineq_op} {ralias}.__asof_end))"
        )
        rep = f"LEFT JOIN {derived} AS {ralias} ON {cond}{extra} "
        s = s[: m.start()] + rep + s[end:]


def _reject_star_over_asof(s: str, pos: int, ralias: str) -> None:
    """The ASOF rewrite's derived table carries a helper ``__asof_end``
    column, so the owning SELECT must project explicitly: a bare ``*``
    or ``<ralias>.*`` select list would silently return one more column
    than DuckDB. Raise instead of diverging (string literals are
    stashed at this point, so paren counting is reliable)."""
    owner = None
    for sm in re.finditer(r"\bSELECT\b", s[:pos], flags=re.IGNORECASE):
        seg = s[sm.end() : pos]
        if seg.count("(") == seg.count(")"):
            owner = sm
    if owner is None:
        return
    j, depth, n = owner.end(), 0, len(s)
    list_end = n
    while j < n:
        c = s[j]
        if c == "(":
            depth += 1
        elif c == ")":
            if depth == 0:
                list_end = j
                break
            depth -= 1
        elif depth == 0 and re.match(r"\bFROM\b", s[j : j + 4], flags=re.IGNORECASE) and not (
            s[j - 1].isalnum() or s[j - 1] == "_"
        ):
            list_end = j
            break
        j += 1
    sel = s[owner.end() : list_end].strip()
    if sel == "*" or re.search(rf"(?:^|[,\s]){re.escape(ralias)}\s*\.\s*\*", sel):
        raise ValueError(
            "ASOF LEFT JOIN under a bare SELECT * (or "
            f"{ralias}.*) — the rewrite adds a helper __asof_end column "
            "that would silently widen the schema; project columns "
            "explicitly"
        )


def _split_top_and(cond: str) -> list[str]:
    """Split a boolean expression on top-level ANDs."""
    parts, depth, start = [], 0, 0
    i = 0
    while i < len(cond):
        ch = cond[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and cond[i : i + 3].upper() == "AND":
            before_ok = i == 0 or not (cond[i - 1].isalnum() or cond[i - 1] == "_")
            after = i + 3
            after_ok = after >= len(cond) or not (cond[after].isalnum() or cond[after] == "_")
            if before_ok and after_ok:
                parts.append(cond[start:i])
                start = i + 3
                i = after
                continue
        i += 1
    parts.append(cond[start:])
    return [p.strip() for p in parts if p.strip()]


def _rw_list_zip_transform(s: str) -> str:
    """list_transform(list_zip(A, B), v -> BODY{v[1],v[2]}) →
    zip_with(A, B, (v__1, v__2) -> BODY{v__1,v__2}). DuckDB's struct
    subscripts may still be spelled [] here (bracket pass runs later)."""

    def fn(args):
        if len(args) != 2:
            return None
        m = re.match(r"list_zip\s*\(", args[0], flags=re.IGNORECASE)
        if not m:
            return None
        zip_args = _split_args(args[0][m.end() : -1])
        if len(zip_args) != 2:
            return None
        lam = re.match(r"(\w+)\s*->\s*(.*)$", args[1], flags=re.DOTALL)
        if not lam:
            return None
        v, body = lam.group(1), lam.group(2)
        body = re.sub(rf"\b{v}\s*\[\s*1\s*\]", f"{v}__1", body)
        body = re.sub(rf"\b{v}\s*\[\s*2\s*\]", f"{v}__2", body)
        return f"zip_with({zip_args[0]}, {zip_args[1]}, ({v}__1, {v}__2) -> {body})"

    return _rewrite_calls(s, "list_transform", fn)


def _rw_list_slice(s: str) -> str:
    def fn(args):
        if len(args) != 3:
            return None
        l, a, b = args
        return f"slice({l}, {a}, ({b}) - ({a}) + 1)"

    return _rewrite_calls(s, "list_slice", fn)


def _rw_range_expr(s: str) -> str:
    """Expression-position range(A, B) → sequence(A, B - 1). Table-
    valued uses (``FROM range(...)`` / ``, range(...) alias``) are
    recognized by a following table alias or a preceding FROM/JOIN."""
    out = []
    last = 0
    for m in re.finditer(r"\brange\s*\(", s, flags=re.IGNORECASE):
        op = m.end() - 1
        if op < last:
            continue
        cp = _close_paren(s, op)
        before = s[: m.start()].rstrip()
        after = s[cp + 1 :].lstrip()
        is_tvf = bool(
            re.search(r"(FROM|JOIN)\s*$", before, flags=re.IGNORECASE)
            or re.match(r"(AS\s+)?[A-Za-z_]\w*\s*\(", after, flags=re.IGNORECASE)
        )
        if is_tvf:
            continue
        args = _split_args(s[op + 1 : cp])
        if len(args) == 2:
            # NOT a bare sequence(A, B-1): for B <= A DuckDB's range is
            # EMPTY while Spark's sequence runs DESCENDING — silently
            # wrong values (first exposed by empty-text docs: range(1,
            # len(t) + 1) with len 0 → [1, 0], then t[1] exploded). The
            # greatest() pin keeps sequence ascending and the filter
            # empties it exactly like DuckDB.
            a, b = args
            # NULL end must stay NULL (DuckDB range(1, NULL) is NULL;
            # greatest() would swallow it into [1] and a downstream
            # no-init fold's element_at would explode on the []
            # after the filter — measured on NULL-text docs)
            rep = (
                f"if(({b}) IS NULL, NULL, "
                f"filter(sequence(({a}), greatest(({a}), ({b}) - 1)), "
                f"__r -> __r < ({b})))"
            )
        elif len(args) == 3:
            # stepped range (ints or timestamps): sequence is END-
            # INCLUSIVE when (B - A) divides the step, DuckDB never is
            # — drop any landing-on-B element explicitly.
            a, b, st = args
            rep = (
                f"filter(sequence({a}, {b}, {st}), __r -> __r < ({b}))"
            )
        else:
            continue
        out.append(s[last : m.start()])
        out.append(rep)
        last = cp + 1
    out.append(s[last:])
    joined = "".join(out)
    # nested ranges inside the rewritten args: recurse until stable
    return joined if joined == s else _rw_range_expr(joined)


def _rw_time_bucket(s: str, lits: list[str]) -> str:
    unit_secs = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}

    def fn(args):
        if len(args) != 2:
            return None
        m = re.match(
            r"INTERVAL\s+(\d+)\s+(SECOND|MINUTE|HOUR|DAY)S?\s*$",
            args[0],
            flags=re.IGNORECASE,
        )
        if not m:
            return None
        secs = int(m.group(1)) * unit_secs[m.group(2).upper()]
        x = args[1]
        return (
            f"CAST(timestamp_seconds(FLOOR(unix_seconds(CAST({x} AS TIMESTAMP))"
            f" / {secs}) * {secs}) AS TIMESTAMP_NTZ)"
        )

    return _rewrite_calls(s, "time_bucket", fn)


def _rw_epoch(s: str) -> str:
    s = _rewrite_calls(
        s, "epoch_us",
        lambda a: f"unix_micros(CAST({a[0]} AS TIMESTAMP))" if len(a) == 1 else None,
    )
    return _rewrite_calls(
        s, "epoch",
        lambda a: f"unix_seconds(CAST({a[0]} AS TIMESTAMP))" if len(a) == 1 else None,
    )


def _rw_json_valid(s: str) -> str:
    def fn(args):
        if len(args) != 1:
            return None
        return f"(get_json_object({args[0]}, \x01dollar\x01) IS NOT NULL)"

    return _rewrite_calls(s, "json_valid", fn)


def _rw_isinf(s: str) -> str:
    def fn(args):
        if len(args) != 1:
            return None
        return f"(abs({args[0]}) = CAST(\x01inf\x01 AS DOUBLE))"

    return _rewrite_calls(s, "isinf", fn)


def _rw_encode(s: str) -> str:
    def fn(args):
        if len(args) != 1:
            return None
        return f"encode({args[0]}, \x01utf8\x01)"

    return _rewrite_calls(s, "encode", fn)


def _rw_regexp_flags(s: str, lits: list[str]) -> str:
    """Drop DuckDB's 'g' option arg: Spark's regexp_replace is global."""

    def fn(args):
        if len(args) != 4:
            return None
        m = re.fullmatch(r"\x00(\d+)\x00", args[3].strip())
        if not m or lits[int(m.group(1))] != "'g'":
            return None
        return f"regexp_replace({args[0]}, {args[1]}, {args[2]})"

    return _rewrite_calls(s, "regexp_replace", fn)


def _rw_ordered_agg(s: str) -> str:
    """AGG(expr ORDER BY key) → transform(array_sort(collect_list(
    struct(key AS __o, expr AS __v))), s -> s.__v) — DuckDB's ordered
    list()/array_agg() with a single ASC key."""

    def make(args):
        if len(args) != 1:
            return None
        m = re.match(
            r"(.*?)\s+ORDER\s+BY\s+([A-Za-z_][\w.]*)\s*$", args[0], flags=re.DOTALL
        )
        if not m:
            return None
        expr, key = m.group(1).strip(), m.group(2)
        return (
            f"transform(array_sort(collect_list(struct({key} AS __o, "
            f"{expr} AS __v))), __s -> __s.__v)"
        )

    for agg in ("list", "array_agg"):
        s = _rewrite_calls(s, agg, make)
    return s


# ---------------------------------------------------------------------------
# bracket transformer: literals vs subscripts
# ---------------------------------------------------------------------------


def _expr_start(s: str, i: int) -> int | None:
    """Start index of the primary expression ENDING at s[i] (inclusive),
    for subscript-base extraction: identifier chains a.b.c, call results
    f(...) and previous subscripts compose right to left."""
    j = i
    while True:
        if s[j] == ")":
            depth = 0
            while j >= 0:
                if s[j] == ")":
                    depth += 1
                elif s[j] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                j -= 1
            if j < 0:
                return None
            # a call f(...) — include the name; grouping parens after a
            # keyword (e.g. CASE WHEN (x)) stop here
            k = j - 1
            while k >= 0 and s[k].isspace():
                k -= 1
            if k >= 0 and (s[k].isalnum() or s[k] == "_"):
                w_end = k
                while k >= 0 and (s[k].isalnum() or s[k] == "_"):
                    k -= 1
                word = s[k + 1 : w_end + 1].upper()
                if word in _SUBSCRIPT_KEYWORDS:
                    return j  # grouped (expr): base starts at the '('
                j = k + 1  # function name included
            # else: base starts at the '(' itself
        elif s[j].isalnum() or s[j] == "_":
            while j >= 0 and (s[j].isalnum() or s[j] == "_"):
                j -= 1
            j += 1
        else:
            return None
        # extend left over a dotted chain: tbl.col / a.b(...)
        k = j - 1
        while k >= 0 and s[k].isspace():
            k -= 1
        if k >= 0 and s[k] == ".":
            j = k - 1
            continue
        return j


_SUBSCRIPT_KEYWORDS = {
    "AND", "OR", "NOT", "THEN", "ELSE", "WHEN", "IN", "ON", "BY",
    "SELECT", "WHERE", "END", "CASE", "AS", "FROM", "JOIN", "LIKE",
    "BETWEEN", "IS", "NULL", "DISTINCT", "ALL", "UNION", "EXCEPT",
    "INTERSECT", "HAVING", "GROUP", "ORDER", "LIMIT", "OVER",
}


def _rw_brackets(s: str) -> str:
    """One innermost bracket pair per pass: literal → array(...),
    subscript → element_at(base, idx); loop to fixpoint."""
    while True:
        # innermost '[' = one whose body has no '['
        m = re.search(r"\[[^\[\]]*\]", s)
        if m is None:
            return s
        start, end = m.start(), m.end() - 1
        body = s[start + 1 : end].strip()
        # what precedes decides literal vs subscript
        k = start - 1
        while k >= 0 and s[k].isspace():
            k -= 1
        prev = s[k] if k >= 0 else ""
        is_subscript = prev != "" and (prev.isalnum() or prev in "_)]" or prev == "\x00")
        if is_subscript:
            # identifiers that are actually keywords start a literal
            if prev.isalnum() or prev == "_":
                j = k
                while j >= 0 and (s[j].isalnum() or s[j] == "_"):
                    j -= 1
                if s[j + 1 : k + 1].upper() in _SUBSCRIPT_KEYWORDS:
                    is_subscript = False
        if is_subscript:
            b0 = _expr_start(s, k)
            if b0 is None:
                raise ValueError(f"cannot find subscript base before {start}: {s[max(0,start-40):start]!r}")
            base = s[b0 : k + 1]
            # index shape decides the wrapper (ADVICE r9): a stashed
            # string literal is a map/struct key — element_at takes it
            # verbatim (CAST .. AS INT on 'k' only failed at runtime
            # because ANSI mode is on, a silent NULL otherwise); a
            # DuckDB slice (a:b) has no element_at equivalent — raise;
            # anything else is a numeric index expression, cast as
            # before (DuckDB coerces float subscripts).
            if re.fullmatch(r"\x00\d+\x00", body):
                s = s[:b0] + f"element_at({base}, {body})" + s[end + 1 :]
            elif ":" in body:
                raise ValueError(
                    f"unsupported slice subscript [{body}] at {start} — "
                    "no Spark element_at equivalent"
                )
            else:
                s = s[:b0] + f"element_at({base}, CAST({body} AS INT))" + s[end + 1 :]
        else:
            s = s[:start] + f"array({body})" + s[end + 1 :]


# ---------------------------------------------------------------------------
# QUALIFY
# ---------------------------------------------------------------------------

_TAIL_KW = re.compile(
    r"\b(ORDER\s+BY|LIMIT|UNION|INTERSECT|EXCEPT)\b", flags=re.IGNORECASE
)


def _rw_qualify(s: str) -> str:
    """SELECT <cols> FROM <rest> QUALIFY <pred> [tail] →
    SELECT * EXCEPT (__q) FROM (SELECT <cols>, <pred> AS __q FROM
    <rest>) WHERE __q [tail] — repeated for every QUALIFY, innermost
    (rightmost) first."""
    while True:
        hits = list(re.finditer(r"\bQUALIFY\b", s, flags=re.IGNORECASE))
        if not hits:
            return s
        m = hits[-1]
        # ---- find this QUALIFY's SELECT: scan backwards at depth 0
        depth = 0
        sel = None
        for j in range(m.start() - 1, -1, -1):
            ch = s[j]
            if ch == ")":
                depth += 1
            elif ch == "(":
                depth -= 1
                if depth < 0:
                    break
            elif depth == 0 and ch in "Ss":
                if re.match(r"SELECT\b", s[j:], flags=re.IGNORECASE) and (
                    j == 0 or not (s[j - 1].isalnum() or s[j - 1] == "_")
                ):
                    sel = j
                    break
        if sel is None:
            raise ValueError("QUALIFY without a matching SELECT")
        # ---- find the predicate's end: next top-level tail keyword or
        # the enclosing subquery's close, or end of string
        depth = 0
        end = len(s)
        j = m.end()
        while j < len(s):
            ch = s[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth < 0:
                    end = j
                    break
            elif depth == 0:
                t = _TAIL_KW.match(s, j)
                if t:
                    end = j
                    break
            j += 1
        pred = s[m.end() : end].strip()
        inner = s[sel : m.start()].rstrip()
        # split the inner SELECT into its select list and FROM-onwards
        # at the first top-level FROM
        depth = 0
        from_at = None
        for j in range(len("SELECT"), len(inner)):
            ch = inner[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0 and ch in "Ff":
                if re.match(r"FROM\b", inner[j:], flags=re.IGNORECASE) and not (
                    inner[j - 1].isalnum() or inner[j - 1] == "_"
                ):
                    from_at = j
                    break
        if from_at is None:
            raise ValueError("QUALIFY SELECT without a FROM clause")
        sel_list = inner[len("SELECT") : from_at].strip()
        from_part = inner[from_at:].strip()
        rewritten = (
            f"SELECT * EXCEPT (__q) FROM (SELECT {sel_list}, "
            f"({pred}) AS __q {from_part}) WHERE __q "
        )
        s = s[:sel] + rewritten + s[end:]


# ---------------------------------------------------------------------------
# multiple unnest() in one SELECT
# ---------------------------------------------------------------------------

_SELECT_KW = re.compile(r"\bSELECT\b", flags=re.IGNORECASE)
_UNNEST_ENTRY = re.compile(
    r"\s*unnest\s*\((.*)\)\s*AS\s*([A-Za-z_]\w*)\s*$",
    flags=re.IGNORECASE | re.DOTALL,
)


def _balanced(s: str) -> bool:
    d = 0
    for c in s:
        if c == "(":
            d += 1
        elif c == ")":
            d -= 1
            if d < 0:
                return False
    return d == 0


def _rw_multi_unnest(s: str, lits: list[str]) -> str:
    """DuckDB zips multiple ``unnest()``s in one SELECT positionally
    (longest list wins, shorter sides NULL-padded); Spark's
    multi-generator SELECT is a CARTESIAN product — measured, silently
    wrong values, the worst failure class for a mechanical shim. Two
    ADJACENT top-level ``unnest(E) AS a`` entries fuse into a single
    generator::

        inline(zip_with(E1, E2, (l, r) -> named_struct('a1', l, 'a2', r)))

    — zip_with NULL-pads the shorter side exactly like DuckDB's
    lockstep unnest, and inline() re-expands the pair to two columns
    at the first entry's position. Any other multi-unnest shape
    (3+, non-adjacent, unaliased, nested in an expression) raises so
    nothing mistranslates quietly."""
    pos = 0
    while True:
        m = _SELECT_KW.search(s, pos)
        if not m:
            return s
        # select-list extent: depth-0 scan to FROM / closing paren / end
        i = m.end()
        n = len(s)
        j, depth, end = i, 0, n
        while j < n:
            c = s[j]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    end = j
                    break
                depth -= 1
            elif (
                depth == 0
                and s[j : j + 4].upper() == "FROM"
                and (j + 4 >= n or not (s[j + 4].isalnum() or s[j + 4] == "_"))
                and not (s[j - 1].isalnum() or s[j - 1] == "_")
            ):
                end = j
                break
            j += 1
        # split the select list at depth-0 commas (s-relative spans)
        spans: list[tuple[int, int]] = []
        d, last = 0, i
        for k in range(i, end):
            c = s[k]
            if c == "(":
                d += 1
            elif c == ")":
                d -= 1
            elif c == "," and d == 0:
                spans.append((last, k))
                last = k + 1
        spans.append((last, end))
        un_idx = [
            ix
            for ix, (a, b) in enumerate(spans)
            if re.match(r"\s*unnest\s*\(", s[a:b], flags=re.IGNORECASE)
        ]
        n_unnest = len(re.findall(r"\bunnest\s*\(", s[i:end], flags=re.IGNORECASE))
        if n_unnest <= 1:
            pos = m.end()
            continue
        if len(un_idx) != 2 or n_unnest != 2 or un_idx[1] != un_idx[0] + 1:
            raise ValueError(
                "unsupported multi-unnest SELECT shape — only two ADJACENT "
                "top-level `unnest(expr) AS alias` entries fuse; anything "
                "else would become a cartesian product on Spark"
            )
        parsed = []
        for ix in un_idx:
            a, b = spans[ix]
            em = _UNNEST_ENTRY.match(s[a:b])
            if not em or not _balanced(em.group(1)):
                raise ValueError(
                    f"multi-unnest entry not of the form `unnest(expr) AS "
                    f"alias`: {s[a:b].strip()[:80]!r}"
                )
            parsed.append((em.group(1), em.group(2)))
        (e1, a1), (e2, a2) = parsed
        f1, f2 = _lit(lits, f"'{a1}'"), _lit(lits, f"'{a2}'")
        fused = (
            f"inline(zip_with({e1}, {e2}, "
            f"(__uz1, __uz2) -> named_struct({f1}, __uz1, {f2}, __uz2)))"
        )
        s = s[: spans[un_idx[0]][0]] + " " + fused + s[spans[un_idx[1]][1] :]
        pos = m.start() + 1


# ---------------------------------------------------------------------------
# alias-in-WHERE inlining (opt-in)
# ---------------------------------------------------------------------------

# NOT named _CLAUSE_END: a previous revision shadowed the module-level
# _CLAUSE_END above (the one the ASOF scanner uses to find the end of
# its ON condition), which made ASOF LEFT JOIN followed by WHERE or a
# second join swallow the trailing clause into the condition.
_WHERE_CLAUSE_END = re.compile(
    r"\b(GROUP\s+BY|ORDER\s+BY|HAVING|LIMIT|QUALIFY|UNION|INTERSECT|EXCEPT|WINDOW)\b",
    flags=re.IGNORECASE,
)


def _depth0_spans(s: str, i: int, end: int) -> list[tuple[int, int]]:
    """Spans of the depth-0 comma-separated entries of s[i:end]
    (depth counts parens, brackets, and braces alike)."""
    spans, d, last = [], 0, i
    for k in range(i, end):
        c = s[k]
        if c in "([{":
            d += 1
        elif c in ")]}":
            d -= 1
        elif c == "," and d == 0:
            spans.append((last, k))
            last = k + 1
    spans.append((last, end))
    return spans


def _rw_alias_in_where(s: str) -> str:
    """DuckDB lets a WHERE clause reference a select-list alias of the
    SAME block (``SELECT len(sh) AS n ... WHERE n > 0``); Spark resolves
    WHERE against the FROM relation only. Inline the defining expression
    textually — ``WHERE (len(sh)) > 0`` — which matches DuckDB's
    semantics (alias substitution happens before evaluation; WHERE runs
    pre-projection either way). OPT-IN (``inline_where_aliases=True``):
    if an alias NAME also names a column of the FROM relation, DuckDB
    prefers the column while this rewrite would inline the alias — a
    mechanical shim cannot see the catalog, so the caller vouches that
    no shadowing exists (true for the one registry user,
    corpus_build_full's ``ex`` CTE). Generator-valued aliases (unnest)
    raise: a pre-expansion WHERE cannot evaluate them."""
    pos = 0
    while True:
        m = _SELECT_KW.search(s, pos)
        if not m:
            return s
        i, n = m.end(), len(s)
        j, depth, from_at = i, 0, None
        while j < n:
            c = s[j]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            elif (
                depth == 0
                and s[j : j + 4].upper() == "FROM"
                and not (s[j - 1].isalnum() or s[j - 1] == "_")
                and (j + 4 >= n or not (s[j + 4].isalnum() or s[j + 4] == "_"))
            ):
                from_at = j
                break
            j += 1
        pos = m.end()
        if from_at is None:
            continue
        aliases: dict[str, str] = {}
        for a, b in _depth0_spans(s, i, from_at):
            am = re.search(r"\s+AS\s+([A-Za-z_]\w*)\s*$", s[a:b], flags=re.IGNORECASE)
            if am:
                aliases[am.group(1)] = s[a:b][: am.start()].strip()
        if not aliases:
            continue
        # depth-0 WHERE after FROM, extent to a depth-0 clause keyword /
        # closing paren / end
        j, depth, where_at = from_at + 4, 0, None
        while j < n:
            c = s[j]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            elif (
                depth == 0
                and s[j : j + 5].upper() == "WHERE"
                and not (s[j - 1].isalnum() or s[j - 1] == "_")
            ):
                where_at = j
                break
            j += 1
        if where_at is None:
            continue
        j, depth, where_end = where_at + 5, 0, n
        while j < n:
            c = s[j]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    where_end = j
                    break
                depth -= 1
            elif depth == 0:
                cm = _WHERE_CLAUSE_END.match(s, j)
                if cm and not (s[j - 1].isalnum() or s[j - 1] == "_"):
                    where_end = j
                    break
            j += 1
        where = s[where_at:where_end]
        new_where = where
        for name, expr in aliases.items():
            pat = re.compile(rf"(?<![\w.]){re.escape(name)}\b(?!\s*\()")
            if not pat.search(new_where):
                continue
            if re.search(r"\bunnest\s*\(", expr, flags=re.IGNORECASE):
                raise ValueError(
                    f"WHERE references generator-valued alias {name!r} — "
                    "cannot inline an unnest into a pre-expansion WHERE"
                )
            new_where = pat.sub(f"({expr})", new_where)
        if new_where != where:
            s = s[:where_at] + new_where + s[where_end:]
    return s


# ---------------------------------------------------------------------------
# simple renames
# ---------------------------------------------------------------------------

_RENAMES = [
    # longest-first so list_transform never half-matches as list
    ("regexp_split_to_array", "split"),
    ("string_split_regex", "split"),
    ("string_split", "split"),
    ("list_transform", "transform"),
    ("list_distinct", "array_distinct"),
    ("list_contains", "array_contains"),
    ("list_intersect", "array_intersect"),
    ("list_filter", "filter"),
    ("list_min", "array_min"),
    ("list_max", "array_max"),
    ("list_sort", "array_sort"),
    ("list_unique", "__list_unique"),  # placeholder; expanded below
    ("array_to_string", "array_join"),
    ("json_extract_string", "get_json_object"),
    ("quantile_cont", "percentile"),
    ("unnest", "explode"),
    ("unicode", "ascii"),
    ("len", "cardinality"),
    ("list", "collect_list"),
]


def _rw_renames(s: str) -> str:
    for src, dst in _RENAMES:
        s = re.sub(rf"\b{src}\s*\(", f"{dst}(", s, flags=re.IGNORECASE)
    s = _rewrite_calls(
        s, "list_sum",
        lambda a: (
            f"aggregate({a[0]}, CAST(0 AS DOUBLE), (__a, __x) -> __a + __x)"
            if len(a) == 1 else None
        ),
    )
    s = _rewrite_calls(
        s, "__list_unique",
        lambda a: f"cardinality(array_distinct({a[0]}))" if len(a) == 1 else None,
    )
    return s


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------


_DEC_LIT = re.compile(r"(?<![\w.])(\d+\.\d+(?:[eE][+-]?\d+)?)(?![\w.])")


def translate_duckdb(
    query: str,
    double_literals: bool = False,
    inline_where_aliases: bool = False,
) -> str:
    """Translate a DuckDB SQL string to Spark SQL. Mechanical and
    conservative: constructs it does not recognize pass through
    unchanged (and then fail loudly in Spark's parser/analyzer —
    nothing is silently approximated beyond the certified rules).

    ``double_literals=True`` additionally wraps every user-authored
    decimal literal (``0.4``, ``500.0``) in ``CAST(.. AS DOUBLE)``.
    Spark parses a bare decimal literal as DECIMAL(p,s) and keeps
    arithmetic over it on the exact-decimal path, while DuckDB promotes
    mixed int/decimal arithmetic to DOUBLE — at an exact ``.xxxx5``
    FLOOR boundary the two round differently (the 1-row ULP drift that
    demoted text_quality_filter in r9). OPT-IN per query because the
    flip is a real semantics change: a query relying on DuckDB's exact
    decimal-literal arithmetic (pure decimal sums) would lose exactness.
    Applied to the masked string right after _protect, so literals the
    REWRITES mint later are never touched and string contents never
    match (masks carry no '.')."""
    s, lits = _protect(query)
    if inline_where_aliases:
        s = _rw_alias_in_where(s)
    if double_literals:
        s = _DEC_LIT.sub(lambda m: f"CAST({m.group(1)} AS DOUBLE)", s)

    # structural rewrites first
    s = _rw_asof_left_join(s)
    s = _rw_multi_unnest(s, lits)
    s = _rw_list_comprehensions(s)
    s = _rw_struct_literals(s)

    # composite, paren-matched rewrites (before renames: they key on
    # the DuckDB names; before brackets: list_zip lambdas use v[1])
    s = _rw_list_reduce(s)
    s = _rw_list_prepend(s)
    s = _rw_list_zip_transform(s)
    s = _rw_list_slice(s)
    s = _rw_trim_chars(s)
    s = _rw_shifts(s)
    s = _rw_division(s)
    s = _rw_time_bucket(s, lits)
    s = _rw_epoch(s)
    s = _rw_json_valid(s)
    s = _rw_isinf(s)
    s = _rw_regexp_flags(s, lits)
    s = _rw_encode(s)
    s = _rw_ordered_agg(s)
    s = _rw_range_expr(s)

    # typed empty-array casts: AS BIGINT[] → AS ARRAY<BIGINT> (before
    # the bracket pass, which would read '[]' as an empty literal; the
    # AS anchor keeps THEN []/ELSE [] literals out)
    s = re.sub(
        r"\b(AS\s+)([A-Za-z_]\w*)\s*\[\s*\]", r"\1ARRAY<\2>", s,
        flags=re.IGNORECASE,
    )

    s = _rw_brackets(s)
    s = _rw_qualify(s)
    s = _rw_renames(s)

    # operators / keywords
    s = s.replace("//", " div ")
    s = re.sub(r"\bVARCHAR\b(?!\s*\()", "STRING", s, flags=re.IGNORECASE)
    s = re.sub(r"\bEXCLUDE\b(\s*\()", r"EXCEPT\1", s, flags=re.IGNORECASE)

    # literals minted by rewrites above
    s = s.replace("\x01dollar\x01", _lit(lits, "'$'"))
    s = s.replace("\x01inf\x01", _lit(lits, "'Infinity'"))
    s = s.replace("\x01utf8\x01", _lit(lits, "'utf-8'"))
    return _restore(s, lits)

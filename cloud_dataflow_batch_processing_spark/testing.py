"""Pipeline-assertion DSL — the Beam testing idiom on DataFrames.

Reference surface: ``assert_that(pcoll, equal_to(expected))``
(beam/testing/util.py:128,107), ``is_empty`` (:119). Order-insensitive
by definition (PCollections are unordered bags; DataFrames too unless
sorted) — comparisons sort a canonical tuple form.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame


def _canon(rows: Iterable[Any]) -> list[tuple]:
    out = []
    for r in rows:
        if hasattr(r, "__fields__"):  # Row
            out.append(tuple(r))
        elif isinstance(r, (tuple, list)):
            out.append(tuple(r))
        elif isinstance(r, dict):
            out.append(tuple(v for _, v in sorted(r.items())))
        else:
            out.append((r,))
    return sorted(out, key=repr)


def equal_to(expected: Iterable[Any]) -> Callable[[list], None]:
    """Beam twin: beam/testing/util.py:107."""

    def check(actual: list) -> None:
        a, e = _canon(actual), _canon(expected)
        assert a == e, f"assert_that failed:\n  actual:   {a}\n  expected: {e}"

    return check


def is_empty() -> Callable[[list], None]:
    """Beam twin: beam/testing/util.py:119."""

    def check(actual: list) -> None:
        assert actual == [], f"expected empty, got {actual}"

    return check


def assert_that(df: DataFrame, matcher: Callable[[list], None]) -> None:
    """Beam twin: beam/testing/util.py:128 — collect and match."""
    matcher(df.collect())

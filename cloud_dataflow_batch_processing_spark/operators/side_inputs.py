"""Side inputs — Beam's broadcast idiom as Spark broadcasts.

Reference surface: ``AsSingleton/AsIter/AsList/AsDict/AsMultiMap``
(beam/pvalue.py:379-512), consumed as extra DoFn args replaced at
execution time (beam/transforms/core.py:387). The reference stack's
broadcast-hash-join idiom (beam/examples/cookbook/bigquery_side_input.py)
maps to ``F.broadcast`` joins; small collected values map to Spark
broadcast variables / literals.

Scale note: ``as_list``/``as_dict`` collect to the driver — correct only
for genuinely small sides (same constraint Beam has: side inputs are
re-read per bundle). For anything large, use ``broadcast_join``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F


def as_singleton(df: DataFrame) -> Any:
    """Beam twin: AsSingleton (beam/pvalue.py:379). Requires exactly one
    row, one column."""
    rows = df.limit(2).collect()
    if len(rows) != 1 or len(rows[0]) != 1:
        raise ValueError("as_singleton requires a 1-row, 1-column frame")
    return rows[0][0]


def as_list(df: DataFrame) -> list[Any]:
    """Beam twin: AsList (beam/pvalue.py:459)."""
    return [r[0] for r in df.collect()]


def as_dict(df: DataFrame) -> dict[Any, Any]:
    """Beam twin: AsDict (beam/pvalue.py:485) — 2-column KV frame."""
    return {r[0]: r[1] for r in df.collect()}


def as_multimap(df: DataFrame) -> dict[Any, list[Any]]:
    """Beam twin: AsMultiMap (beam/pvalue.py:512)."""
    out: dict[Any, list[Any]] = {}
    for r in df.collect():
        out.setdefault(r[0], []).append(r[1])
    return out


def broadcast_join(
    big: DataFrame, small: DataFrame, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """The scalable side-input: broadcast-hash-join the small side.
    Spark twin of passing AsDict to a DoFn and probing it per element —
    but executed JVM-side with no per-row Python."""
    return big.join(F.broadcast(small), on=on, how=how)

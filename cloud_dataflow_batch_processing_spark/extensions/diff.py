"""Snapshot diff: added / removed / changed rows between two versions
of a keyed table — the CDC/reconciliation primitive that pairs with
the order-independent table fingerprint (queries_more.py::
table_fingerprint): the fingerprint says *whether* two copies diverge,
the diff says *which rows*.

Scale posture: each side is reduced to (key, row_hash) before the
join — the comparison payload is one BIGINT regardless of row width,
column pruning reaches the scans, and the full-outer hash join on the
key is the semantic minimum for a diff. No collects, no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

P = 1_000_000_007


def row_signature(cols: Sequence[Column]) -> Column:
    """Engine-neutral polynomial hash of the compared columns (each
    already integral; reduce strings/doubles yourself first).

    NULL-safe (ADVICE r3): each column folds TWO terms — the value
    coalesced to 0 and a 0/1 null flag — so a NULL column yields a
    deterministic signature distinct from value 0 instead of nulling
    the whole hash (which made snapshot_diff classify both-side rows
    as 'added' and never 'removed'/'changed')."""
    h = F.lit(0).cast("long")
    for c in cols:
        v = F.coalesce((c.cast("long") % P + P) % P, F.lit(0).cast("long"))
        flag = F.when(c.isNull(), F.lit(1)).otherwise(F.lit(0)).cast("long")
        h = (h * 31 + v) % P
        h = (h * 31 + flag) % P
    return h


def row_signature_sql(col_exprs: Sequence[str]) -> str:
    """DuckDB twin of ``row_signature`` over already-integral SQL
    expressions — kept adjacent so the two formulas can't drift."""
    h = "CAST(0 AS BIGINT)"
    for e in col_exprs:
        v = f"COALESCE((({e}) % {P} + {P}) % {P}, 0)"
        flag = f"(CASE WHEN ({e}) IS NULL THEN 1 ELSE 0 END)"
        h = f"(({h}) * 31 + {v}) % {P}"
        h = f"(({h}) * 31 + {flag}) % {P}"
    return h


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare: Sequence[Column],
) -> DataFrame:
    """Full-outer diff on ``keys``: emits one row per differing key with
    ``change`` in ('added', 'removed', 'changed') plus both signatures.
    Unchanged rows are dropped pre-shuffle-free? No — they drop after
    the join, but each side ships only (keys, one BIGINT), so the
    shuffle is as narrow as a diff can be."""
    keys = list(keys)
    o = old.select(*keys, row_signature(compare).alias("sig_old"))
    n = new.select(*keys, row_signature(compare).alias("sig_new"))
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("sig_old").isNull(), F.lit("added"))
        .when(F.col("sig_new").isNull(), F.lit("removed"))
        .when(F.col("sig_old") != F.col("sig_new"), F.lit("changed"))
    )
    return (
        j.select(*keys, "sig_old", "sig_new", change.alias("change"))
        .filter(F.col("change").isNotNull())
    )

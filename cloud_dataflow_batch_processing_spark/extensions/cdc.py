"""Change-data-capture primitives: apply a changeset to a snapshot
(merge/upsert, the lakehouse MERGE INTO shape) and build SCD2 validity
history from a change log — the ingestion half of the CDC story whose
detection half is ``extensions/diff.py::snapshot_diff``.

Scale posture (100 TB):
- ``apply_changes`` is one left-anti join (base vs delete/upsert keys)
  plus a union of the upsert rows: both sides shuffle on the merge key
  once — exactly what an engine-native MERGE plans. The changeset is
  typically daily-increment-sized: broadcastable, making the anti-join
  shuffle-free on the base side (AQE decides by size).
- ``scd2_intervals`` is one window over (key, ts) — a single hash
  shuffle on the key, the partitioning the history table wants anyway.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

OP_COL = "op"  # 'U' = upsert (insert-or-update), 'D' = delete


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = OP_COL,
) -> DataFrame:
    """MERGE a changeset into a snapshot (SCD1: latest value wins, no
    history): rows of ``base`` whose key appears in ``changes`` are
    replaced (op='U') or dropped (op='D'); 'U' rows with new keys are
    inserted. ``changes`` must carry the full row schema of ``base``
    plus ``op_col``, at most one row per key (enforce upstream with a
    last-wins dedup — ``exact_dedup``/max-ts — like any MERGE).

    Op values are validated IN the plan (ADVICE r4): any op outside
    ('U', 'D') — including NULL — raises at execution time instead of
    silently deleting the row (the old behavior: an unrecognized op's
    key was anti-joined out of base but never re-inserted). The check
    is a ``raise_error`` branch folded into the changeset projection —
    zero extra actions, fully distributed, fail-fast on first bad row."""
    keys = list(key_cols)
    checked_op = F.when(F.col(op_col).isin("U", "D"), F.col(op_col)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"apply_changes: unrecognized {op_col!r} value "),
                F.coalesce(F.col(op_col).cast("string"), F.lit("NULL")),
                F.lit(" (expected 'U' or 'D')"),
            )
        )
    )
    changes = changes.withColumn(op_col, checked_op)
    survivors = base.join(changes.select(*keys), on=keys, how="left_anti")
    upserts = changes.filter(F.col(op_col) == "U").drop(op_col)
    return survivors.unionByName(upserts)


def apply_changes_sql(
    base: str, changes: str, key_cols: Sequence[str], op_col: str = OP_COL
) -> str:
    """Oracle twin of ``apply_changes`` over the same relations."""
    keys = list(key_cols)
    on = " AND ".join(f"b.{k} = c.{k}" for k in keys)
    return f"""
    SELECT b.* FROM {base} b
    WHERE NOT EXISTS (SELECT 1 FROM {changes} c WHERE {on})
    UNION ALL
    SELECT * EXCLUDE ({op_col}) FROM {changes} WHERE {op_col} = 'U'
    """


def scd2_intervals(
    log: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
    current_sentinel=None,
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a change log (one row per
    observed state) into validity intervals — ``valid_from`` = the
    row's timestamp, ``valid_to`` = the NEXT change's timestamp for the
    key (exclusive), ``is_current`` marks the open interval.
    ``tiebreak_cols`` must make (key, ts, tiebreak) a total order or
    interval endpoints are nondeterministic. One window = one shuffle
    on the key."""
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(*order)
    nxt = F.lead(ts_col).over(w)
    out = log.withColumn("valid_from", F.col(ts_col)).withColumn("valid_to", nxt)
    if current_sentinel is not None:
        out = out.withColumn(
            "valid_to", F.coalesce("valid_to", F.lit(current_sentinel))
        )
    return out.withColumn("is_current", F.lead(ts_col).over(w).isNull())


def scd2_intervals_sql(
    source: str,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> str:
    keys = ", ".join(key_cols)
    # NULLS FIRST pins EVERY order column to the Spark side's ordering
    # (Spark ASC defaults to NULLS FIRST, DuckDB to NULLS LAST): a
    # change row with an unknown timestamp sorts as the earliest
    # version on both engines (adversarial sweep), and a NULL tiebreak
    # value cannot flip interval endpoints cross-engine either
    # (ADVICE r8 — same bug class, tiebreak columns).
    order = ", ".join(
        f"{c} NULLS FIRST" for c in (ts_col, *tiebreak_cols)
    )
    return f"""
    SELECT *,
           {ts_col} AS valid_from,
           LEAD({ts_col}) OVER (PARTITION BY {keys} ORDER BY {order}) AS valid_to,
           LEAD({ts_col}) OVER (PARTITION BY {keys} ORDER BY {order}) IS NULL
             AS is_current
    FROM {source}
    """

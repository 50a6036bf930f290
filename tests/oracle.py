"""Local mimic of the driver's DuckDB correctness gate.

Runs a registered Spark query and its oracle SQL side by side, then
compares row count, column names, and values (columns sorted by name,
rows sorted, exact equality for non-floats, tight tolerance for
floats). Catching a mismatch here at sf0.001/sf0.01 means catching it
before the driver does at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from cloud_dataflow_batch_processing_spark.sources.testdata import TABLES, table_path


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # Canonicalize the missing marker BEFORE stringifying:
            # Spark's toPandas ships SQL NULL as None, DuckDB's .df()
            # (and Arrow-backed UDF outputs) as NaN — astype(str) would
            # read the same missing value as 'None' vs 'nan' (first hit:
            # classifier_quality_score's nullable BOOLEAN on the
            # adversarial corpus). '<NULL>' also keeps missing distinct
            # from literal 'nan'/'None' strings.
            df[c] = df[c].where(pd.notna(df[c]), "<NULL>").astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> list[str]:
    errors: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        errors.append(f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}")
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        errors.append(
            f"{name}: columns {sorted(spark_pdf.columns)} != oracle {sorted(oracle_pdf.columns)}"
        )
    if errors:
        return errors
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        # Dtype-kind drift (int on one side, float on the other) means the
        # engines disagree on the column TYPE — the driver hashes typed
        # values, so this fails there even when the values coerce equal
        # (e.g. DuckDB list_sum returning HUGEINT → pandas float64).
        if pd.api.types.is_integer_dtype(av) != pd.api.types.is_integer_dtype(bv):
            errors.append(
                f"{name}: column {c}: dtype kind mismatch spark={av.dtype} "
                f"oracle={bv.dtype} (driver hashes typed values — fix the oracle cast)"
            )
            continue
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            # STRICT bitwise equality — the driver hashes exact values,
            # so a last-ulp difference is a real failure, not noise.
            bad = 0
            worst = 0.0
            # the canonical '<NULL>' marker reads back as NaN here (a
            # float column's missing value), matching NaN==NaN below
            fa = [float("nan") if str(x) == "<NULL>" else float(x) for x in av]
            fb = [float("nan") if str(y) == "<NULL>" else float(y) for y in bv]
            for x, y in zip(fa, fb):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    bad += 1
                    worst = max(worst, abs(x - y))
            if bad:
                errors.append(
                    f"{name}: column {c}: {bad} float bitwise mismatches (worst |Δ|={worst:.3e})"
                )
        else:
            neq = (av.astype(str) != bv.astype(str))
            if neq.any():
                i = int(neq.idxmax())
                errors.append(
                    f"{name}: column {c}: {int(neq.sum())} mismatches, first at sorted row {i}: "
                    f"spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
                )
    return errors


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, list[str]]:
    from cloud_dataflow_batch_processing_spark.queries import REGISTRY, queries

    queries()  # populate submodule registries

    from cloud_dataflow_batch_processing_spark.caching import release_managed_caches

    con = duckdb_con(sf_dir)
    failures: dict[str, list[str]] = {}
    for name, q in REGISTRY.items():
        if names and name not in names:
            continue
        if not q.oracle:
            continue
        spark_pdf = q.fn(spark, sf_dir).toPandas()
        release_managed_caches()  # keep session storage flat across queries
        oracle_pdf = con.execute(q.oracle).df()
        errs = compare_frames(spark_pdf, oracle_pdf, name)
        if errs:
            failures[name] = errs
    return failures

"""Z-order data layout: multi-dimensional clustering for scan pruning.

The 100 TB problem this solves: parquet row-group skipping and
partition pruning are one-dimensional — sort by ``o_custkey`` and
predicates on ``o_totalprice`` still scan everything. Interleaving the
bits of both columns into one z-value and range-partitioning + sorting
by it keeps BOTH dimensions' min/max statistics tight in every file and
row group, so a filter on either column (or both) skips most of the
data. This is the same layout trick Delta/Iceberg expose as OPTIMIZE
ZORDER BY; here it is built from Spark primitives: a codegen bit-fold
expression + ``repartitionByRange`` + ``sortWithinPartitions``.

The z-value expression uses only shifts/and/or on BIGINT, so a DuckDB
oracle computes the identical values — the curve itself is
driver-checkable, and the clustering benefit is asserted as a
partition-spread bound in tests (each output partition covers a small
slice of each dimension's range, which is precisely the property
min/max skipping needs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def zvalue(x: Column, y: Column, bits: int) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    bit b of x lands at position 2b, bit b of y at 2b+1. Monotone in
    the Morton / Z curve order. Pure codegen (no UDF)."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x.cast("long"), b) % 2, 2 * b).cast("long")
        ).bitwiseOR(F.shiftleft(F.shiftright(y.cast("long"), b) % 2, 2 * b + 1).cast("long"))
    return z


def zvalue_sql(x: str, y: str, bits: int) -> str:
    """DuckDB twin of :func:`zvalue` (same bit layout, BIGINT ops)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    x: str,
    y: str,
    *,
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` on the z-curve over (x, y): range-partition by
    z-value (one exchange — the same shuffle ANY re-layout costs), sort
    within partitions, and keep ``__z`` for inspection. Write the
    result with ``write.parquet`` and every file/row group carries
    tight min/max on BOTH columns."""
    z = zvalue(F.col(x), F.col(y), bits).alias("__z")
    out = df.select("*", z)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "__z")
    else:
        out = out.repartitionByRange("__z")
    return out.sortWithinPartitions("__z")


def clustering_spread(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Diagnostic: per-partition min/max/width of each column — the
    quantity row-group skipping depends on. Aggregates partition-local
    stats only (no extra shuffle beyond the final tiny collect)."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            (F.max(c) - F.min(c)).alias(f"{c}_width"),
        ]
    return df.groupBy(F.spark_partition_id().alias("pid")).agg(*aggs)

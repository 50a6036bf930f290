"""Probabilistic sketch primitives: Bloom-filter membership.

The 100 TB use case: a bounded reference set (benchmark eval
fingerprints, a URL blocklist, already-ingested doc ids) probed by
every row of a huge corpus. An exact semi-join shuffles the corpus on
the membership key; a Bloom probe is O(k) bit tests per row against a
broadcast bit array — no shuffle, no join, with a bounded
false-positive rate and NO false negatives (so it is safe as a
pre-filter: survivors can be exact-checked, and at typical sizing the
exact pass touches ~0 rows).

Engine-neutral by construction, like every hash in this repo: bit
positions come from k independent affine hashes over the same
1e9+7 field as functions/text.py, so a DuckDB oracle can rebuild the
IDENTICAL bit set and the driver gate checks the Bloom verdict
value-for-value — stronger than the usual "error within envelope"
check an opaque murmur-based filter would force (cf. the
approx_distinct / approx_percentile envelope pattern).

Sizing: for n members and m bits, the false-positive rate with k
hashes is ~(1 - e^(-kn/m))^k; the classic optimum is k = (m/n) ln 2.
``bloom_bits`` is pure construction; callers pick m as a power of two.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from cloud_dataflow_batch_processing_spark.functions.text import HASH_MOD as P

# Affine hash family over Z_P, disjoint from the MinHash seeds
# (extensions/dedup.py uses 2j+3 / 7919j+13).
def _seed_a(i: int) -> int:
    return 4 * i + 5


def _seed_b(i: int) -> int:
    return 104_729 * i + 17


def bloom_positions(value_mod_p: int, m_bits: int, k: int) -> list[int]:
    """Driver-side bit positions for one value (already reduced mod P)."""
    return [((_seed_a(i) * value_mod_p + _seed_b(i)) % P) % m_bits for i in range(k)]


def bloom_bits(values: Iterable[int], m_bits: int, k: int) -> np.ndarray:
    """Build the packed bit array (uint8, little-endian bit order) from
    an iterable of member values. Values are reduced mod P first so the
    affine products stay inside int64 on every engine."""
    bits = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    for v in values:
        for pos in bloom_positions(int(v) % P, m_bits, k):
            bits[pos >> 3] |= 1 << (pos & 7)
    return bits


def bloom_from_df(df: DataFrame, col: str, m_bits: int, k: int) -> np.ndarray:
    """Collect a (small, side-input-sized) member column and build the
    filter driver-side — the same contract as operators/side_inputs.py:
    the member set is the bounded side of the asymmetry; the corpus
    side never collects."""
    values = [r[0] for r in df.select(col).distinct().collect()]
    return bloom_bits(values, m_bits, k)


def bloom_might_contain(
    df: DataFrame, col: str | Column, bits: np.ndarray, m_bits: int, k: int
) -> Column:
    """Vectorized membership probe as an Arrow-batched pandas UDF: the
    bit array ships once per executor via a Spark broadcast (not once
    per task in the closure), and each batch is k numpy gathers.
    Per-row cost is O(k) independent of member count — the whole point
    vs an exact semi-join at corpus scale."""
    bc = df.sparkSession.sparkContext.broadcast(bits)
    ks = [( _seed_a(i), _seed_b(i)) for i in range(k)]

    @pandas_udf("boolean")
    def probe(x: pd.Series) -> pd.Series:
        arr = bc.value
        v = (x.to_numpy(dtype=np.int64)) % P
        ok = np.ones(len(v), dtype=bool)
        for a, b in ks:
            pos = ((a * v + b) % P) % m_bits
            ok &= ((arr[pos >> 3] >> (pos & 7)) & 1).astype(bool)
        return pd.Series(ok)

    return probe(F.col(col) if isinstance(col, str) else col)


def bloom_positions_sql(value_expr: str, m_bits: int, k: int) -> str:
    """DuckDB list of the same k bit positions for ``value_expr``."""
    return (
        f"list_transform(range(0, {k}), i -> "
        f"(((4 * i + 5) * ({value_expr} % {P}) + (104729 * i + 17)) % {P}) % {m_bits})"
    )


# ---------------------------------------------------------------------------
# Count-Min sketch: heavy-hitter frequency estimation in sublinear space.
#
# The 100 TB use case: estimated frequencies for EVERY key (hot users,
# hot domains, hot n-grams) without shuffling per-key rows — the sketch
# is depth × width counters regardless of key cardinality, map-side
# partial aggregation does almost all the work, and the single shuffle
# moves at most depth × width × n_partitions partial counters. The
# classic guarantee (Cormode & Muthukrishnan 2005): with width w and
# depth d, est >= true always (one-sided), and est <= true + N·e/w with
# probability 1 - e^-d.
#
# Same engine-neutral affine family as the Bloom filter above (seeds
# disjoint: 6i+7 / 15485863i+19), so a DuckDB oracle rebuilds the
# IDENTICAL counter table and the driver gate checks estimates
# value-for-value, not just "within envelope".
# ---------------------------------------------------------------------------


def _cms_bucket(value_mod_p: Column, i: int, width: int) -> Column:
    a, b = 6 * i + 7, 15_485_863 * i + 19
    return ((F.lit(a) * value_mod_p + F.lit(b)) % F.lit(P)) % F.lit(width)


def cms_bucket_sql(value_expr: str, i: str, width: int) -> str:
    """DuckDB twin of ``_cms_bucket`` (``i`` may be a column name)."""
    return f"(((6 * {i} + 7) * (({value_expr}) % {P}) + (15485863 * {i} + 19)) % {P}) % {width}"


def countmin_sketch(df: DataFrame, key: Column, depth: int, width: int) -> DataFrame:
    """Build the (row, bucket, cnt) counter table for integer ``key``.

    One explode to depth rows per input row, then ONE hash-aggregate
    shuffle bounded by depth × width groups — never by key cardinality.
    ``key`` must be integral; reduce strings with ``rolling_hash`` first.

    NULL keys are excluded (ADVICE r3): a NULL key would hash to a NULL
    bucket that inflates the counter table yet can never match a probe
    (NULL != NULL in the join), silently breaking the one-sided
    est >= true guarantee. Both build and probe drop NULLs, mirroring
    asof_join's NULL-key handling.
    """
    df = df.filter(key.isNotNull())
    v = (key.cast("long") % P + P) % P
    rows = df.select(
        F.posexplode(F.array(*[_cms_bucket(v, i, width) for i in range(depth)])).alias(
            "row_i", "bucket"
        )
    )
    return rows.groupBy("row_i", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def countmin_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int, width: int
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over the d counters the
    key hashes to. The sketch side is depth × width rows — broadcast —
    so estimation adds no shuffle beyond the per-key min aggregate.
    NULL keys are dropped, matching the build side (see
    ``countmin_sketch``)."""
    keys = keys.filter(F.col(key_col).isNotNull())
    v = (F.col(key_col).cast("long") % P + P) % P
    probes = keys.select(
        key_col,
        F.posexplode(F.array(*[_cms_bucket(v, i, width) for i in range(depth)])).alias(
            "row_i", "bucket"
        ),
    )
    joined = probes.join(F.broadcast(sketch), ["row_i", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count")
    )


def countmin_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two Count-Min sketches built with the same (depth, width):
    counter-wise sum — CMS is a linear sketch, so sketch(A) ⊕ sketch(B)
    == sketch(A ∪ B) exactly (unit-pinned). This is what makes the
    counter table shard/day-mergeable at 100 TB: build per partition
    or per day, merge in O(depth × width)."""
    return (
        a.unionByName(b)
        .groupBy("row_i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )

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


# ---------------------------------------------------------------------------
# HyperLogLog: deterministic, engine-mirrored distinct-count sketch
# ---------------------------------------------------------------------------
#
# The classic mergeable distinct sketch (Flajolet et al. 2007), built
# engine-neutral like the Bloom/CMS families above: the key is mixed
# with affine rounds over the Mersenne prime 2^31-1 and the
# leading-zero rank comes from a generated CASE chain — every
# expression is ONE shared ANSI-SQL string evaluated by Spark
# (F.expr) and DuckDB verbatim, so the ESTIMATE ITSELF is value-
# certified by the driver gate (the approx_distinct envelope check
# can't do that for Spark's opaque murmur-based HLL++).
#
# Scale posture: per-row (reg, rho) is codegen arithmetic; the
# register table is ONE hash-agg shuffle collapsing to m=256 rows;
# merge = unionByName + max — shard/day-mergeable exactly like the
# CMS counter table. The sum of 2^-maxrho over <=256 registers is
# exact in binary64 (exponents span < 53 bits), so estimates are
# reproducible to the bit across engines, partitionings, and merge
# orders; only the ln() in the small-range correction is libm-
# dependent, which the 4-decimal boundary rounding absorbs.

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers -> rsd ~ 1.04/sqrt(m) = 6.5%
_P1 = 2147483647  # Mersenne prime 2^31 - 1
_P2 = 2147483629  # prime < 2^31; switching moduli breaks linearity
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_HLL_AM2 = _HLL_ALPHA * HLL_M * HLL_M

# Affine maps alone are useless for HLL (the rank word of sequential
# keys stays lattice-structured: measured 80% overestimate). Each
# round here is a QUADRATIC permutation-style mix — x*x % p brings the
# nonlinearity, alternating p between two primes breaks the remaining
# algebraic structure — using only * + % so one SQL string serves both
# engines; every intermediate is provably < 2^63 (x < 2^31, so x*x <
# 2^62 and (p-1)*a stays < 4e18 for the constants below). Measured on
# sequential ints (1k/15k/100k): 1.8% / 9.1% / 4.0% error — within
# the 6.5% rsd envelope a real 31-bit hash gives at m=256.


def _hll_fold_sql(key_expr: str) -> str:
    """Non-negative 31-bit residue of the key."""
    return f"((CAST({key_expr} AS BIGINT) % {_P1} + {_P1}) % {_P1})"


def _hll_quad_sql(x: str, p: int, a: int, b: int, c: int) -> str:
    return f"(((({x}) * ({x}) % {p}) * {a} + ({x}) * {b} + {c}) % {p})"


def hll_reg_sql(key_expr: str) -> str:
    """Register index in [0, HLL_M)."""
    h = _hll_quad_sql(_hll_fold_sql(key_expr), _P1, 1103515245, 12345, 104729)
    h = _hll_quad_sql(h, _P2, 69069, 362437, 997)
    h = _hll_quad_sql(h, _P1, 1013904223, 784588716, 13)
    return f"(({h}) % {HLL_M})"


def hll_w_sql(key_expr: str) -> str:
    """31-bit rank word from an independent quadratic chain."""
    h = f"(({_hll_fold_sql(key_expr)} + 1000003) % {_P1})"
    h = _hll_quad_sql(h, _P2, 48271, 16807, 3571)
    h = _hll_quad_sql(h, _P1, 69621, 30269, 7919)
    h = _hll_quad_sql(h, _P2, 65539, 214013, 2531011)
    return h


def hll_rho_sql(key_expr: str) -> str:
    """rho = 1 + leading zeros of the 31-bit rank word (CASE chain —
    integer-exact and identical in both engines)."""
    w = hll_w_sql(key_expr)
    whens = " ".join(
        f"WHEN ({w}) >= {1 << (30 - i)} THEN {i + 1}" for i in range(31)
    )
    return f"(CASE {whens} ELSE 32 END)"


def hll_rho_from_w_sql(w_col: str) -> str:
    """``hll_rho_sql`` with the rank word already materialized in a
    column: the inline form re-embeds the 4-level quadratic chain in
    every one of the 31 WHEN branches, a ~30x larger expression tree
    that dominated analysis+codegen time on the Spark side (r11: the
    two-step projection cut approx_distinct_hll 2.2s -> below; the
    arithmetic is identical, just factored). The oracle SQL keeps the
    single-expression spelling — values are unchanged either way."""
    whens = " ".join(
        f"WHEN ({w_col}) >= {1 << (30 - i)} THEN {i + 1}" for i in range(31)
    )
    return f"(CASE {whens} ELSE 32 END)"


def hll_register_table(df: DataFrame, key_col: str) -> DataFrame:
    """Build the sketch: (reg, maxrho), one hash-agg shuffle, <= HLL_M
    rows. NULL keys are dropped (they are not elements; mirrors the
    CMS/Bloom NULL posture). Keys must be integral — reduce strings
    with ``functions.text.rolling_hash`` first (the CMS convention);
    ``key_col`` may be any SQL expression string, so
    ``hll_register_table(df, "rolling-hash-sql-expr")`` composes."""
    rows = (
        df.filter(F.expr(f"({key_col}) IS NOT NULL"))
        .select(
            F.expr(hll_reg_sql(key_col)).alias("reg"),
            F.expr(hll_w_sql(key_col)).alias("__w"),
        )
        .select("reg", F.expr(hll_rho_from_w_sql("__w")).alias("rho"))
    )
    return rows.groupBy("reg").agg(F.max("rho").alias("maxrho"))


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge sketches: register-wise max. hll(A) merge hll(B) ==
    hll(A ∪ B) exactly (unit-pinned), so register tables built per
    shard / per day combine in O(m)."""
    return a.unionByName(b).groupBy("reg").agg(F.max("maxrho").alias("maxrho"))


def _hll_estimate_expr() -> Column:
    m = HLL_M
    sp = F.sum(F.pow(F.lit(2.0), -F.col("maxrho").cast("double")))
    c = F.count(F.lit(1))
    v = (F.lit(m) - c).cast("double")
    raw = F.lit(_HLL_AM2) / (sp + v)
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    return F.round(
        F.when((raw <= 2.5 * m) & (v > 0), small).otherwise(raw), 4
    ).alias("est")


def hll_estimate(regs: DataFrame) -> DataFrame:
    """Collapse a register table to the one-row cardinality estimate
    (with the standard small-range linear-counting correction)."""
    return regs.agg(_hll_estimate_expr())


def hll_estimate_sql(key_expr: str, source: str) -> str:
    """Oracle twin: the full build + estimate as one DuckDB query,
    value-identical to hll_estimate(hll_register_table(...))."""
    m = HLL_M
    return f"""
    WITH rr AS (
      SELECT {hll_reg_sql(key_expr)} AS reg, {hll_rho_sql(key_expr)} AS rho
      FROM {source} WHERE ({key_expr}) IS NOT NULL
    ),
    regs AS (SELECT reg, MAX(rho) AS maxrho FROM rr GROUP BY reg),
    s AS (
      SELECT SUM(power(2.0, -CAST(maxrho AS DOUBLE))) AS sp,
             CAST({m} - COUNT(*) AS DOUBLE) AS v
      FROM regs
    )
    SELECT ROUND(CASE WHEN CAST({_HLL_AM2!r} AS DOUBLE) / (sp + v) <= 2.5 * {m}
                       AND v > 0
                 THEN CAST({m} AS DOUBLE) * LN(CAST({m} AS DOUBLE) / v)
                 ELSE CAST({_HLL_AM2!r} AS DOUBLE) / (sp + v) END, 4) AS est
    FROM s
    """


# ---------------------------------------------------------------------------
# Fixed-bin histogram: deterministic, engine-mirrored quantile sketch
# ---------------------------------------------------------------------------
#
# Completes the mergeable-sketch family (Bloom membership, CMS
# frequency, HLL cardinality): a fixed equi-width histogram whose bin
# boundaries come from ARGUMENTS, not data — so build is one hash-agg
# shuffle to <= bins rows, merge is bin-wise sum (linear, like CMS),
# and the quantile estimate (linear interpolation inside the covering
# bin) is exact-deterministic double arithmetic mirrored in SQL. Rank
# error is bounded by the largest bin's population (data-dependent,
# unlike GK's guarantee — the trade for mergeability + a certifiable
# value; Spark's own approx_percentile sketch is merge-order-specific
# and can only be envelope-checked).


def histogram_sketch(
    df: DataFrame, col: str, lo: float, hi: float, bins: int
) -> DataFrame:
    """(bin, cnt) counts of ``col`` over ``bins`` equi-width buckets of
    [lo, hi); values outside clamp to the edge bins, NULLs drop."""
    x = F.col(col).cast("double")
    width = (hi - lo) / bins
    b = F.floor((x - lo) / F.lit(width)).cast("long")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    return (
        df.filter(x.isNotNull())
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bin-wise sum: hist(A) ⊕ hist(B) == hist(A ∪ B) exactly."""
    return a.unionByName(b).groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantile(
    sketch: DataFrame, q: float, lo: float, hi: float, bins: int
) -> DataFrame:
    """One-row estimate of the q-quantile: find the bin where the
    running count crosses ceil(q*n), interpolate linearly inside it.
    Deterministic: integer ranks, exact double interpolation, rounded
    at the boundary."""
    from pyspark.sql import Window

    width = (hi - lo) / bins
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = sketch.withColumn("cum", F.sum("cnt").over(w))
    import math

    n = sketch.agg(F.sum("cnt")).collect()[0][0] or 0
    rank = min(max(1, math.ceil(n * q)), n) if n else 0
    hit = (
        cum.filter(F.col("cum") >= F.lit(rank))
        .orderBy("bin")
        .limit(1)
        .select(
            F.round(
                F.lit(lo)
                + F.col("bin") * F.lit(width)
                + F.lit(width)
                * (F.lit(rank) - (F.col("cum") - F.col("cnt")))
                / F.col("cnt"),
                4,
            ).alias("est")
        )
    )
    return hit


def histogram_quantile_sql(
    col: str, source: str, q: float, lo: float, hi: float, bins: int
) -> str:
    """Oracle twin: build + quantile in one DuckDB query,
    value-identical to histogram_quantile(histogram_sketch(...))."""
    width = (hi - lo) / bins
    return f"""
    WITH h AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((CAST({col} AS DOUBLE) - {lo!r}) / {width!r})
                                 AS BIGINT), 0), {bins - 1}) AS bin,
             COUNT(*) AS cnt
      FROM {source} WHERE {col} IS NOT NULL GROUP BY 1
    ),
    c AS (
      SELECT bin, cnt, SUM(cnt) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER () AS n
      FROM h
    ),
    r AS (SELECT *, LEAST(GREATEST(CAST(CEIL(n * {q!r}) AS BIGINT), 1), n) AS rank FROM c)
    SELECT ROUND({lo!r} + bin * {width!r}
                 + {width!r} * (rank - (cum - cnt)) / cnt, 4) AS est
    FROM r WHERE cum >= rank ORDER BY bin LIMIT 1
    """


def hll_register_table_by(
    df: DataFrame, group_cols: list[str], key_col: str
) -> DataFrame:
    """Per-group sketches: (group..., reg, maxrho) — one hash-agg
    shuffle, <= HLL_M rows PER GROUP. Merge across shards with
    ``groupBy(group + reg).max(maxrho)`` exactly like the global
    table."""
    rows = (
        df.filter(F.expr(f"({key_col}) IS NOT NULL"))
        .select(
            *group_cols,
            F.expr(hll_reg_sql(key_col)).alias("reg"),
            F.expr(hll_w_sql(key_col)).alias("__w"),
        )
        .select(
            *group_cols, "reg", F.expr(hll_rho_from_w_sql("__w")).alias("rho")
        )
    )
    return rows.groupBy(*group_cols, "reg").agg(F.max("rho").alias("maxrho"))


def hll_estimate_by(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Per-group cardinality estimates from a grouped register table —
    the GROUP BY approx-distinct shape (distinct users per type,
    distinct URLs per domain) in two bounded aggregations."""
    return regs.groupBy(*group_cols).agg(_hll_estimate_expr())


def hll_estimate_by_sql(
    key_expr: str, source: str, group_cols: list[str]
) -> str:
    m = HLL_M
    groups = ", ".join(group_cols)
    return f"""
    WITH rr AS (
      SELECT {groups}, {hll_reg_sql(key_expr)} AS reg,
             {hll_rho_sql(key_expr)} AS rho
      FROM {source} WHERE ({key_expr}) IS NOT NULL
    ),
    regs AS (
      SELECT {groups}, reg, MAX(rho) AS maxrho FROM rr GROUP BY {groups}, reg
    ),
    s AS (
      SELECT {groups},
             SUM(power(2.0, -CAST(maxrho AS DOUBLE))) AS sp,
             CAST({m} - COUNT(*) AS DOUBLE) AS v
      FROM regs GROUP BY {groups}
    )
    SELECT {groups},
           ROUND(CASE WHEN CAST({_HLL_AM2!r} AS DOUBLE) / (sp + v) <= 2.5 * {m}
                       AND v > 0
                 THEN CAST({m} AS DOUBLE) * LN(CAST({m} AS DOUBLE) / v)
                 ELSE CAST({_HLL_AM2!r} AS DOUBLE) / (sp + v) END, 4) AS est
    FROM s
    """

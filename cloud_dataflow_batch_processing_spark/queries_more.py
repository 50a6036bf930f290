"""Second-wave operator queries: set ops, global combines, per-key
samples, join-shape variety — the SURVEY.md §2.2 rows not yet covered
by queries.py. (Set ops and sort are capability *supersets*: the
reference lacks them entirely — SURVEY.md §2.2 'notably absent' — so
Catalyst provides them at zero custom cost.)"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cloud_dataflow_batch_processing_spark.extensions.diff import row_signature_sql
from cloud_dataflow_batch_processing_spark.extensions.layout import zvalue_sql
from cloud_dataflow_batch_processing_spark.queries import _dec, register
from cloud_dataflow_batch_processing_spark.sources.testdata import load_tables


@register(
    "union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    # Flatten and RemoveDuplicates each have primary driver rows
    # (union_all, distinct_values); their composition registers late.
    late=True,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten + RemoveDuplicates = UNION DISTINCT
    (beam/transforms/core.py:1666 + util.py:189)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .union(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@register(
    "intersect_except",
    # Capability-superset set-op class is driver-carried by
    # `union_distinct`'s family sibling queries (`grouping_sets_rollup`,
    # `window_rank_analytics`, `percentiles_exact` all cover the same
    # "notably absent in Beam, free in Catalyst" superset row); this
    # variant registers late.
    late=True,
    oracle="""
    SELECT nationkey, 'both' AS which FROM
      (SELECT c_nationkey AS nationkey FROM customer
       INTERSECT
       SELECT s_nationkey AS nationkey FROM supplier)
    UNION ALL
    SELECT nationkey, 'customer_only' AS which FROM
      (SELECT c_nationkey AS nationkey FROM customer
       EXCEPT
       SELECT s_nationkey AS nationkey FROM supplier)
    """,
)
def intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT — absent from Beam 2.5 (SURVEY.md §2.2 set
    ops); native Catalyst left-semi/anti aggregates here."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return (
        c.intersect(s).withColumn("which", F.lit("both"))
        .unionByName(c.subtract(s).withColumn("which", F.lit("customer_only")))
    )


@register(
    "combine_globally",
    # r7 window rotation: class long driver-certified (green in
    # CORRECTNESS r02-r06); registers late to free a slot for a
    # class that never saw the driver gate.
    late=True,
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           COUNT(DISTINCT l_suppkey) AS n_supp
    FROM lineitem
    """,
)
def combine_globally_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CombineGlobally + TupleCombineFn lockstep combiners
    (beam/transforms/core.py:1054; combiners.py:448): one global agg,
    map-side partials, 1-row output."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )


@register(
    "sample_per_key_deterministic",
    oracle="""
    SELECT o_orderpriority, o_orderkey FROM (
      SELECT o_orderpriority, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS rn
      FROM orders) t WHERE rn <= 5
    """,
    # Sample has a primary driver row (sample_deterministic); the
    # per-key variant registers late.
    late=True,
)
def sample_per_key_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample.FixedSizePerKey's oracle-checkable stand-in (combiners.py:
    391): bounded per-key selection via window rank (the random-key
    variant is unit-tested; cross-engine RNG can't hash-match)."""
    o = load_tables(spark, sf_dir)["orders"]
    from cloud_dataflow_batch_processing_spark.operators import top_largest_per_key

    return top_largest_per_key(
        o.select("o_orderpriority", "o_orderkey"),
        "o_orderpriority",
        5,
        F.asc("o_orderkey"),
    )


@register(
    "multi_table_join_chain",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_lineitems,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F'
    GROUP BY r_name, n_name
    """,
    headline=True,
)
def multi_table_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table star join (TPC-H Q5 shape): fact-to-fact shuffle join +
    broadcast dims, filter pushed to the orders scan. The reference can
    only express this as chained CoGroupByKeys (SURVEY.md §2.2 joins) —
    Catalyst plans it with join reordering + broadcasts."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"].filter(F.col("o_orderstatus") == "F"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(_dec("l_extendedprice") * (1 - F.col("l_discount")).cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "window_rank_analytics",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
           CAST(LAG(o_orderkey) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate NULLS FIRST, o_orderkey) AS BIGINT) AS prev_order
    FROM orders WHERE o_custkey < 100
    """,
)
def window_rank_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions (rank/lag) — absent from Beam 2.5
    (SURVEY.md §2.2 'notably absent'), free via Catalyst Window exec."""
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir)["orders"].filter(F.col("o_custkey") < 100)
    w_rank = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    w_lag = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w_rank).alias("price_rank"),
        F.lag("o_orderkey").over(w_lag).alias("prev_order"),
    )


@register(
    "grouping_sets_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
           COALESCE(l_linestatus, 'ALL') AS l_linestatus,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def grouping_sets_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — another reference-absent capability
    (SURVEY.md §2.2), single-pass Expand+Aggregate in Spark."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n",
        )
    )


@register(
    "group_normalize_zscore",
    # Window-function class stays driver-checked via
    # window_rank_analytics; this 60k-row variant registers late (it
    # was also the slowest driver compare).
    late=True,
    oracle="""
    WITH s AS (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_p,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS ssq_p,
             COUNT(*) OVER w AS n
      FROM lineitem
      WINDOW w AS (PARTITION BY l_orderkey)
    )
    SELECT l_orderkey, l_linenumber,
           CASE WHEN n > 1 AND (ssq_p - sum_p * sum_p / n) > 0
                THEN (l_extendedprice - sum_p / n)
                     / sqrt((ssq_p - sum_p * sum_p / n) / (n - 1))
                ELSE 0.0 END AS zscore
    FROM s
    """,
)
def group_normalize_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization (feature-engineering shape) via
    windowed aggregates — no groupBy+rejoin, one shuffle. Variance from
    decimal-exact sum/ssq so both engines compute identical doubles.
    The Beam equivalent needs GBK + re-expand (two shuffles + a
    materialized iterable)."""
    from pyspark.sql import Window

    li = load_tables(spark, sf_dir)["lineitem"]
    w = Window.partitionBy("l_orderkey")
    dec = _dec("l_extendedprice")
    sum_p = F.sum(dec).over(w).cast("double")
    ssq_p = F.sum(dec * dec).over(w).cast("double")
    n = F.count(F.lit(1)).over(w)
    var = (ssq_p - sum_p * sum_p / n) / (n - 1)
    z = F.when(
        (n > 1) & ((ssq_p - sum_p * sum_p / n) > 0),
        (F.col("l_extendedprice") - sum_p / n) / F.sqrt(var),
    ).otherwise(0.0)
    return li.select("l_orderkey", "l_linenumber", z.alias("zscore"))


@register(
    "percentiles_exact",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/p90) — Spark `percentile`
    and DuckDB `quantile_cont` share the linear-interpolation
    definition, so the doubles match bit-for-bit (sort-based, no
    accumulation order)."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
    )


@register(
    "combine_fn_udaf",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT) * CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS ssq
    FROM lineitem GROUP BY l_returnflag
    """,
)
def combine_fn_udaf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom CombineFn (beam/transforms/core.py:465) through the
    applyInPandas UDAF adapter, oracle-checked against the equivalent
    native SQL — proving the create/add/merge/extract phases compute
    what they claim. (The stock-combiner fast path is the native agg;
    this exercises the custom-accumulator escape hatch.)"""
    from pyspark.sql import types as T

    from cloud_dataflow_batch_processing_spark.operators.combiners import (
        CombineFn,
        combine_per_key_udaf,
    )

    class SumOfSquares(CombineFn):
        def create_accumulator(self):
            return 0

        def add_input(self, acc, v):
            return acc + int(v) * int(v)

        def merge_accumulators(self, accs):
            return sum(accs)

        def extract_output(self, acc):
            return acc

    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_returnflag", F.floor("l_quantity").alias("q")
    )
    return combine_per_key_udaf(
        li, "l_returnflag", "q", SumOfSquares(), T.LongType(), out="ssq"
    )


@register(
    "approx_distinct",
    # r7 window rotation: class long driver-certified (green in
    # CORRECTNESS r02-r06); registers late to free a slot for a
    # class that never saw the driver gate.
    late=True,
    oracle="SELECT true AS orders_in_bound, true AS parts_in_bound",
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) — the approximate-aggregate class
    the reference lacks. HLL sketch values are engine-specific, so the
    oracle-checkable formulation emits the error envelope instead: each
    estimate must be within 2·rsd of the exact count (computed in the
    same plan), and the oracle asserts ``true``. A driver hash match
    therefore certifies the approximation bound, not the raw sketch."""
    t = load_tables(spark, sf_dir)
    rsd = 0.02
    # The sketches and the exact counts are SEPARATE aggregates crossed
    # at one row each: mixing approx_count_distinct with count_distinct
    # in one .agg plans the distinct-rewrite Expand with a partial HLL
    # sketch PER (key, gid) GROUP — ~600k 4KB register arrays at sf0.1
    # (rsd=0.02) churned through two shuffles; measured 3.4-5.0s warm
    # vs 0.6s split (r11, guide §2/§5). HLL registers are an
    # idempotent max-merge, so the merged per-group sketches and the
    # single global sketch are bit-identical — same estimate, same
    # booleans, same oracle.
    li = t["lineitem"]
    exact = li.agg(
        F.count_distinct("l_orderkey").alias("x_ord"),
        F.count_distinct("l_partkey").alias("x_prt"),
    )
    approx = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=rsd).alias("a_ord"),
        F.approx_count_distinct("l_partkey", rsd=rsd).alias("a_prt"),
    )
    agg = exact.crossJoin(approx)  # 1 row x 1 row by construction
    bound = 2 * rsd

    def in_bound(a: str, x: str) -> F.Column:
        # Empty input: both the sketch and the exact count are 0 — in
        # bound by definition (the bare ratio would be 0/0, an ANSI
        # DIVIDE_BY_ZERO; CASE guards evaluation of the untaken arm).
        return F.when(F.col(x) == 0, F.col(a) == 0).otherwise(
            F.abs(F.col(a) - F.col(x)) / F.col(x) <= bound
        )

    return agg.select(
        in_bound("a_ord", "x_ord").alias("orders_in_bound"),
        in_bound("a_prt", "x_prt").alias("parts_in_bound"),
    )


@register(
    "approx_percentile",
    # r7 window rotation: class long driver-certified (green in
    # CORRECTNESS r02-r06); registers late to free a slot for a
    # class that never saw the driver gate.
    late=True,
    oracle="SELECT o_orderpriority, true AS p50_in_bound, true AS p90_in_bound "
    "FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY o_orderpriority",
)
def approx_percentile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) — completes the
    approximate-aggregate class alongside approx_count_distinct
    (VERDICT r2 #9). Sketch outputs are engine- and merge-order-
    specific, so like ``approx_distinct`` the oracle-checkable
    formulation is the error envelope: with accuracy parameter a, the
    estimate's RANK must be within n/a of the target rank. The same
    plan computes the exact rank of the approximate answer via
    windowless counting (count of rows <= estimate), so a driver hash
    match certifies the sketch honors its published bound per group."""
    acc = 1000  # rank error <= n / acc
    # Non-NULL groups only (both engines): the sketch skips NULL values
    # anyway, and the join back on the group key cannot match a NULL
    # key without null-safe equality — adversarial sweep.
    o = load_tables(spark, sf_dir)["orders"].filter(
        F.col("o_orderpriority").isNotNull()
    )
    est = o.groupBy("o_orderpriority").agg(
        F.expr(f"approx_percentile(o_totalprice, 0.5, {acc})").alias("e50"),
        F.expr(f"approx_percentile(o_totalprice, 0.9, {acc})").alias("e90"),
        F.count(F.lit(1)).alias("n"),
    )
    j = o.join(est, on="o_orderpriority")
    ranked = j.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_totalprice") <= F.col("e50"), 1).otherwise(0)).alias("r50"),
        F.sum(F.when(F.col("o_totalprice") <= F.col("e90"), 1).otherwise(0)).alias("r90"),
        F.first("n").alias("n"),
    )
    err = F.col("n") / acc + 1  # +1: estimate is an actual element, rank is inclusive
    return ranked.select(
        "o_orderpriority",
        (F.abs(F.col("r50") - 0.5 * F.col("n")) <= err).alias("p50_in_bound"),
        (F.abs(F.col("r90") - 0.9 * F.col("n")) <= err).alias("p90_in_bound"),
    )


from cloud_dataflow_batch_processing_spark.extensions import sketch as SK  # noqa: E402

_CMS_DEPTH, _CMS_WIDTH = 4, 64


@register(
    "heavy_hitters_countmin",
    oracle=f"""
    WITH sk AS (
      SELECT i AS row_i, {SK.cms_bucket_sql('user_id', 'i', _CMS_WIDTH)} AS bucket,
             COUNT(*) AS cnt
      FROM events CROSS JOIN range(0, {_CMS_DEPTH}) t(i)
      GROUP BY 1, 2
    ),
    keys AS (SELECT DISTINCT user_id FROM events),
    probes AS (
      SELECT k.user_id, i, {SK.cms_bucket_sql('k.user_id', 'i', _CMS_WIDTH)} AS bucket
      FROM keys k CROSS JOIN range(0, {_CMS_DEPTH}) t(i)
    ),
    est AS (
      SELECT p.user_id, MIN(sk.cnt) AS est_count
      FROM probes p JOIN sk ON sk.row_i = p.i AND sk.bucket = p.bucket
      GROUP BY 1
    ),
    tru AS (SELECT user_id, COUNT(*) AS true_count FROM events GROUP BY 1)
    SELECT e.user_id, e.est_count, t.true_count,
           e.est_count >= t.true_count AS overestimates
    FROM est e JOIN tru t USING (user_id)
    ORDER BY e.est_count DESC, e.user_id LIMIT 10
    """,
)
def heavy_hitters_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters (extensions/sketch.py::countmin_sketch):
    top-10 users by estimated frequency from a 4×64 sketch, with the
    exact count and the one-sided overestimate guarantee alongside.
    The sketch is depth × width counters independent of key
    cardinality — ONE bounded hash-agg shuffle to build, broadcast to
    probe — and the affine hash family is engine-neutral, so the
    DuckDB oracle rebuilds the identical counter table and every
    estimate is value-checked, not just envelope-checked. At 150 keys
    over 64 buckets the collisions are real (est > true for some keys),
    which makes the value match a meaningful certification."""
    ev = load_tables(spark, sf_dir)["events"]
    sk = SK.countmin_sketch(ev, F.col("user_id"), _CMS_DEPTH, _CMS_WIDTH)
    keys = ev.select("user_id").distinct()
    est = SK.countmin_estimate(sk, keys, "user_id", _CMS_DEPTH, _CMS_WIDTH)
    tru = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    return (
        est.join(tru, "user_id")
        .select(
            "user_id",
            "est_count",
            "true_count",
            (F.col("est_count") >= F.col("true_count")).alias("overestimates"),
        )
        .orderBy(F.desc("est_count"), "user_id")
        .limit(10)
    )


@register(
    "table_fingerprint",
    # r7 window rotation: class long driver-certified (green in
    # CORRECTNESS r02-r06); registers late to free a slot for a
    # class that never saw the driver gate.
    late=True,
    oracle=f"""
    WITH h AS (
      SELECT l_returnflag,
             ((((((l_orderkey % {1_000_000_007}) * 31 + l_linenumber) % {1_000_000_007})
                * 31 + (l_partkey % {1_000_000_007})) % {1_000_000_007}
               * 31 + CAST(l_quantity AS BIGINT)) % {1_000_000_007}) AS row_hash
      FROM lineitem
    )
    SELECT l_returnflag, COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(row_hash AS DECIMAL(38,0))) AS DECIMAL(38,0))
                % {1_000_000_007} AS BIGINT) AS fingerprint
    FROM h GROUP BY 1
    """,
)
def table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum — the anti-entropy primitive a
    100 TB migration/replication needs: per-group (and by extension
    whole-table) fingerprints that two engines or two copies can
    compare without moving rows. Per-row polynomial hash over the key
    columns (engine-neutral, same 1e9+7 field as every hash in this
    repo), combined with an order-insensitive decimal-exact SUM mod P —
    map-side partial aggregation does nearly all the work, one narrow
    shuffle to 3 groups, and a mismatch localizes to the group. The
    oracle rebuilds the identical fingerprint in DuckDB, which is
    exactly the cross-engine use case."""
    P = 1_000_000_007
    li = load_tables(spark, sf_dir)["lineitem"]
    row_hash = (
        (
            ((F.col("l_orderkey") % P) * 31 + F.col("l_linenumber")) % P * 31
            + (F.col("l_partkey") % P)
        )
        % P
        * 31
        + F.col("l_quantity").cast("bigint")
    ) % P
    return (
        li.select("l_returnflag", row_hash.alias("row_hash"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(F.col("row_hash").cast("decimal(38,0)")) % P)
            .cast("bigint")
            .alias("fingerprint"),
        )
    )


@register(
    "zorder_curve",
    # Data-layout class: verification weight is in the clustering unit
    # test + RangePartitioning plan pin (tests/test_layout.py); the
    # curve arithmetic itself is oracle-checked here, registered late.
    late=True,
    oracle=f"""
    SELECT o_orderkey,
           {zvalue_sql('(o_custkey % 1024)', '(o_orderkey % 1024)', 10)} AS zval
    FROM orders WHERE o_orderkey < 1000
    """,
)
def zorder_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order curve values (extensions/layout.py::zvalue): bit
    interleave of two bounded dimensions, the clustering key behind
    OPTIMIZE ZORDER-style layout. Pure BIGINT shifts — codegen on
    Spark, identical arithmetic in the DuckDB oracle."""
    from cloud_dataflow_batch_processing_spark.extensions.layout import zvalue

    o = load_tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        zvalue(F.col("o_custkey") % 1024, F.col("o_orderkey") % 1024, 10).alias("zval"),
    )


@register(
    "snapshot_diff_orders",
    oracle=f"""
    WITH oldv AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             NULLIF(o_custkey % 5, 0) AS v2 FROM orders
    ),
    newv AS (
      SELECT o_orderkey, o_custkey,
             o_totalprice + CASE WHEN o_orderkey % 31 = 0 THEN 1.0 ELSE 0.0 END AS o_totalprice,
             CASE WHEN o_orderkey % 53 = 0 THEN COALESCE(v2, -1) + 10 ELSE v2 END AS v2
      FROM oldv WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000000000, o_custkey, o_totalprice, v2
      FROM oldv WHERE o_orderkey % 113 = 0
    ),
    osig AS (
      SELECT o_orderkey,
             {row_signature_sql(["CAST(FLOOR(o_totalprice * 100) AS BIGINT)", "o_custkey", "v2"])} AS sig_old
      FROM oldv
    ),
    nsig AS (
      SELECT o_orderkey,
             {row_signature_sql(["CAST(FLOOR(o_totalprice * 100) AS BIGINT)", "o_custkey", "v2"])} AS sig_new
      FROM newv
    )
    SELECT * FROM (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey, o.sig_old, n.sig_new,
             CASE WHEN o.sig_old IS NULL THEN 'added'
                  WHEN n.sig_new IS NULL THEN 'removed'
                  WHEN o.sig_old <> n.sig_new THEN 'changed' END AS change
      FROM osig o FULL OUTER JOIN nsig n USING (o_orderkey)
    ) WHERE change IS NOT NULL
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (extensions/diff.py): added/removed/changed rows
    between a table and its deterministically-mutated next version
    (drop keys %97, bump price %31, add %113 under shifted keys). Each
    side reduces to (key, BIGINT signature) before the full-outer
    join — the narrowest shuffle a diff can have; pairs with
    `table_fingerprint` (that says WHETHER copies diverge, this says
    WHICH rows).

    The NULL-bearing compare column ``v2`` (NULL where custkey%5==0,
    mutated NULL→value for keys %53) routes the driver's oracle gate
    through row_signature's null-flag terms: with the pre-fix
    NULL-propagating signature every v2-NULL row would misclassify as
    'added' and the hash would diverge (ADVICE r3/VERDICT r4 #1)."""
    from cloud_dataflow_batch_processing_spark.extensions.diff import snapshot_diff

    o = load_tables(spark, sf_dir)["orders"]
    old = o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.expr("NULLIF(o_custkey % 5, 0)").alias("v2"),
    )
    new = (
        old.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 31 == 0, F.lit(1.0)).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "v2",
            F.when(
                F.col("o_orderkey") % 53 == 0,
                F.coalesce(F.col("v2"), F.lit(-1)) + 10,
            ).otherwise(F.col("v2")),
        )
        .unionByName(
            old.filter(F.col("o_orderkey") % 113 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10_000_000_000_000
            )
        )
    )
    cmp_cols = [F.floor(F.col("o_totalprice") * 100), F.col("o_custkey"), F.col("v2")]
    return snapshot_diff(old, new, ["o_orderkey"], cmp_cols)


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_event_matrix",
    # Capability-superset class (absent from Beam 2.5, native Catalyst
    # PivotFirst); registers late like the other supersets.
    late=True,
    oracle=f"""
    SELECT user_id,
           {', '.join(f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}"
                      for t in _EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
)
def pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event-type count matrix via Catalyst's native
    pivot (map-side PivotFirst, one shuffle — not 5 filtered scans).
    Absent combinations fill 0 to match the conditional-aggregation
    oracle."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )


@register(
    "unpivot_roundtrip",
    late=True,  # superset class, same posture as pivot_event_matrix
    oracle="""
    SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
    FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    GROUP BY event_type
    """,
    # Defined over identified, typed events on both engines: an
    # explicit-values pivot cannot represent a NULL type column, and a
    # NULL user would be a pivot row but never a COUNT(DISTINCT) value
    # (adversarial sweep).
)
def unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the pivoted matrix unpivots back to long form
    and re-aggregates to per-type totals — a pivot→unpivot roundtrip
    whose oracle is the direct long-form aggregation, so the pair of
    reshapes must be lossless (0-fill rows contribute nothing)."""
    ev = load_tables(spark, sf_dir)["events"].filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )
    long = wide.unpivot(
        ["user_id"], _EVENT_TYPES, "event_type", "n"
    )
    return (
        long.groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.count(F.when(F.col("n") > 0, 1)).alias("n_users"),
        )
        # "0-fill rows contribute nothing": an event type ABSENT from
        # the corpus exists only as pivot 0-columns — dropping its
        # all-zero group is what makes the roundtrip lossless against
        # the direct long-form aggregation (single-row sweep found the
        # phantom rows).
        .filter(F.col("n_events") > 0)
    )


@register(
    "group_sorted_values",
    # GroupByKey class is driver-carried by `group_by_key_lists`; this
    # secondary-sort (value ordering inside the group) twin registers
    # late.
    late=True,
    oracle="""
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) - 1 AS INT) AS pos,
           value
    FROM events WHERE event_type = 'purchase' AND user_id < 40
    """,
)
def group_sorted_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort: each user's purchase values in event-time order
    inside one grouped array — Beam's GroupByKey + in-group sort
    pattern. collect_list order is nondeterministic, so the sort happens
    AFTER collection via sort_array over (ts, id, value) structs (struct
    order = lexicographic = the secondary-sort key), then a transform
    projects the payload. One shuffle; no per-group Python."""
    ev = load_tables(spark, sf_dir)["events"].filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 40)
    )
    ts = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    grouped = (
        ev.select("user_id", F.struct(ts.alias("t"), F.col("event_id").alias("i"),
                                      F.col("value").alias("v")).alias("s"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("s")).alias("ss"))
    )
    # Emit rows, not the raw array: float-array columns stringify
    # differently between the Arrow and non-Arrow toPandas paths (and
    # between engines), which breaks value hashing under the driver's
    # vanilla session even when the contents are identical.
    return grouped.select(
        "user_id", F.posexplode(F.expr("transform(ss, x -> x.v)")).alias("pos", "value")
    )


@register(
    "q3_shipping_priority",
    # Join/agg/topk classes all have primary carriers
    # (multi_table_join_chain, q1_pricing_summary, top_n_global); the
    # r7: promoted into the driver's 50-query window (window rotation
    # — this operator class had only local-oracle coverage before).
    # r11: demoted late — the 3-table join + rollup + bounded top-k
    # class is carried in-window by q10 and by the primary
    # multi_table_join_chain; its slot funds bpe_merge_pairs (a new
    # class: vocabulary induction).
    late=True,
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_s, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): segment-filtered 3-table join,
    revenue rollup, bounded top-10 (TakeOrderedAndProject — no global
    sort). Both date filters push to their scans."""
    t = load_tables(spark, sf_dir)
    cutoff = "TIMESTAMP_NTZ '1998-03-15 00:00:00'"
    return (
        t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"].filter(F.expr(f"o_orderdate < {cutoff}")),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"].filter(F.expr(f"l_shipdate > {cutoff}")),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - F.col("l_discount")).cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)"
            ).alias("orderdate_s"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q10_returned_items",
    late=True,  # same class coverage note as q3_shipping_priority
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item ranking): returnflag-filtered fact
    join, customer/nation rollup, bounded top-20; nation broadcasts."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"].filter(F.col("l_returnflag") == "R"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - F.col("l_discount")).cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "dq_violation_summary",
    # Data-quality class (beyond-reference extension): one compact
    # violations frame; registered late — COVERAGE.md carries the row,
    # every check is an aggregate class already driver-checked.
    late=True,
    oracle="""
    SELECT 'lineitem_pk_dup' AS check_name,
           (SELECT COUNT(*) FROM (
              SELECT l_orderkey, l_linenumber FROM lineitem
              GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)) AS n_violations
    UNION ALL
    SELECT 'lineitem_fk_orphans',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders_fk_orphans',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'discount_out_of_range',
           (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
    UNION ALL
    SELECT 'orders_null_keys',
           (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL OR o_custkey IS NULL)
    UNION ALL
    SELECT 'lineitem_non_finite_money',
           (SELECT COUNT(*) FROM lineitem
            WHERE (l_quantity IS NOT NULL AND (isnan(l_quantity) OR isinf(l_quantity)))
               OR (l_extendedprice IS NOT NULL AND (isnan(l_extendedprice) OR isinf(l_extendedprice)))
               OR (l_discount IS NOT NULL AND (isnan(l_discount) OR isinf(l_discount)))
               OR (l_tax IS NOT NULL AND (isnan(l_tax) OR isinf(l_tax))))
    UNION ALL
    SELECT 'orders_non_finite_money',
           (SELECT COUNT(*) FROM orders
            WHERE o_totalprice IS NOT NULL
              AND (isnan(o_totalprice) OR isinf(o_totalprice)))
    UNION ALL
    SELECT 'events_non_finite_value',
           (SELECT COUNT(*) FROM events
            WHERE value IS NOT NULL AND (isnan(value) OR isinf(value)))
    """,
)
def dq_violation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality suite (dbt/Great-Expectations shape): primary-key
    uniqueness, two referential-integrity checks (left-anti joins —
    the orphan side never materializes matches), a range constraint,
    and null checks — one violations frame a pipeline gates on before
    training. All counts are exact aggregates; at 100 TB each check is
    one narrow shuffle (or none for the per-row predicates)."""
    t = load_tables(spark, sf_dir)
    li, o, c = t["lineitem"], t["orders"], t["customer"]

    def one(name: str, cnt: DataFrame) -> DataFrame:
        return cnt.select(F.lit(name).alias("check_name"), F.col("n").alias("n_violations"))

    pk_dup = one(
        "lineitem_pk_dup",
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("n")),
    )
    li_orphan = one(
        "lineitem_fk_orphans",
        li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti").agg(
            F.count(F.lit(1)).alias("n")
        ),
    )
    o_orphan = one(
        "orders_fk_orphans",
        o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti").agg(
            F.count(F.lit(1)).alias("n")
        ),
    )
    rng = one(
        "discount_out_of_range",
        li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).agg(
            F.count(F.lit(1)).alias("n")
        ),
    )
    nulls = one(
        "orders_null_keys",
        o.filter(F.col("o_orderkey").isNull() | F.col("o_custkey").isNull()).agg(
            F.count(F.lit(1)).alias("n")
        ),
    )

    # Non-finite money quarantine counts (round 8): NaN/Inf in a money
    # column is a DQ class, not an analytics input — the documented
    # 100 TB posture is "gate quarantines, analytics stays loud" (ANSI
    # cast of a non-finite to DECIMAL raises rather than producing
    # silent garbage; pinned by tests/test_adversarial_inputs.py).
    # Spark has no isinf(); |x| = +Inf is the exact equivalent.
    def non_finite(c: str) -> F.Column:
        col = F.col(c)
        return col.isNotNull() & (
            F.isnan(col) | (F.abs(col) == F.lit(float("inf")))
        )

    li_nf = one(
        "lineitem_non_finite_money",
        li.filter(
            non_finite("l_quantity")
            | non_finite("l_extendedprice")
            | non_finite("l_discount")
            | non_finite("l_tax")
        ).agg(F.count(F.lit(1)).alias("n")),
    )
    o_nf = one(
        "orders_non_finite_money",
        o.filter(non_finite("o_totalprice")).agg(F.count(F.lit(1)).alias("n")),
    )
    ev = t["events"]
    ev_nf = one(
        "events_non_finite_value",
        ev.filter(non_finite("value")).agg(F.count(F.lit(1)).alias("n")),
    )
    return (
        pk_dup.unionByName(li_orphan)
        .unionByName(o_orphan)
        .unionByName(rng)
        .unionByName(nulls)
        .unionByName(li_nf)
        .unionByName(o_nf)
        .unionByName(ev_nf)
    )


from cloud_dataflow_batch_processing_spark.extensions import rollup as RU  # noqa: E402


@register(
    "incremental_rollup_orders",
    oracle=RU.rollup_finalize_sql("orders", ["o_orderstatus"], ["o_totalprice"]),
    # r7: promoted into the driver's 50-query window (window rotation
    # — this operator class had only local-oracle coverage before).
)
def incremental_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized rollup (extensions/rollup.py): orders
    aggregated into per-(status, month) accumulator cells — the
    partials a daily pipeline would persist — then MERGED down to
    per-status finals. The oracle is the direct one-shot aggregation,
    so a hash match proves the partial/merge/finalize machinery is
    invisible in the result: the incremental path can replace the
    full rescan at 100 TB (only new partitions are ever aggregated;
    stored partials are groups x shards tiny rows). Composition
    (merge of merges, parquet round-trip of partials) is unit-pinned
    in tests/test_rollup.py."""
    o = load_tables(spark, sf_dir)["orders"].withColumn(
        "shard_month", F.month("o_orderdate")
    )
    return RU.rollup_query(o, ["o_orderstatus"], ["shard_month"], ["o_totalprice"])


@register(
    "sequential_ids_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice NULLS FIRST, o_orderkey) - 1
                AS BIGINT) AS seq_id
    FROM orders
    """,
    late=True,
)
def sequential_ids_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable sequential IDs (operators/ids.py): contiguous 0-based
    global rank by (o_totalprice, o_orderkey) WITHOUT the
    single-partition window an unpartitioned row_number() plans —
    range-repartition + per-partition offsets (one tiny driver list)
    + codegen local index. The oracle IS the naive row_number form,
    so the hash gate proves the two-pass trick is rank-exact."""
    from cloud_dataflow_batch_processing_spark.operators.ids import (
        assign_sequential_ids,
    )

    o = load_tables(spark, sf_dir)["orders"]
    return assign_sequential_ids(
        o.select("o_orderkey", "o_totalprice"), ["o_totalprice", "o_orderkey"]
    ).select("o_orderkey", "seq_id")


from cloud_dataflow_batch_processing_spark.extensions import cdc as CDC  # noqa: E402

# Deterministic synthetic changeset over orders, derivable identically
# in both engines: keys ending in 0 are deleted, keys ending in 1 are
# re-priced (+1.5), keys ending in 2 are re-inserted shifted by 10^13
# (novel keys; ADVICE r4 — 10^7 collided with real o_orderkey above
# ~SF1.6, o_orderkey ~ 6M*SF, so the shift must clear any plausible
# SF; 10^13 clears SF ~1.6M while staying in BIGINT). Exercises all
# three MERGE arms.
_CDC_CHANGES_SQL = """
    SELECT o_orderkey, o_custkey, o_orderstatus,
           o_totalprice + 1.5 AS o_totalprice, o_orderpriority, 'U' AS op
    FROM orders WHERE o_orderkey % 10 = 1
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus,
           o_totalprice, o_orderpriority, 'D' AS op
    FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT o_orderkey + 10000000000000 AS o_orderkey, o_custkey, o_orderstatus,
           o_totalprice, o_orderpriority, 'U' AS op
    FROM orders WHERE o_orderkey % 10 = 2
"""


@register(
    "cdc_merge_orders",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders
    ),
    changes AS ({_CDC_CHANGES_SQL})
    {CDC.apply_changes_sql('base', 'changes', ['o_orderkey'])}
    """,
    # r7: promoted into the driver's 50-query window (window rotation
    # — this operator class had only local-oracle coverage before).
)
def cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO / upsert-apply (extensions/cdc.py::apply_changes —
    the ingestion half of the CDC pair with snapshot_diff): a
    three-arm changeset (update / delete / insert, derived
    deterministically from orders so both engines build the identical
    one) applied to the snapshot. One anti-join + one union, both
    shuffling on the merge key once; the changeset side is
    increment-sized so AQE broadcasts it at bench scale."""
    o = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    last = F.col("o_orderkey") % 10
    changes = (
        o.filter(last == 1)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1.5)
        .withColumn("op", F.lit("U"))
        .unionByName(o.filter(last == 0).withColumn("op", F.lit("D")))
        .unionByName(
            o.filter(last == 2)
            .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000_000_000)
            .withColumn("op", F.lit("U"))
        )
    )
    return CDC.apply_changes(o, changes, ["o_orderkey"])


@register(
    "scd2_user_event_history",
    oracle=CDC.scd2_intervals_sql(
        "(SELECT user_id, event_type, ts, event_id FROM events WHERE user_id < 50)",
        ["user_id"],
        "ts",
        ["event_id"],
    ),
    # r7: promoted into the driver's 50-query window (window rotation
    # — this operator class had only local-oracle coverage before).
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals (extensions/cdc.py::scd2_intervals):
    each user's event log becomes [valid_from, valid_to) intervals
    with the open current row flagged — one window, one shuffle on
    the key. (user_id, ts, event_id) is a total order, so interval
    endpoints are deterministic on both engines."""
    e = (
        load_tables(spark, sf_dir)["events"]
        .filter(F.col("user_id") < 50)
        .select("user_id", "event_type", "ts", "event_id")
    )
    return CDC.scd2_intervals(e, ["user_id"], "ts", ["event_id"])


@register(
    "q5_local_supplier_volume",
    # r7: promoted into the driver's 50-query window; r11: demoted late
    # — the multi-join region-slice agg class is carried in-window by
    # q7/q8/q9 and by the primary multi_table_join_chain; its slot
    # funds gopher_repetition_filter (a new class).
    late=True,
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): the classic 6-table snowflake
    join with the correlated c_nationkey = s_nationkey condition —
    the join-ordering workout. region/nation broadcast; the fact
    chain shuffles on its join keys once each; revenue decimal-exact."""
    t = load_tables(spark, sf_dir)
    rev = (_dec("l_extendedprice") * (1 - F.col("l_discount")).cast("decimal(18,2)"))
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["region"].filter(F.col("r_name") == "ASIA"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "q18_large_volume_customers",
    # r7: promoted into the driver's 50-query window; r11: demoted late
    # — the aggregate-then-semi-join class is carried by
    # q20_excess_shipped_suppliers (in-window) and the analog sweep;
    # its primary slot funds decontaminate_exact_spans (a new class).
    late=True,
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150
    )
    SELECT c_name, c_custkey, o_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_name, c_custkey, o_orderkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): HAVING-filtered semi-join —
    the aggregate-then-semi-join shape (find qualifying orders first,
    a tiny frame, then join it back; never the other order). The big
    set broadcasts; quantities decimal-exact."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"].groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"].join(F.broadcast(big), "l_orderkey", "left_semi"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
    )


@register(
    "salted_aggregate_lineitem",
    late=True,
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def salted_aggregate_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py): the hot-key
    mitigation AQE cannot apply to aggregates — partial agg on
    (key, salt) bounds every reducer, final agg merges <= num_salts
    partials per key. The oracle is the PLAIN aggregation: a hash
    match proves salting is result-invisible (the salt is random per
    row, so only algebraic aggregates survive it — exactly the
    cy_combiners set)."""
    from cloud_dataflow_batch_processing_spark.operators.skew import salted_aggregate

    li = load_tables(spark, sf_dir)["lineitem"]
    return salted_aggregate(
        li,
        "l_returnflag",
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "total_qty": (
                F.sum(F.floor("l_quantity").cast("long")),
                F.sum("total_qty"),
            ),
        },
        num_salts=8,
    )


from cloud_dataflow_batch_processing_spark.extensions import graph as G  # noqa: E402

_PR_EDGES_SQL = (
    "SELECT DISTINCT l_suppkey AS src, o_custkey AS dst "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
)


@register(
    "pagerank_supplier_customer",
    oracle=G.pagerank_sql(_PR_EDGES_SQL, iters=3),
    # r7: promoted into the driver's 50-query window (window rotation
    # — this operator class had only local-oracle coverage before).
)
def pagerank_supplier_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (extensions/graph.py) over the supplier→customer
    fulfillment graph — the third member of the iterative-algorithm
    family (with Lloyd k-means and connected components). Decimal-
    exact contribution sums make the full 3-iteration trajectory
    bit-reproducible, so the DuckDB oracle (iterations unrolled as
    CTEs) certifies the VALUES. One groupBy(dst) shuffle per
    iteration; lineage checkpointing is the deep-iteration posture."""
    t = load_tables(spark, sf_dir)
    edges = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("l_suppkey").alias("src"), F.col("o_custkey").alias("dst"))
        .distinct()
    )
    return G.pagerank(edges, iters=3)


@register(
    "scalar_subquery_above_avg",
    late=True,
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_above
    FROM orders
    WHERE o_totalprice > (SELECT AVG(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
    GROUP BY o_orderpriority
    """,
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery predicate (orders above the global average
    price): Spark plans the subquery as a broadcast scalar computed
    once, never a per-row recomputation. Decimal-exact average so the
    cutoff is bit-identical on both engines."""
    o = load_tables(spark, sf_dir)["orders"]
    o.createOrReplaceTempView("__orders_ssq")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_above
        FROM __orders_ssq
        WHERE o_totalprice > (SELECT AVG(CAST(o_totalprice AS DECIMAL(18,2)))
                              FROM __orders_ssq)
        GROUP BY o_orderpriority
        """
    )


def _stat_sums_sql(x: str, y: str, source: str) -> str:
    return f"""
      SELECT COUNT(*) AS n,
             SUM(CAST({x} AS DECIMAL(27,4))) AS sx,
             SUM(CAST({y} AS DECIMAL(27,4))) AS sy,
             SUM(CAST({x} AS DECIMAL(27,4)) * CAST({x} AS DECIMAL(27,4))) AS sxx,
             SUM(CAST({y} AS DECIMAL(27,4)) * CAST({y} AS DECIMAL(27,4))) AS syy,
             SUM(CAST({x} AS DECIMAL(27,4)) * CAST({y} AS DECIMAL(27,4))) AS sxy
      FROM {source} WHERE {x} IS NOT NULL AND {y} IS NOT NULL
    """


@register(
    "stats_corr_ols_lineitem",
    late=True,
    oracle=f"""
    WITH s AS ({_stat_sums_sql('l_quantity', 'l_extendedprice', 'lineitem')}),
    d AS (
      SELECT n,
             CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n,
             CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS var_x,
             CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS var_y,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      FROM s)
    SELECT n,
           ROUND(cov_n / NULLIF(SQRT(var_x) * SQRT(var_y), 0), 8) AS corr_qty_price,
           ROUND(cov_n / NULLIF(var_x, 0), 8) AS ols_slope,
           ROUND((syd - (cov_n / NULLIF(var_x, 0)) * sxd)
                 / CAST(n AS DOUBLE), 8) AS ols_intercept
    FROM d
    """,
)
def stats_corr_ols_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic statistics: Pearson correlation and closed-form
    simple OLS (price ~ quantity) from DECIMAL-EXACT moment sums —
    Spark's built-in corr/covar fold doubles in partition order and is
    not reproducible across partitionings, let alone engines; the
    moment-sum formulation is one narrow aggregate whose per-moment
    sums are exact, so the derived statistics are bit-identical
    everywhere (rounded at the boundary). One scan, one 6-column
    global agg — the 100 TB regression/correlation shape."""
    li = load_tables(spark, sf_dir)["lineitem"].filter(
        F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    )
    x = F.col("l_quantity").cast("decimal(27,4)")
    y = F.col("l_extendedprice").cast("decimal(27,4)")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    # Zero variance (n=1, or a constant column) leaves the statistics
    # undefined: NULL on both engines (NULLIF-guarded in the oracle),
    # never an ANSI DIVIDE_BY_ZERO — found by the single-row sweep.
    slope = cov_n / F.nullif(var_x, F.lit(0.0))
    return s.select(
        "n",
        F.round(
            cov_n / F.nullif(F.sqrt(var_x) * F.sqrt(var_y), F.lit(0.0)), 8
        ).alias("corr_qty_price"),
        F.round(slope, 8).alias("ols_slope"),
        F.round((sy - slope * sx) / n, 8).alias("ols_intercept"),
    )


@register(
    "salted_join_lineitem_orders",
    late=True,
    oracle="""
    SELECT l.l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_returnflag
    """,
)
def salted_join_lineitem_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (operators/skew.py::salt_explode_small_side):
    the big side salts randomly, the small side explodes across all
    salts, the join runs on (key, salt) — the manual mitigation for
    when AQE's runtime skew split isn't available (streaming joins,
    older engines) or the small side is too big to broadcast. The
    oracle is the PLAIN join aggregate: a hash match proves salting is
    result-invisible."""
    from cloud_dataflow_batch_processing_spark.operators.skew import (
        salt_explode_small_side,
    )

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(F.col("l_orderkey").alias("o_orderkey"), "l_returnflag")
    o = t["orders"].select("o_orderkey", "o_totalprice")
    big_s, small_s, cols = salt_explode_small_side(li, o, "o_orderkey", 8)
    return (
        big_s.join(small_s, on=cols)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
    )


@register(
    "q6_forecast_revenue",
    late=True,  # filter-agg class is driver-covered by q1/filter_project
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the canonical pure
    filter-aggregate — every predicate reaches the parquet scan
    (min/max row-group skipping on shipdate at scale), zero joins,
    one partial+final agg, revenue decimal-exact."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.sum(_dec("l_extendedprice") * F.col("l_discount").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q4_order_priority_exists",
    late=True,
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4's shape (order priority checking) on this corpus's
    columns: orders having AT LEAST ONE late-shipping lineitem
    (shipdate > orderdate + 90 days), counted per priority. The EXISTS
    becomes a LEFT SEMI hash join on orderkey with the date predicate
    in the join condition — the probe side never duplicates orders
    regardless of lineitem fan-out, and only (orderkey, shipdate)
    ships from the fact scan."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    l = t["lineitem"].select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )

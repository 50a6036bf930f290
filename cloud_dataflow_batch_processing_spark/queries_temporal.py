"""Temporal-join query registrations: backward as-of join and bucketed
range join over the events table (extensions/temporal.py).

The reference's only join primitive is CoGroupByKey equi-join
composition (beam/transforms/util.py:63-170); these are beyond-reference
extensions in the SURVEY §2.3 north-star class — point-in-time-correct
feature lookup and interval-containment matching, the two temporal
shapes every training-data / feature pipeline needs. Both oracles are
genuinely independent formulations: DuckDB's native ASOF JOIN for the
as-of query (a different algorithm from our union+forward-fill window),
and a plain inequality join for the range query (vs our bucketed
equi-join) — so a hash match certifies the *semantics*, not a shared
plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cloud_dataflow_batch_processing_spark.extensions.temporal import asof_join, range_join
from cloud_dataflow_batch_processing_spark.queries import register
from cloud_dataflow_batch_processing_spark.sources.testdata import load_tables

# Interval half-open "blast window" after each error event, in
# microseconds; bucket width equals the interval length so each
# interval explodes to at most 2 buckets (constant fan-out).
_RANGE_WINDOW_US = 3_600_000_000


def _epoch_us(col: str):
    """Exact epoch-microseconds from a TIMESTAMP_NTZ column, immune to
    the session timezone (wall-clock diff against the NTZ epoch — the
    driver's vanilla session need not run in UTC). Matches DuckDB's
    ``epoch_us`` bit-for-bit."""
    return F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})")


@register(
    "asof_join_events",
    oracle="""
    WITH r AS (SELECT user_id, epoch_us(ts) AS rts, MAX(value) AS click_value
               FROM events WHERE event_type = 'click' GROUP BY 1, 2),
    l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
          FROM events WHERE event_type = 'purchase')
    SELECT l.event_id, l.user_id, l.ts_us, r.click_value, r.rts AS asof_ts
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_us >= r.rts
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: every purchase event picks up the value of
    the user's latest click at-or-before it (point-in-time-correct
    feature lookup; NULLs when no prior click). One shuffle total —
    both sides union-tagged and forward-filled per user with a running
    ``last(ignorenulls)`` window; no join node, no per-key blowup
    (extensions/temporal.py:38). The right side is pre-aggregated to
    one row per (user, ts) so "the latest" is well defined on both
    engines."""
    ev = load_tables(spark, sf_dir)["events"]
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", _epoch_us("ts").alias("rts"))
        .agg(F.max("value").alias("click_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", _epoch_us("ts").alias("ts_us")
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="rts",
        right_cols=["click_value"],
    )
    return out.select(
        "event_id", "user_id", "ts_us", "click_value", F.col("__asof_ts").alias("asof_ts")
    )


@register(
    "range_join_events",
    oracle=f"""
    WITH iv AS (SELECT event_id AS err_id, user_id, epoch_us(ts) AS s_us,
                       epoch_us(ts) + {_RANGE_WINDOW_US} AS e_us
                FROM events WHERE event_type = 'error'),
    p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS ts_us, value
          FROM events WHERE event_type = 'purchase')
    SELECT iv.err_id, iv.user_id, COUNT(*) AS n_purchases,
           MIN(p.p_id) AS first_purchase, MAX(p.p_id) AS last_purchase,
           CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM iv JOIN p ON iv.user_id = p.user_id AND p.ts_us BETWEEN iv.s_us AND iv.e_us
    GROUP BY 1, 2
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join: purchases landing inside the hour after
    each error event of the same user, rolled up per interval. The
    oracle is a plain inequality join; ours explodes each interval to
    the ≤2 time buckets it overlaps and equi-joins on (user, bucket) —
    a hash join plus residual filter, never a BroadcastNestedLoopJoin,
    and each match is produced exactly once so no dedup pass
    (extensions/temporal.py:112)."""
    ev = load_tables(spark, sf_dir)["events"]
    intervals = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        _epoch_us("ts").alias("s_us"),
        (_epoch_us("ts") + F.lit(_RANGE_WINDOW_US)).alias("e_us"),
    )
    points = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        _epoch_us("ts").alias("ts_us"),
        "value",
    )
    pairs = range_join(
        points,
        intervals,
        on=["user_id"],
        point_ts="ts_us",
        start_ts="s_us",
        end_ts="e_us",
        bucket_width=_RANGE_WINDOW_US,
        how="inner",
    )
    return pairs.groupBy("err_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.min("p_id").alias("first_purchase"),
        F.max("p_id").alias("last_purchase"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


_GRID_START_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
_GRID_STEP_US = 86_400_000_000  # 1 day
_GRID_END_US = _GRID_START_US + 30 * _GRID_STEP_US


@register(
    "resample_ffill_events",
    # Composes asof_join, whose class is driver-carried by
    # `asof_join_events`; the resampling composition registers late.
    late=True,
    oracle=f"""
    WITH keys AS (SELECT DISTINCT user_id FROM events
                  WHERE event_type = 'purchase' AND user_id < 30),
    grid AS (
      SELECT user_id, unnest(range({_GRID_START_US}, {_GRID_END_US}, {_GRID_STEP_US})) AS grid_ts
      FROM keys
    ),
    obs AS (
      SELECT user_id, epoch_us(ts) AS rts, MAX(value) AS v
      FROM events WHERE event_type = 'purchase' AND user_id < 30 GROUP BY 1, 2
    )
    SELECT g.user_id, g.grid_ts, o.v, o.rts AS asof_ts
    FROM grid g ASOF LEFT JOIN obs o ON g.user_id = o.user_id AND g.grid_ts >= o.rts
    """,
)
def resample_ffill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily forward-filled resampling of each user's latest purchase
    value over January 2024 (extensions/temporal.py::resample_ffill —
    a per-key generated grid composed with the as-of join; grid points
    before a user's first purchase stay NULL). The oracle regenerates
    the grid with range() and DuckDB's native ASOF JOIN."""
    from cloud_dataflow_batch_processing_spark.extensions.temporal import resample_ffill

    ev = load_tables(spark, sf_dir)["events"].filter(F.col("user_id") < 30)
    obs = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", _epoch_us("ts").alias("rts"))
        .agg(F.max("value").alias("v"))
    )
    out = resample_ffill(
        obs,
        on=["user_id"],
        ts="rts",
        value_cols=["v"],
        start=_GRID_START_US,
        end=_GRID_END_US,
        step=_GRID_STEP_US,
    )
    return out.select("user_id", "grid_ts", "v", F.col("__asof_ts").alias("asof_ts"))


_SESSION_GAP_US = 1_800_000_000  # 30 min


@register(
    "sessionize_events",
    # Session-window class is driver-carried by `window_session`
    # (merge-on-touch aggregate); this id-assigning batch variant
    # r7: promoted into the driver's 50-query window (window rotation
    # — this operator class had only local-oracle coverage before).
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) NULLS FIRST, event_id)
    ),
    s AS (
      SELECT user_id, event_id, ts_us,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us NULLS FIRST, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      FROM o
    )
    SELECT user_id, session_idx, COUNT(*) AS n_events,
           MIN(ts_us) AS session_start, MAX(ts_us) AS session_end
    FROM s GROUP BY user_id, session_idx
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization with explicit session ids: a session break
    is a >30-min gap since the user's previous event (lag), and the
    session index is the running sum of breaks — the standard
    two-window formulation, parallel per user. Unlike `window_session`
    (merged-window aggregate) this labels events, which is what
    downstream per-session features join against."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_id", _epoch_us("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    brk = F.when(
        F.col("ts_us") - F.lag("ts_us").over(w) > _SESSION_GAP_US, F.lit(1)
    ).otherwise(F.lit(0))
    s = ev.select(
        "user_id",
        "ts_us",
        "event_id",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_idx"),
    )
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start"),
        F.max("ts_us").alias("session_end"),
    )


@register(
    "rolling_avg_events",
    # Analytic-window class is driver-carried by `window_rank_analytics`
    # (rank/lag); the moving-frame aggregate twin registers late.
    late=True,
    oracle=f"""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS avg7
    FROM events WHERE event_type = 'purchase' AND user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-frame aggregate: 7-row trailing average of purchase
    values per user (decimal-exact mean, ROWS frame so ties are
    deterministic via the event_id tiebreak)."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir)["events"].filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 50)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(_epoch_us("ts"), "event_id")
        .rowsBetween(-6, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        (
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("avg7"),
    )


@register(
    "funnel_signup_click_purchase",
    # Product-analytics composition of driver-carried classes
    # r7: promoted into the driver's 50-query window (window rotation
    # — this operator class had only local-oracle coverage before).
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > s.t_signup
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM c) AS n_clicked_after,
           (SELECT COUNT(*) FROM p) AS n_purchased_after,
           (SELECT MIN(t_purchase) FROM p) AS first_conversion_us
    """,
)
def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: users who signed up, then clicked
    strictly after their first signup, then purchased strictly after
    that first qualifying click. Each stage is a conditional MIN per
    user joined forward (the per-stage frames are one row per user —
    broadcast-size relative to the event log at any scale), so the
    event table is scanned once per stage with the type filter pushed
    down, and no window ever spans a whole user timeline."""
    ev = load_tables(spark, sf_dir)["events"]
    us = _epoch_us("ts")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("t_signup"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(s), "user_id")
        .filter(us > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min(us).alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(us > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min(us).alias("t_purchase"))
    )
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after")))
        .crossJoin(
            p.agg(
                F.count(F.lit(1)).alias("n_purchased_after"),
                F.min("t_purchase").alias("first_conversion_us"),
            )
        )
    )


_WEEK_US = 7 * 86_400_000_000


@register(
    "retention_cohorts",
    # Cohort retention = two narrow aggregates over carried classes;
    # r7: promoted into the driver's 50-query window (window rotation
    # — this operator class had only local-oracle coverage before).
    oracle=f"""
    WITH first_seen AS (
      SELECT user_id, MIN(epoch_us(ts)) // {_WEEK_US} AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             (epoch_us(e.ts) // {_WEEK_US}) - f.cohort_week AS week_offset
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_active_users
    FROM activity GROUP BY cohort_week, week_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, with
    distinct active users per (cohort, week offset). The first-seen
    frame is one row per user (broadcast back), the distinct is over
    (user, offset) — integer epoch-week arithmetic, exact on both
    engines."""
    ev = load_tables(spark, sf_dir)["events"]
    us = _epoch_us("ts")
    # Integer week bucket without a double division: us % W is exact
    # long arithmetic and (us - us % W) / W divides an exact multiple,
    # so the double quotient is integral and the cast is lossless —
    # matching DuckDB's BIGINT // exactly even at bucket boundaries.
    week = ((us - us % _WEEK_US) / F.lit(_WEEK_US)).cast("long")
    first_seen = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = (
        ev.join(F.broadcast(first_seen), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (week - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )

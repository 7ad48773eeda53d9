"""Time-series operators over the events table: gap-filled resampling
and last-observation-carried-forward interpolation.

These are the two operators every time-series/feature-pipeline user
reaches for that plain GROUP BY can't express: a regular grid with
explicit empty buckets (dashboards, feature windows, anomaly baselines)
and forward-fill of a sparse signal onto every observation row.

Scale notes: the spine is generated data (~O(range/step) rows, never a
scan) and broadcasts against the aggregated — not raw — events; LOCF is
one window pass per user partition (rows-frame running ``last`` with
ignorenulls, no self-join). Both stay entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from novlake_spark.operators.numerics import grid
from novlake_spark.registry import register
from novlake_spark.sources.tables import load_table


@register(
    "q_ts_resample",
    oracle="""
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                    TIMESTAMP '2024-01-30 00:00:00',
                                    INTERVAL 1 HOUR)) AS hour),
    agg AS (
      SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS tv
      FROM events GROUP BY 1)
    SELECT strftime(spine.hour, '%Y-%m-%d %H:%M:%S') AS hour_start,
           coalesce(n, 0) AS n_events,
           coalesce(tv, 0.0) AS total_value
    FROM spine LEFT JOIN agg ON spine.hour = agg.hour
    """,
)
def q_ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS1: hourly resample with zero-filled gaps — generated spine
    LEFT JOIN hourly aggregate (the spine joins the *aggregated* side,
    so the raw table is never inflated)."""
    events = load_table(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-30 00:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour")
    )
    # exact: cents grid per row, order-free BIGINT sum, one division
    # (round-10 float-class phase 2)
    agg = events.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(grid(F.col("value"), 100)).cast("long") / F.lit(100.0)).alias("tv"),
    )
    return spine.join(agg, "hour", "left").select(
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.coalesce("tv", F.lit(0.0)).alias("total_value"),
    )


@register(
    "q_ts_locf",
    oracle="""
    SELECT event_id, user_id,
           round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS last_purchase_value
    FROM events
    """,
)
def q_ts_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS2: forward-fill (LOCF) — carry each user's last purchase value
    onto every subsequent event; null until the first purchase. One
    running-window pass, total order via (ts, event_id)."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    return events.select(
        "event_id",
        "user_id",
        F.round(F.last(sparse, ignorenulls=True).over(w), 2).alias("last_purchase_value"),
    )


@register(
    "q_ts_gapfill",
    oracle="""
    WITH b AS (SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS d0,
                      CAST(max(date_trunc('day', ts)) AS DATE) AS d1 FROM events),
    days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
    users AS (SELECT DISTINCT user_id FROM events),
    daily AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                     count(*) AS n,
                     CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS tv
              FROM events GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE))
    SELECT u.user_id, strftime(d.day, '%Y-%m-%d') AS day,
           coalesce(n, 0) AS n_events, coalesce(tv, 0.0) AS total_value
    FROM users u
    CROSS JOIN days d
    LEFT JOIN daily ON daily.user_id = u.user_id AND daily.day = d.day
    """,
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K: dense calendar gap-fill — a generated day spine crossed with
    the user dimension, left-joined to the sparse daily aggregate so
    silent days surface as explicit zero rows.

    The spine is sequence()+explode over a single-row min/max aggregate
    — O(days) rows, broadcast to the user dimension, so the only real
    shuffle is the daily aggregation of the fact scan. At 100 TB the
    spine stays tiny (it scales with the calendar, not the data) and
    the left join keys on (user, day), the same key the aggregate just
    produced."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    users = e.select("user_id").distinct()
    # exact: cents grid per row (round-10 float-class phase 2)
    daily = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(grid(F.col("value"), 100)).cast("long") / F.lit(100.0)).alias("tv"),
    )
    return (
        users.crossJoin(F.broadcast(days))
        .join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("tv", F.lit(0.0)).alias("total_value"),
        )
    )


@register(
    "q_ts_interpolate",
    oracle="""
    WITH x AS (
      SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
             CASE WHEN event_type = 'purchase' THEN value END AS sv,
             CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) // 1000 END AS st
      FROM events),
    w AS (
      SELECT event_id, user_id, us,
             last_value(sv IGNORE NULLS)  OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(st IGNORE NULLS)  OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(sv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(st IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM x)
    SELECT event_id, user_id,
           floor((CASE
                    WHEN pt IS NOT NULL AND nt IS NOT NULL AND pt <> nt
                      THEN pv + (nv - pv) * (us - pt) / (nt - pt)
                    WHEN pt IS NOT NULL THEN pv
                  END) * 10000 + 0.5) / 10000 AS interp_value
    FROM w
    """,
)
def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS4: linear interpolation — each user's sparse purchase-value
    signal evaluated at EVERY event timestamp: interior points
    interpolate linearly between the bracketing purchases (exact
    epoch-micros arithmetic), the tail extends flat (LOCF), the head is
    null until the first observation.

    Same single-shuffle shape as LOCF: one hash partition by user, one
    sort, four frame-bounded window passes over it — Catalyst plans ONE
    Exchange + ONE Sort for all four (shared window spec), so the cost
    at 100 TB equals one window pass regardless of how many bracketing
    values the formula needs. Rounding uses the shared floor-formula
    (SURVEY §5.3) to sidestep HALF_UP/HALF_EVEN divergence."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us"), "event_type", "value"
    )
    sv = F.when(F.col("event_type") == "purchase", F.col("value"))
    st = F.when(F.col("event_type") == "purchase", F.col("us"))
    ord_w = Window.partitionBy("user_id").orderBy("us", "event_id")
    w_prev = ord_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = ord_w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    pv = F.last(sv, ignorenulls=True).over(w_prev)
    pt = F.last(st, ignorenulls=True).over(w_prev)
    nv = F.first(sv, ignorenulls=True).over(w_next)
    nt = F.first(st, ignorenulls=True).over(w_next)
    interp = (
        F.when(
            pt.isNotNull() & nt.isNotNull() & (pt != nt),
            pv + (nv - pv) * (F.col("us") - pt) / (nt - pt),
        )
        .when(pt.isNotNull(), pv)
    )
    return e.select(
        "event_id",
        "user_id",
        (F.floor(interp * 10000 + F.lit(0.5)) / 10000).alias("interp_value"),
    )

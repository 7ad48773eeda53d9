"""§2.J — event-time windowed analytics (batch-equivalent keys).

Each key here is the *batch* form of a Structured Streaming operator;
novlake_spark.streaming.events builds the identical logical plans over
``readStream`` and tests prove the same results arrive incrementally
(availableNow trigger). The driver oracle grades the batch form FULL.

Window alignment note: Spark's ``window()`` buckets align to the Unix
epoch, so for the fixtures' 2024-01 range a 1-hour tumble ≡ DuckDB
``date_trunc('hour', ts)`` and a 15-minute slide grid matches a
``generate_series`` of epoch-aligned starts (verified in SURVEY.md §2.J).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from novlake_spark.registry import register
from novlake_spark.sources.tables import load_table


@register(
    "q_stream_tumbling",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY date_trunc('hour', ts)
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: tumbling 1-hour event-time window aggregation."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_stream_sliding",
    oracle="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n_events
    FROM events e
    JOIN (SELECT unnest(generate_series(TIMESTAMP '2023-12-31 23:15:00',
                                        TIMESTAMP '2024-02-01 00:00:00',
                                        INTERVAL 15 MINUTE)) AS ws) s
      ON e.ts >= s.ws AND e.ts < s.ws + INTERVAL 1 HOUR
    GROUP BY ws
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: sliding window (1 h length, 15 min slide) — each event lands
    in 4 overlapping windows; oracle reproduces the epoch-aligned grid
    with generate_series + containment join."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"), "n_events")
    )


@register(
    "q_stream_session",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 10 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id,
           CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM g GROUP BY user_id
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: session windows (10-minute gap) per user — Spark's native
    ``session_window``; the oracle derives identical sessions with
    gaps-and-islands SQL (new-session flags summed)."""
    events = load_table(spark, sf_dir, "events")
    sessions = events.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w")).agg(
        F.count(F.lit(1)).alias("n_in_session")
    )
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_in_session").alias("n_events"),
    )


@register(
    "q_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: dedup by key — batch form of streaming
    dropDuplicates-with-watermark (same dropDuplicates call)."""
    return load_table(spark, sf_dir, "events").select("user_id", "event_type").dropDuplicates()


@register(
    "q_stream_user_counts",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
)
def q_stream_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: running per-user counts — batch form of the streaming
    update-mode keyed aggregation."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value")
    )

"""Structured Streaming over the events table (SURVEY.md §2.J).

The reference is batch-only (novlake appends partitions and re-queries;
SURVEY.md §1.1) — this module is the capability extension: the *same
logical plans* as inventory/events.py, built over ``readStream``, so
batch results and incremental results provably agree (asserted in
tests/test_streaming.py via the availableNow trigger).

Scale/ops notes:
- File-source streams list new files per micro-batch;
  ``maxFilesPerTrigger`` bounds batch size for replay/backfill.
- ``withWatermark`` bounds state: aggregation state for windows older
  than (max event time − delay) is evicted — without it, a windowed
  stream grows state forever. 30 min covers the fixture's out-of-order
  span while keeping state small.
- Parquet sink + checkpointLocation gives exactly-once output; the
  memory sink here is for tests/driver smoke only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from novlake_spark.operators.numerics import grid
from novlake_spark.session import tune
from novlake_spark.sources.tables import normalize_event_ts


def events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """The events table as a file-source stream (Parquet replay).

    File-source streams require an explicit schema; we take it from a
    batch read of the same file instead of hard-coding one, so whatever
    dtype this Spark build gives the TIMESTAMP(NANOS) column (bigint /
    timestamp_ntz / timestamp — it has changed between builds) the
    stream sees the truth, and :func:`normalize_event_ts` — the SAME
    helper the batch path uses — converts it to a watermarkable
    session-TZ ``timestamp``. Round 1 hard-coded ``ts LongType`` here
    and every streaming test silently landed in 1970 when the reader
    switched to NTZ.
    """
    tune(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    reader = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(sf_dir)
    return normalize_event_ts(df)


def stream_tumbling(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """J1 incremental: 1-hour tumbling counts with bounded state.

    Cents-grid sum, identical to the graded batch twin
    (inventory/events.q_stream_tumbling, round-10 float phase 2) — and
    load-bearing HERE too: incremental state folds partial sums in
    arrival order, batch folds in scan order, so a raw float sum could
    make stream==batch equivalence flake exactly like the cross-engine
    class."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(grid(F.col("value"), 100)).cast("long") / F.lit(100.0)).alias(
                "total_value"
            ),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "n_events",
            "total_value",
        )
    )


def stream_user_counts(stream: DataFrame) -> DataFrame:
    """J6 incremental: keyed running counts (update/complete mode).
    Cents-grid sum matching the graded batch twin (see stream_tumbling's
    rationale)."""
    return stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(grid(F.col("value"), 100)).cast("long") / F.lit(100.0)).alias(
            "total_value"
        ),
    )


def stream_dedup(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """J5 incremental: watermark-bounded dropDuplicates on the event key."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def stream_session_counts(stream: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes") -> DataFrame:
    """J3 incremental: per-user session windows (10-minute gap)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_in_session"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_in_session")
    )


def stream_stream_purchase_click_join(
    purchases: DataFrame, clicks: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to same-user
    clicks in the preceding ``horizon``.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so each side's buffered state is evicted once the other
    side's watermark passes — without the time-range bound a
    stream-stream join buffers forever. State per key ≈ arrival rate ×
    (horizon + watermark delay).
    """
    p = purchases.withWatermark("ts", "30 minutes").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    c = clicks.withWatermark("ts", "30 minutes").select(
        F.col("event_id").alias("c_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    return p.join(c, cond).select("p_id", "c_id", F.col("p_user").alias("user_id"))


def run_available_now(df: DataFrame, name: str, output_mode: str = "complete") -> DataFrame:
    """Drain the whole backlog through the incremental engine into a
    memory sink (J8); returns the sink contents as a DataFrame."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)

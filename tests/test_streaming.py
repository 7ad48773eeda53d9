"""Structured Streaming (§2.J): the incremental plans produce the same
results as their batch-equivalent graded keys, via availableNow replay."""

import pyspark.sql.functions as F
import pytest

from novlake_spark import streaming as S
from novlake_spark.inventory.events import q_stream_tumbling, q_stream_user_counts
from novlake_spark.sources.tables import load_table


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, sf_small):
    stream = S.events_stream(spark, sf_small)
    assert stream.isStreaming
    out = S.run_available_now(S.stream_tumbling(stream), "t_tumble", "complete")
    batch = q_stream_tumbling(spark, sf_small)
    cols = ["hour_start", "n_events", "total_value"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_user_counts_stream_equals_batch(spark, sf_small):
    stream = S.events_stream(spark, sf_small)
    out = S.run_available_now(S.stream_user_counts(stream), "t_users", "complete")
    batch = q_stream_user_counts(spark, sf_small)
    cols = ["user_id", "n_events", "total_value"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_stream_dedup_drops_replayed_duplicates(spark, sf_small, tmp_path):
    """Replaying the same file twice through a dedup stream keeps one copy."""
    src = str(tmp_path / "dup_src")
    events = load_table(spark, sf_small, "events").limit(200)
    events.write.mode("overwrite").parquet(src)

    raw = (
        spark.readStream.schema(events.schema).parquet(src)
        .withWatermark("ts", "30 minutes")
        .dropDuplicates(["event_id"])
    )
    q = raw.writeStream.format("memory").queryName("t_dedup").outputMode("append").trigger(availableNow=True).start()
    q.awaitTermination()
    n1 = spark.table("t_dedup").count()
    assert n1 == 200


def test_session_window_stream_runs(spark, sf_small):
    stream = S.events_stream(spark, sf_small)
    out = S.run_available_now(S.stream_session_counts(stream), "t_sess", "complete")
    assert out.count() > 0
    assert {"user_id", "session_start", "n_in_session"} <= set(out.columns)


def test_stream_stream_interval_join_matches_batch(spark, sf_small):
    from novlake_spark.streaming.events import stream_stream_purchase_click_join

    stream = S.events_stream(spark, sf_small)
    p = stream.filter(F.col("event_type") == "purchase")
    c = stream.filter(F.col("event_type") == "click")
    out = stream_stream_purchase_click_join(p, c)
    q = (
        out.writeStream.format("memory").queryName("t_ssj").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {(r.p_id, r.c_id) for r in spark.table("t_ssj").collect()}

    ev = load_table(spark, sf_small, "events")
    bp = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("u"), F.col("ts").alias("p_ts")
    )
    bc = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("c_id"), F.col("user_id").alias("u2"), F.col("ts").alias("c_ts")
    )
    want = {
        (r.p_id, r.c_id)
        for r in bp.join(
            bc,
            (F.col("u") == F.col("u2"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_watermark_bounds_state(spark, sf_small):
    """Late-data semantics: with append mode + watermark, only finalized
    windows are emitted — the count can't exceed the complete-mode count."""
    stream = S.events_stream(spark, sf_small)
    agg = S.stream_tumbling(stream, watermark="30 minutes")
    q = (
        agg.writeStream.format("memory").queryName("t_wm").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    appended = spark.table("t_wm").count()
    complete = q_stream_tumbling(spark, sf_small).count()
    assert appended <= complete

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


def test_streaming_crawl_pipeline(spark, tmp_path):
    """The round-5 crawl family composes with Structured Streaming:
    a stream of WARC blobs (file source, one blob per parquet file)
    flows through read_warc (mapInPandas) -> extract_html_text
    (pandas_udf) -> token gate, incrementally, and availableNow replay
    produces exactly the batch result — the incremental-CommonCrawl
    shape."""
    import html as _html

    from novlake_spark.operators.htmltext import extract_html_text
    from novlake_spark.operators.warc import encode_warc_record, read_warc

    def page(i, words):
        return (
            f"<html><body><nav>skip</nav><main><h1>D{i}</h1>"
            f"<p>{_html.escape(words)}</p></main></body></html>"
        )

    blobs = []
    for b in range(3):
        blob = b""
        for i in range(b * 4, b * 4 + 4):
            blob += encode_warc_record(
                f"http://x.com/doc/{i}", 200, "text/html; charset=utf-8",
                page(i, ("w " * (i + 1)).strip()).encode(),
                record_id=f"urn:t:{i}",
            )
        blobs.append((b, bytearray(blob)))

    src = str(tmp_path / "warc_stream")
    spark.createDataFrame(blobs, "blob_id long, warc binary").repartition(3).write.parquet(src)

    stream = spark.readStream.schema("blob_id long, warc binary").parquet(src)
    curated = (
        extract_html_text(read_warc(stream), col="html")
        .select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
            F.size(F.split("extracted", " ")).alias("n_tokens"),
        )
        .filter(F.col("n_tokens") >= 6)  # 'D{i}' + i+1 words >= 6 → i >= 4
    )
    q = (
        curated.writeStream.format("memory").queryName("t_crawl")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "cp")).start()
    )
    q.awaitTermination(120)
    got = _rows(spark.table("t_crawl"), ["doc_id", "n_tokens"])
    want = sorted((i, i + 2) for i in range(12) if i + 2 >= 6)
    assert got == want

"""Operator-level unit semantics: as-of join, multimodal plumbing."""

import datetime as dt

import pyspark.sql.functions as F

from novlake_spark.operators.asof import asof_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(30), 101), (2, _ts(5), 200)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 9, 900), (1, _ts(20), 8, 800), (2, _ts(50), 7, 700)],
        "user_id long, ts timestamp, event_id long, click_id long",
    )
    out = {r.event_id: r.asof_click_id for r in asof_join(left, right, "user_id", "ts", "click_id", "event_id").collect()}
    assert out[100] == 900   # only the ts=5 click precedes ts=10
    assert out[101] == 800   # ts=20 click is latest before ts=30
    assert out[200] is None  # user 2's click is in the future


def test_asof_join_tolerance_boundary(spark):
    """Tolerance is inclusive and compares in integer micros: a match
    EXACTLY at the bound survives, one microsecond past it nulls out."""
    tol = 60_000_000  # one minute
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (2, _ts(10), 200), (3, _ts(10), 300)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(9), 9, 900),                                     # gap = tol exactly
            (2, dt.datetime(2024, 1, 1, 0, 8, 59, 999999), 8, 800),  # gap = tol + 1 µs
            (3, _ts(10), 7, 700),                                    # gap = 0
        ],
        "user_id long, ts timestamp, event_id long, click_id long",
    )
    out = {
        r.event_id: r.asof_click_id
        for r in asof_join(
            left, right, "user_id", "ts", "click_id", "event_id",
            tolerance_micros=tol,
        ).collect()
    }
    assert out[100] == 900
    assert out[200] is None
    assert out[300] == 700


def test_asof_join_forward(spark):
    """direction='forward' picks the EARLIEST at-or-after right row;
    rows with no future match stay null."""
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(40), 101), (2, _ts(50), 200)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [(1, _ts(20), 9, 900), (1, _ts(30), 8, 800), (2, _ts(5), 7, 700)],
        "user_id long, ts timestamp, event_id long, click_id long",
    )
    out = {
        r.event_id: r.asof_click_id
        for r in asof_join(
            left, right, "user_id", "ts", "click_id", "event_id",
            direction="forward",
        ).collect()
    }
    assert out[100] == 900   # earliest of the two future clicks
    assert out[101] is None  # nothing at-or-after ts=40
    assert out[200] is None  # user 2's click is in the past


def test_asof_join_no_pairwise_blowup(spark):
    """Plan shape: the as-of is a window over a union — no Join node."""
    left = spark.range(10).select(
        F.col("id").alias("user_id"), F.lit(dt.datetime(2024, 1, 1)).alias("ts"), F.col("id").alias("event_id")
    )
    right = left.withColumn("click_id", F.col("event_id") * 10)
    df = asof_join(left, right, "user_id", "ts", "click_id", "event_id")
    from novlake_spark.plans import explain_str

    assert "Join" not in explain_str(df)

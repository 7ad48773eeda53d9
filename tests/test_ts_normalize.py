"""Event-timestamp normalization (sources/tables.normalize_event_ts).

The events fixture's Parquet TIMESTAMP(NANOS) column has arrived as
three different dtypes across Spark builds (bigint with nanosAsLong,
timestamp_ntz on Spark 4.1+, plain timestamp). Every arrival mode must
normalize to the SAME session-TZ timestamp micros, or downstream
consumers (unix_micros, withWatermark) break — this regressed silently
in round 1, so each mode is pinned here explicitly.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from novlake_spark.sources.tables import load_table, normalize_event_ts

NS = 1_755_000_000_123_456_789  # some epoch nanos with sub-micro digits
US = NS // 1000  # micros truncation, the agreed oracle semantics


def test_bigint_nanos_arrival(spark):
    df = spark.createDataFrame([(NS,)], "ts BIGINT")
    out = normalize_event_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.select(F.unix_micros("ts").alias("us")).collect()[0]["us"] == US


def test_timestamp_ntz_arrival(spark):
    # Simulate the Spark 4.1+ native nanos read: NTZ wall-clock, micros
    # precision. Session TZ is UTC so the cast must be epoch-preserving.
    wall = datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=US)
    df = spark.createDataFrame([(wall,)], "ts TIMESTAMP_NTZ")
    out = normalize_event_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.select(F.unix_micros("ts").alias("us")).collect()[0]["us"] == US


def test_timestamp_arrival_passthrough(spark):
    df = spark.createDataFrame([(NS,)], "raw BIGINT").select(
        F.timestamp_micros(F.expr("raw DIV 1000")).alias("ts")
    )
    out = normalize_event_ts(df)
    assert out is df  # no-op, no extra projection
    assert out.select(F.unix_micros("ts").alias("us")).collect()[0]["us"] == US


def test_unknown_dtype_raises(spark):
    df = spark.createDataFrame([("oops",)], "ts STRING")
    with pytest.raises(TypeError, match="events.ts arrived as"):
        normalize_event_ts(df)


def test_missing_column_is_noop(spark):
    df = spark.createDataFrame([(1,)], "x BIGINT")
    assert normalize_event_ts(df) is df


def test_load_table_postcondition(spark, sf_small):
    df = load_table(spark, sf_small, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # unix_micros must resolve — the exact call that crashed q_scd2_build.
    assert df.select(F.unix_micros("ts")).limit(1).count() == 1


def test_ensure_parallelism_rejects_derived_frames(spark, sf_small):
    """The 'only call on plain scans' contract is enforced, not advised
    (VERDICT r2 'what's wrong' #2): a derived frame raises instead of
    triggering partial execution via .rdd under AQE."""
    import pytest

    from novlake_spark.sources.tables import ensure_parallelism, load_table

    docs = load_table(spark, sf_small, "documents")
    assert ensure_parallelism(docs) is not None  # plain scan: fine
    assert ensure_parallelism(docs.select("doc_id").filter("doc_id > 0")) is not None
    for derived in (
        docs.groupBy("lang").count(),
        docs.join(docs.select("doc_id"), "doc_id"),
        docs.repartition(4),
    ):
        with pytest.raises(ValueError, match="plain scan"):
            ensure_parallelism(derived)

"""SparkSession construction and tuning.

Two entry points:

- :func:`get_session` builds a session from scratch (bench.py, tests).
- :func:`tune` applies the *dynamic* subset of the same configuration to
  an externally provided session (the correctness driver passes its own
  ``SparkSession`` into ``queries()`` callables; all confs we rely on are
  runtime-settable SQL confs — verified for ``nanosAsLong``).

Scale notes (100 TB / 1000-executor target):

- ``spark.sql.adaptive.enabled`` — AQE re-plans at stage boundaries:
  coalesces small shuffle partitions, splits skewed ones
  (``skewJoin.enabled``), and demotes sort-merge joins to broadcast when
  runtime stats allow. This is the main lever that makes one static conf
  work from sf0.001 up to cluster scale.
- ``spark.sql.shuffle.partitions`` — local default kept small (32 = one
  per core on the test box); on a real cluster you set this to 2–3×
  total cores, or leave AQE's ``coalescePartitions`` to shrink an
  intentionally high initial number. Exposed as a parameter.
- ``spark.sql.files.maxPartitionBytes`` stays at the 128 MB default: at
  100 TB that yields ~800k input splits, which the scheduler handles and
  AQE coalesces post-shuffle.
- Timestamps are normalized to UTC session time so results are
  reproducible across machines (and match the DuckDB oracle).
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession

#: Confs that are safe (and verified) to set on a live session.
DYNAMIC_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # events.parquet carries TIMESTAMP(NANOS) which Spark's Parquet reader
    # rejects; with this legacy flag the column surfaces as a plain long
    # (nanoseconds) that sources.tables converts exactly (SURVEY.md §1.2).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow makes toPandas()/pandas UDF exchange columnar and ~10-100x
    # faster; required for the K-row (pandas UDF) operators to be fast.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Lets Catalyst hand pushed predicates to Python Data Sources —
    # the txlog source's pushFilters (min/max + Bloom file skipping)
    # is inert without it.
    "spark.sql.python.filterPushdown.enabled": "true",
    # Write timestamps as INT64 micros, not the legacy INT96: Spark
    # timestamps are microsecond-precision either way, but INT96 column
    # chunks carry NO min/max statistics, which would blind the txlog's
    # footer-derived skip index (TxTable._footer_stats) on every
    # timestamp column. Micros is also what Delta/Iceberg write.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


_WARNED_CONFS: set[str] = set()


def tune(spark: SparkSession) -> SparkSession:
    """Apply dynamic confs to an existing session. Idempotent and cheap.

    A conf that fails to set or reads back different from requested is
    logged ONCE per process — never raised (tuning must not break a
    query) but never silent either: a silently-ignored ``nanosAsLong``
    is exactly how the events-timestamp regression rotted unnoticed in
    round 1.
    """
    for key, value in DYNAMIC_CONFS.items():
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
                if spark.conf.get(key, None) != value and key not in _WARNED_CONFS:
                    _WARNED_CONFS.add(key)
                    logging.getLogger(__name__).warning(
                        "conf %s did not take (wanted %r, have %r)",
                        key, value, spark.conf.get(key, None),
                    )
        except Exception as exc:
            if key not in _WARNED_CONFS:
                _WARNED_CONFS.add(key)
                logging.getLogger(__name__).warning("conf %s failed to set: %s", key, exc)
    return spark


def get_session(
    app_name: str = "novlake-spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's configuration.

    ``master`` defaults to ``local[*]`` when no cluster is configured; on
    a real deployment the master/deploy-mode comes from spark-submit and
    this builder only contributes SQL confs.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    else:
        builder = builder.master("local[*]")
    builder = builder.config("spark.ui.enabled", "false")
    # In local mode the driver JVM IS the executor; Spark's 1g default
    # GC-thrashes 32 concurrent tasks at the sf1 rehearsal scale. Only
    # effective before JVM start, ignored when spark-submit sets it.
    builder = builder.config("spark.driver.memory", "16g")
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for key, value in DYNAMIC_CONFS.items():
        builder = builder.config(key, value)
    if extra:
        for key, value in extra.items():
            builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return tune(spark)

"""Fixture-table loading: Parquet scans with the events nanos shim.

The ten graded tables (TESTDATA.md) are plain Parquet files. All load
through ``spark.read.parquet`` so Catalyst's scan planning applies —
column pruning (``ReadSchema``), predicate pushdown (``PushedFilters``)
and, for partitioned layouts written by :class:`novlake_spark.lake.Lake`,
partition pruning, are all automatic downstream of this function.

``events`` special case: its ``ts`` column is Parquet TIMESTAMP(NANOS).
Depending on the Spark build and the
``spark.sql.legacy.parquet.nanosAsLong`` flag's effectiveness, that
column arrives as one of THREE dtypes, and each must normalize to a
session-TZ ``timestamp`` (micros) or downstream consumers
(``unix_micros``, ``withWatermark``) break:

- ``bigint`` (nanosAsLong honored): *integer* division ``DIV 1000`` →
  microseconds — exactly the truncation DuckDB applies when reading
  nanos into its µs-precision timestamps. Floating-point division would
  round-to-nearest-double and disagree with the oracle on ~1 in 10⁴
  rows.
- ``timestamp_ntz`` (Spark 4.1+ reads nanos natively, truncated to
  micros, as NTZ): cast to ``timestamp``. The session timezone is
  pinned to UTC (session.DYNAMIC_CONFS), so the wall-clock
  reinterpretation is epoch-preserving and micros agree with
  ``epoch_ns(ts) // 1000`` on the oracle side.
- ``timestamp``: already normalized, pass through.

Anything else raises immediately — a loud failure here beats the silent
1970-dates / analysis errors that an unnoticed dtype drift causes five
operators downstream (this exact rot happened when ``nanosAsLong``
became a no-op; VERDICT.md round 1, "What's wrong" #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from novlake_spark.session import tune

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


#: (application id, sf_dir, name) → DataFrame. DataFrames are immutable
#: logical plans, so reuse is safe; keying by the Spark application id
#: avoids handing out plans bound to a stopped context (a restarted
#: context gets a fresh app id). Saves the per-call file-listing +
#: footer-read round trip when many queries touch the same tables
#: (bench/driver runs).
_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-TZ ``timestamp``
    (micros), whatever dtype the Parquet reader produced (module
    docstring: bigint-nanos / timestamp_ntz / timestamp).

    Shared by the batch loader and the streaming source so the two paths
    can never diverge again. Raises on an unrecognized dtype rather than
    letting a silently-wrong column flow downstream.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype is None:
        return df
    if dtype == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` DIV 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    if dtype == "timestamp":
        return df
    raise TypeError(
        f"events.{col} arrived as {dtype!r}; expected bigint (nanosAsLong), "
        "timestamp_ntz, or timestamp. Update normalize_event_ts for this "
        "Spark build rather than letting downstream operators mis-read it."
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (events get the ts shim)."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _CACHE.get(key)
    if cached is not None:
        return cached
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
        assert dict(df.dtypes)["ts"] == "timestamp", dict(df.dtypes)["ts"]
    _CACHE[key] = df
    return df


def ensure_parallelism(df: DataFrame, min_ratio: float = 0.5) -> DataFrame:
    """Repartition a *freshly scanned* table up to cluster parallelism if
    the scan produced too few splits.

    Parquet can't split below row-group granularity, so a table written
    as one row group scans as ONE partition no matter how many cores
    exist — and any fan-out operator downstream (explode to tokens/
    bigrams/shingles, pairwise scoring) then runs single-threaded.
    Measured here: the sf0.1 documents table scans as 1 partition and a
    bigram pipeline ran 32× under-parallel.

    The check is plan-time only (FileScanRDD partition math, no job) and
    the repartition moves the *compact pre-explode* rows — the cheap
    side of a fan-out. On a real multi-file dataset the scan already
    yields ≥ parallelism splits and this is a no-op, so the shuffle is
    never paid at scale.

    Only callable on plain scans (optionally projected/filtered):
    ``df.rdd`` on a derived frame can trigger partial execution under
    AQE, so the contract is ENFORCED — a plan containing any
    shuffle/join/aggregate/generate node raises ``ValueError`` instead
    of silently executing half a query at plan time.
    """
    _assert_bare_scan(df)
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_ratio)):
        return df.repartition(target)
    return df


#: Logical nodes a "plain scan" may contain — relations plus row-wise
#: narrowing only; anything else (Aggregate, Join, Generate, Window,
#: RepartitionByExpression, …) means the frame is derived.
_BARE_SCAN_NODES = frozenset(
    {"Project", "Filter", "LogicalRelation", "SubqueryAlias", "View", "LogicalRDD"}
)


def is_bare_scan(df: DataFrame) -> bool:
    """True when ``df``'s analyzed plan is a plain (projected/filtered)
    scan — the only shape on which a ``df.rdd`` partition probe is safe:
    on a derived frame the probe materializes any exchange in the plan
    as a wasted plan-time job under AQE (ADVICE r11, measured on the
    repartitioned planted-dedup corpus). Plan-time only, no job."""
    plan = df._jdf.queryExecution().analyzed()

    def walk(node) -> bool:
        if node.nodeName() not in _BARE_SCAN_NODES:
            return False
        return all(
            walk(node.children().apply(i)) for i in range(node.children().size())
        )

    return walk(plan)


def _assert_bare_scan(df: DataFrame) -> None:
    if not is_bare_scan(df):
        raise ValueError(
            "ensure_parallelism requires a plain scan; the plan contains a "
            "derived node — repartition the source before deriving instead"
        )


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register temp views named exactly like the DuckDB oracle views so
    SQL text can be shared between engines where dialects agree."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

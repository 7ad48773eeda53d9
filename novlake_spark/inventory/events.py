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

from novlake_spark.operators.numerics import grid
from novlake_spark.registry import register
from novlake_spark.sources.tables import load_table


@register(
    "q_stream_tumbling",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
    FROM events GROUP BY date_trunc('hour', ts)
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: tumbling 1-hour event-time window aggregation. Exactness:
    value sums ride the per-row cents grid — order-free BIGINT, one
    presentation division (round-10 float-class phase 2)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"))
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
    "q_stream_restart_watermark",
    # side-effecting (two full streaming lifecycles + txlog sink per
    # call): the contract schema sweep reads this declaration instead
    # of executing it twice (same policy as the txlog lifecycle keys)
    declared_schema="day_start string, n_events bigint",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events
                WHERE event_id % 2 = 0)
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day_start,
           count(*) AS n_events
    FROM events, wm
    WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= wm.w
    GROUP BY date_trunc('day', ts)
    """,
)
def q_stream_restart_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 graded (round 10, VERDICT r9 stretch #8): event-time watermark
    persistence ACROSS A RESTART, plus stateful-aggregation recovery and
    append-mode finalization — the streaming semantics no batch-
    equivalence key can reach, as a driver-visible row set.

    Replay: the even-id half of events is committed to a txlog source
    table and drained through ``withWatermark("ts", "1 hour")`` + 1-day
    tumbling counts in one availableNow pass (append mode, exactly-once
    txlog sink); the odd-id half is committed and a SECOND pass resumes
    from the same checkpoint. Pass 1's only batch plans at wm = 0, so it
    emits NOTHING — every window stays in state. Structured Streaming
    persists the post-batch watermark in the commit log, so pass 2's
    batch runs at wm = max(even ts) − 1 h: the odd rows merge into the
    restored state (they are NOT dropped — Spark's late filter guards
    FINALIZED windows, and none were), and at batch end exactly the
    windows with end ≤ wm are finalized and emitted. The graded sink is
    therefore: every day strictly before the restored watermark, with
    FULL (even+odd) counts — stated by the oracle as pure arithmetic.
    Each failure mode is visible: a watermark that fails to persist
    across the restart emits ZERO rows (pass 2 would replan at wm 0); a
    state-recovery fault emits odd-only counts; a replayed epoch is
    caught by the sink's txn dedup; an eviction-boundary flip changes
    the emitted day set. (A true late-DROP needs windows finalized
    BEFORE the late batch, i.e. a mid-stream empty batch advancing the
    watermark — measured in this environment: the Python-source
    availableNow fallback runs exactly one planned batch per start and
    a data-less restart does not re-plan, so the drop path is
    unreachable deterministically; the restart-recovery semantics
    graded here are what the engine actually guarantees across ANY
    micro-batch boundary.)

    Scale: state is O(live windows); each pass reads O(new commits);
    the sink's per-epoch txn dedup is the exactly-once contract LH5
    grades. Fixed availableNow lifecycle overhead => graded, not
    benched (txlog-key policy)."""
    import shutil
    import tempfile

    from novlake_spark.sources.txlog_source import register_txlog_source
    from novlake_spark.txlog import TxTable

    register_txlog_source(spark)
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    root = tempfile.mkdtemp(prefix="novlake-qwm-")
    try:
        src = TxTable(spark, f"{root}/src")

        def drain() -> None:
            agg = (
                spark.readStream.format("txlog")
                .option("path", f"{root}/src")
                .load()
                .withWatermark("ts", "1 hour")
                .groupBy(F.window("ts", "1 day").alias("w"))
                .agg(F.count(F.lit(1)).alias("n_events"))
                .select(
                    F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                        "day_start"
                    ),
                    "n_events",
                )
            )
            q = (
                agg.writeStream.format("txlog")
                .option("path", f"{root}/sink")
                .option("txnAppId", "q-wm-restart")
                .option("checkpointLocation", f"{root}/cp")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "watermark availableNow pass still running after 300 s"
                )
            # The oracle's day set is derived under "each start plans
            # exactly ONE micro-batch" (wm advances only at the batch
            # boundary, so pass 2 runs entirely at the even-rows wm).
            # That holds structurally — the txlog source has no
            # per-trigger cap (latestOffset always returns the newest
            # version, txlog_source.py:492) and availableNow captures
            # the end offset once — but ADVICE r10 asked it be PINNED,
            # not measured: if a future source/engine change splits a
            # pass into n>1 batches, the watermark would advance
            # mid-pass and the emitted day set would silently exceed
            # the oracle's. Fail loudly here instead.
            n_batches = len(q.recentProgress)
            if n_batches != 1:
                raise RuntimeError(
                    f"watermark-restart drain planned {n_batches} "
                    "micro-batches (expected exactly 1); the oracle's "
                    "watermark arithmetic no longer matches the engine"
                )

        src.commit(ev.filter(F.col("event_id") % 2 == 0))
        drain()  # pass 1: wm 0 during the batch; emits nothing
        src.commit(ev.filter(F.col("event_id") % 2 == 1))
        drain()  # pass 2: restored wm finalizes every closed day
        snap = TxTable(spark, f"{root}/sink").read().select("day_start", "n_events")
        return snap.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "q_stream_stream_join",
    # side-effecting (full streaming lifecycle + txlog sink per call):
    # schema sweep reads the declaration (same policy as J4/txlog keys)
    declared_schema="user_id bigint, click_id bigint, purchase_id bigint",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 (round 11): stream-stream event-time INTERVAL JOIN — the
    canonical hard Structured Streaming operator the J-family lacked
    as a REAL streaming lifecycle: clicks and purchases arrive as two
    streams, and each purchase joins every click by the same user in
    the preceding hour. Run end-to-end through the txlog source/sink
    (the J4 infrastructure): both branches readStream from the same
    committed source, carry ``withWatermark("ts", "1 hour")``, inner-
    join on user_id + the time-range predicate, and drain with ONE
    availableNow pass (append mode, exactly-once txlog sink).

    Why the oracle is the plain batch join: inner stream-stream joins
    emit a pair the moment both sides are buffered — no watermark
    finalization gate (that is the OUTER-join wait) — and the single
    planned batch runs at watermark 0, so nothing is late-dropped and
    the emitted set is EXACTLY the batch interval join, restated by
    DuckDB. The single-batch assumption is pinned structurally (the J4
    discipline, ADVICE r10): if the source ever splits the pass, fail
    loudly rather than grade a silently-different row set. Output is
    pure BIGINT ids — no floats, no timestamp formatting.

    Scale: state is keyed by user_id and bounded by the watermark ±
    interval (Spark evicts click state older than wm − 1 h); the join
    shuffles both streams on user_id once — the same exchange a batch
    join would need — and the range predicate prunes within key
    groups. Graded, not benched (fixed availableNow lifecycle
    overhead — the txlog-key policy)."""
    import shutil
    import tempfile

    from novlake_spark.sources.txlog_source import register_txlog_source
    from novlake_spark.txlog import TxTable

    register_txlog_source(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    root = tempfile.mkdtemp(prefix="novlake-qssj-")
    try:
        src = TxTable(spark, f"{root}/src")
        src.commit(ev)

        def branch(etype: str, prefix: str):
            return (
                spark.readStream.format("txlog")
                .option("path", f"{root}/src")
                .load()
                .filter(F.col("event_type") == etype)
                .select(
                    F.col("event_id").alias(f"{prefix}_id"),
                    F.col("user_id").alias(f"{prefix}_user"),
                    F.col("ts").alias(f"{prefix}_ts"),
                )
                .withWatermark(f"{prefix}_ts", "1 hour")
            )

        clicks, purchases = branch("click", "click"), branch("purchase", "purchase")
        joined = clicks.join(
            purchases,
            (F.col("click_user") == F.col("purchase_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
            ),
        ).select(
            F.col("click_user").alias("user_id"),
            "click_id",
            "purchase_id",
        )
        q = (
            joined.writeStream.format("txlog")
            .option("path", f"{root}/sink")
            .option("txnAppId", "q-ss-join")
            .option("checkpointLocation", f"{root}/cp")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("stream-stream join pass still running after 300 s")
        n_batches = len(q.recentProgress)
        if n_batches != 1:
            raise RuntimeError(
                f"stream-stream join drain planned {n_batches} micro-batches "
                "(expected exactly 1); the single-batch oracle equivalence "
                "no longer holds"
            )
        snap = TxTable(spark, f"{root}/sink").read().select(
            "user_id", "click_id", "purchase_id"
        )
        return snap.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


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
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
    FROM events GROUP BY user_id
    """,
)
def q_stream_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: running per-user counts — batch form of the streaming
    update-mode keyed aggregation. Exactness: per-row cents grid →
    order-free BIGINT sum → one division (round-10 float phase 2)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(grid(F.col("value"), 100)).cast("long") / F.lit(100.0)).alias(
            "total_value"
        ),
    )


@register(
    "q_event_funnel",
    oracle="""
    WITH s AS (SELECT user_id, min(ts) AS t_signup FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
         c AS (SELECT e.user_id, min(e.ts) AS t_click
               FROM events e JOIN s ON e.user_id = s.user_id
               WHERE e.event_type = 'click' AND e.ts >= s.t_signup
               GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.ts) AS t_purchase
               FROM events e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
               GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM s) AS n_signup,
           (SELECT count(*) FROM c) AS n_click_after,
           (SELECT count(*) FROM p) AS n_purchase_after
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: ordered conversion funnel (signup → click → purchase), the
    product-analytics staple. Each stage is an aggregation keyed on
    user_id joined to the next stage's filtered events; the stage
    aggregates are user-dimension-sized — SF-scaled, so the joins are
    UNhinted and AQE broadcasts them iff runtime stats fit (at the
    fixture scale they always do; on a billion-user corpus they
    shuffle) — and the event scan stays a single pass per stage with
    the stage predicate pushed down. Counts users whose stages occur
    in time order."""
    events = load_table(spark, sf_dir, "events")
    s = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after")))
    )


@register(
    "q_event_retention",
    oracle="""
    WITH first AS (SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS cd
                   FROM events GROUP BY user_id),
         act AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events)
    SELECT strftime(cd, '%Y-%m-%d') AS cohort_day,
           count(*) AS n_users,
           CAST(sum(CASE WHEN d1.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS d1_retained,
           CAST(sum(CASE WHEN d7.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS d7_retained
    FROM first f
    LEFT JOIN act d1 ON d1.user_id = f.user_id AND d1.d = f.cd + 1
    LEFT JOIN act d7 ON d7.user_id = f.user_id AND d7.d = f.cd + 7
    GROUP BY cd
    """,
)
def q_event_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: cohort retention — users grouped by first-activity day,
    with day-1 and day-7 return counts. The distinct (user, day)
    activity table is built once and joined twice at different lags;
    both joins key on the user dimension (broadcastable), and the
    cohort aggregation is a ~30-row result. Join columns are renamed
    before joining — the two branches share scan lineage, and distinct
    names keep attribute resolution unambiguous."""
    events = load_table(spark, sf_dir, "events")
    first = events.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).cast("date").alias("cd")
    )
    act = events.select("user_id", F.date_trunc("day", "ts").cast("date").alias("d")).distinct()
    d1 = act.select(F.col("user_id").alias("u1"), F.col("d").alias("dd1"))
    d7 = act.select(F.col("user_id").alias("u7"), F.col("d").alias("dd7"))
    j = (
        first.join(
            d1, (F.col("u1") == F.col("user_id")) & (F.col("dd1") == F.date_add("cd", 1)), "left"
        )
        .join(
            d7, (F.col("u7") == F.col("user_id")) & (F.col("dd7") == F.date_add("cd", 7)), "left"
        )
    )
    return j.groupBy("cd").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("dd1").isNotNull(), 1).otherwise(0)).alias("d1_retained"),
        F.sum(F.when(F.col("dd7").isNotNull(), 1).otherwise(0)).alias("d7_retained"),
    ).select(
        F.date_format("cd", "yyyy-MM-dd").alias("cohort_day"),
        "n_users",
        "d1_retained",
        "d7_retained",
    )


@register(
    "q_scd2_build",
    oracle="""
    WITH x AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us, event_type,
             CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)
                       = event_type THEN 0 ELSE 1 END AS chg
      FROM events),
    v AS (
      SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
      FROM x),
    g AS (
      SELECT user_id, version, min(event_type) AS event_type,
             min(us) AS valid_from_us, count(*) AS n_events
      FROM v GROUP BY user_id, version)
    SELECT user_id, version, event_type, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) AS valid_to_us,
           n_events
    FROM g
    """,
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: SCD Type-2 dimension build — collapse each user's event
    stream into validity intervals [valid_from, valid_to) per run of
    identical event_type, open-ended for the current state.

    The lakehouse dimension-versioning primitive. One shuffle on
    user_id serves all three steps (change detection via lag, run
    numbering via running sum, interval close via lead): the window
    partitioning and the groupBy key share the same hash partitioning,
    so Catalyst plans a single Exchange. Timestamps compare as epoch
    micros (integer-truncated from the nanos fixture on both engines,
    see sources/tables.py)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"), "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    x = e.withColumn(
        "chg",
        F.when(F.lag("event_type").over(w) == F.col("event_type"), 0).otherwise(1),
    ).withColumn(
        "version",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    g = x.groupBy("user_id", "version").agg(
        F.min("event_type").alias("event_type"),
        F.min("us").alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("version")
    return g.select(
        "user_id",
        "version",
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(w2).alias("valid_to_us"),
        "n_events",
    )


@register(
    "q_stream_interval_join",
    oracle="""
    WITH p AS (SELECT event_id AS p_id, user_id, epoch_ns(ts) // 1000 AS us
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS c_id, user_id, epoch_ns(ts) // 1000 AS us
               FROM events WHERE event_type = 'click')
    SELECT p.p_id, c.c_id, p.user_id
    FROM p JOIN c ON p.user_id = c.user_id
                 AND c.us <= p.us
                 AND c.us >= p.us - 3600000000
    """,
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8b: stream-stream interval join, graded through its batch twin —
    each purchase matched to same-user clicks in the preceding hour.

    Runs the EXACT function the streaming path uses
    (streaming/events.py stream_stream_purchase_click_join) on batch
    frames: ``withWatermark`` is a no-op in batch, so the graded result
    is the same logical plan the incremental engine executes with
    bounded state (tests/test_streaming.py asserts stream==batch on
    this query). Scale: equi-key on user_id carries the shuffle; the
    time-range predicate is evaluated within key groups, and in
    streaming bounds both sides' buffered state to
    horizon + watermark."""
    from novlake_spark.streaming.events import stream_stream_purchase_click_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    return stream_stream_purchase_click_join(purchases, clicks, horizon="1 hour")


@register(
    "q_event_user_stats",
    oracle="""
    SELECT user_id,
           count(*)                   AS n_events,
           count(DISTINCT event_type) AS n_types,
           min(ts)                    AS first_ts,
           max(ts)                    AS last_ts,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                                      AS total_value_cents
    FROM events
    GROUP BY user_id
    """,
)
def q_event_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-extra: per-user activity profile — the standard user-feature
    build (count, behavioural breadth, first/last seen, spend). One
    hash-partial aggregate; the distinct count rides the same shuffle
    keyed by user. At 100 TB this is THE shape AQE skew-split exists
    for (power users), and partial aggregation caps mapper output at
    users × 6 scalars. Spend is integer cents (round 9 float-class
    audit): ``round(sum(double))`` is order-of-summation-dependent —
    the per-row ``floor(v*100+0.5)`` lands each value on the exact
    grid FIRST and the BIGINT sum is order-free (ORACLE_NOTES.md #4)."""
    ev = load_table(spark, sf_dir, "events")
    cents = grid(F.col("value"), 100)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(cents).cast("long").alias("total_value_cents"),
    )


@register(
    "q_ts_diff",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor((value - lag(value) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id)) * 100 + 0.5) AS BIGINT)
               / CAST(100 AS DOUBLE) AS dv
    FROM events
    """,
)
def q_ts_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS5: per-user first difference (Δvalue in event order) — the
    time-series primitive under rate-of-change, spike detection and
    cumulative-to-incremental conversion. One window shuffle keyed by
    user; ties broken by event_id so the frame is total-ordered and
    deterministic across engines and cluster layouts."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # per-row grid, not round(): the diff is a deterministic double in
    # both engines; round() is the HALF_UP-vs-binary residual class
    # (migrated round 10 as this key rotated)
    return ev.select(
        "event_id",
        "user_id",
        (grid(F.col("value") - F.lag("value").over(w), 100) / F.lit(100.0)).alias(
            "dv"
        ),
    )


@register(
    "q_ts_diff_skewsafe",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor((value - lag(value) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id)) * 100 + 0.5) AS BIGINT)
               / CAST(100 AS DOUBLE) AS dv
    FROM events
    """,
)
def q_ts_diff_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS5b: the SAME per-user first difference as ``q_ts_diff`` — same
    oracle, hash-identical result — computed through the two-phase
    skew-safe plan (operators.skew.skew_safe_lag): range-bucket each
    user's history by ts so the window shuffles on (user, bucket), then
    stitch bucket boundaries through a one-row-per-(user,bucket)
    aggregate. This is the 100 TB answer for hot-key windows, where the
    naive plan puts a 9%-of-traffic user's entire history in ONE task
    and AQE's skew-split (joins only) cannot intervene — VERDICT r4
    wrong #3. Grading both keys against the same DuckDB oracle proves
    the mitigation is a plan change, not a semantics change."""
    from novlake_spark.operators.skew import skew_safe_lag

    ev = load_table(spark, sf_dir, "events")
    lagged = skew_safe_lag(
        ev, part="user_id", order=["ts", "event_id"], value="value", n_buckets=16
    )
    return lagged.select(
        "event_id",
        "user_id",
        (grid(F.col("value") - F.col("_lag"), 100) / F.lit(100.0)).alias("dv"),
    )


@register(
    "q_win_cumsum_skewsafe",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_cents
    FROM events
    """,
)
def q_win_cumsum_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6b: running per-user total through the two-phase skew-safe plan
    (operators.skew.skew_safe_cumsum) — the cumsum member of the
    hot-key window family. Values are scaled to integer cents FIRST:
    the two-phase plan re-associates the fold (in-bucket prefix +
    bucket-total offsets), which is bit-exact only for integer
    addition — float cumsums under ANY distributed re-association
    drift in the last ulp, so money-like columns scale to integers
    (the same discipline Spark's own partial aggregates rely on).
    FULL oracle: DuckDB computes the naive one-shot window over the
    same cents — hash equality proves the re-associated plan exact.

    Cross-engine result-TYPE discipline (the round-5 driver failure,
    CORRECTNESS_r05): DuckDB's windowed ``sum(BIGINT)`` widens to
    HUGEINT, which pandas materializes as float64 — the driver hashes
    ``6.0`` against Spark's int64 ``6`` and fails even though every
    VALUE is equal. The oracle therefore CASTs the window back to
    BIGINT. Cents scaling is ``floor(value*100 + 0.5)`` on BOTH
    engines — F.round is HALF_UP on the shortest-repr decimal while
    DuckDB rounds the binary double, which can disagree at exact .5
    boundaries; one shared floor form has no boundary at all."""
    from novlake_spark.operators.skew import skew_safe_cumsum

    ev = load_table(spark, sf_dir, "events").withColumn(
        "_cents", grid(F.col("value"), 100)
    )
    summed = skew_safe_cumsum(
        ev, part="user_id", order=["ts", "event_id"], value="_cents", n_buckets=16
    )
    return summed.select(
        "event_id", "user_id", F.col("_cumsum").cast("long").alias("cum_cents")
    )


@register(
    "q_session_skewsafe",
    oracle="""
    WITH g AS (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id,
           CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
    FROM g
    """,
)
def q_session_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3b (round 6): per-EVENT session ids through the skew-safe plan —
    sessionization (gaps-and-islands) is the FOURTH hot-key window
    shape: a hot user's whole history is one indivisible partition for
    the naive lag+cumsum formulation AND for session_window's state
    store alike. operators/skew.skew_safe_sessionize composes the two
    existing stitches (lag recovers each event's predecessor timestamp
    across bucket seams; cumsum turns new-session flags into 1-based
    ids with integer-exact re-association). Richer output than
    q_stream_session's per-user aggregate: the per-event session id is
    what downstream session-level features join on. FULL gaps-and-
    islands oracle; the gap compares in integer MICROS on the Spark
    side, exactly DuckDB's interval comparison, and the windowed sum
    CASTs back to BIGINT (the round-6 HUGEINT discipline)."""
    from novlake_spark.operators.skew import skew_safe_sessionize

    ev = load_table(spark, sf_dir, "events")
    s = skew_safe_sessionize(
        ev, part="user_id", order=["ts", "event_id"], ts_col="ts",
        gap_seconds=600, n_buckets=16,
    )
    return s.select(
        "event_id", "user_id", F.col("_session").cast("long").alias("session_id")
    )


@register(
    "q_win_rownum_skewsafe",
    oracle="""
    SELECT event_id, user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
    FROM events
    """,
)
def q_win_rownum_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1b: per-user event sequence number through the two-phase plan
    (operators.skew.skew_safe_row_number — row_number is the cumsum of
    a ones column, so it inherits the integer bit-exactness with no
    scaling step). Third member of the hot-key window family: lag,
    cumsum, row_number cover the three F-family stitch shapes."""
    from novlake_spark.operators.skew import skew_safe_row_number

    ev = load_table(spark, sf_dir, "events")
    rn = skew_safe_row_number(
        ev, part="user_id", order=["ts", "event_id"], n_buckets=16
    )
    return rn.select("event_id", "user_id", F.col("_rn").cast("long").alias("rn"))


@register(
    "q_win_moving_avg_skewsafe",
    oracle="""
    SELECT event_id, user_id,
           round(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                 / (count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                    * 100.0), 4) AS mov_avg
    FROM events
    """,
)
def q_win_moving_avg_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5b: 4-row moving average through the two-phase skew-safe plan
    (operators.skew.skew_safe_moving_avg) — the bounded-frame member
    of the hot-key window family, with a different stitch from
    lag/cumsum: equal-size INDEX buckets (positions from the exact
    two-phase row_number) plus GHOST rows carrying each bucket's tail
    into its successor, so every frame aggregates exactly the rows the
    naive window does. Values scale to integer CENTS first: a 1M-row
    row-by-row comparison measured the float path bit-identical too
    (Spark recomputes bounded frames per row), but that leans on an
    engine implementation detail — integer frame sums are exact under
    ANY execution strategy and cross-engine, so the graded key takes
    the guaranteed path. FULL oracle: the same integer-cents
    formulation in DuckDB, 4-dp rounded. Cents scale via the shared
    boundary-free ``floor(value*100 + 0.5)`` form on both engines
    (see q_win_cumsum_skewsafe's type-discipline note)."""
    from novlake_spark.operators.skew import skew_safe_moving_avg

    ev = load_table(spark, sf_dir, "events").withColumn(
        "_cents", grid(F.col("value"), 100)
    )
    m = skew_safe_moving_avg(
        ev, part="user_id", order=["ts", "event_id"], value="_cents",
        frame_rows=4, n_buckets=16,
    )
    return m.select(
        "event_id",
        "user_id",
        F.round(F.col("_mavg") / 100.0, 4).alias("mov_avg"),
    )

"""Scale-path operators: salted join equivalence, IVF ANN recall,
arbitrary stateful streaming across multiple micro-batches."""

import pyspark.sql.functions as F
import pytest

from novlake_spark.operators import knn as K
from novlake_spark.operators.skew import salted_join
from novlake_spark.sources.tables import load_table


def test_salted_join_equals_plain_join(spark):
    # skewed large side: 90% of rows share key 1
    large = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 50).select(F.col("id").alias("k"), (F.col("id") * 100).alias("dim"))
    plain = {(r.k, r.payload, r.dim) for r in large.join(small, "k").collect()}
    salted = {(r.k, r.payload, r.dim) for r in salted_join(large, small, "k", n_salt=8).collect()}
    assert salted == plain and len(plain) > 0


def test_salted_join_left_outer(spark):
    large = spark.range(0, 100).select(F.col("id").alias("k"), F.col("id").alias("p"))
    small = spark.range(0, 10).select(F.col("id").alias("k"), F.lit("x").alias("d"))
    out = salted_join(large, small, "k", n_salt=4, how="left")
    assert out.count() == 100
    assert out.filter(F.col("d").isNull()).count() == 90


def test_ivf_assignment_covers_all_vectors(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    assigned, cents = K.ivf_assign(emb, n_cells=8)
    assert assigned.count() == emb.count()
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)
    n_used = assigned.select("cell").distinct().count()
    assert n_used >= 4  # centroids spread, not collapsed


def test_ivf_knn_recall(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    exact = K.knn_join_blocked(emb.withColumn("_all", F.lit(1)), "_all", k=5)
    e = {(r.a_id, r.b_id) for r in exact.collect()}

    def recall(df):
        a = {(r.a_id, r.b_id) for r in df.collect()}
        return len(e & a) / len(e)

    r1 = recall(K.ivf_knn(emb, k=5, n_cells=8, n_probe=1))
    r2 = recall(K.ivf_knn(emb, k=5, n_cells=8, n_probe=3))
    assert r1 > 0.2, r1  # vs 1/8 chance under random cells
    assert r2 > r1, (r1, r2)  # multi-probe buys recall


def _stateful_case(spark, sf_small, tmp_path, builder):
    events = load_table(spark, sf_small, "events")
    src = str(tmp_path / "ev_split")
    # three files -> three micro-batches with maxFilesPerTrigger=1
    events.repartition(3).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    return events, builder(stream)


def test_stateful_running_totals_across_batches(spark, sf_small, tmp_path):
    from novlake_spark.streaming.stateful import running_user_totals

    events, out = _stateful_case(spark, sf_small, tmp_path, running_user_totals)
    q = (
        out.writeStream.format("memory").queryName("t_state").outputMode("update")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    sunk = spark.table("t_state").toPandas()
    assert sunk.groupby("user_id").size().max() >= 2  # keys updated across >1 batch

    # the LAST emitted state per user equals the batch ground truth
    final = sunk.groupby("user_id")["n_events"].max()
    truth = {r.user_id: r.n for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    for user, n in final.items():
        assert n == truth[user]


def test_transform_with_state_running_totals(spark, sf_small, tmp_path):
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithStateInPandas needs protobuf (absent in sandbox)",
    )
    from novlake_spark.streaming.stateful import running_user_totals_tws

    # transformWithState requires the RocksDB state store provider
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    events, out = _stateful_case(spark, sf_small, tmp_path, running_user_totals_tws)
    q = (
        out.writeStream.format("memory").queryName("t_tws").outputMode("update")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    sunk = spark.table("t_tws").toPandas()
    final = sunk.groupby("user_id")["n_events"].max()
    truth = {r.user_id: r.n for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    for user, n in final.items():
        assert n == truth[user]


def test_skew_safe_lag_equals_naive_window(spark):
    """skew_safe_lag (two-phase: range-bucketed sub-windows + boundary
    stitch) must equal the one-shot window EXACTLY — on a planted-skew
    table where one user holds ~60% of rows, with duplicate-ts tie
    groups (broken by event_id) sitting right at bucket boundaries."""
    import random

    from pyspark.sql.window import Window

    from novlake_spark.operators.skew import skew_safe_lag

    rng = random.Random(7)
    rows = []
    eid = 0
    for _ in range(600):  # hot user 0: ~60% of rows, heavy ties
        rows.append((eid, 0, rng.randrange(0, 50), round(rng.uniform(0, 100), 3)))
        eid += 1
    for _ in range(400):
        rows.append((eid, 1 + rng.randrange(5), rng.randrange(0, 50),
                     round(rng.uniform(0, 100), 3)))
        eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long, value double")

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    naive = {
        (r.event_id): r.lag
        for r in df.select("event_id", F.lag("value").over(w).alias("lag")).collect()
    }
    two_phase = {
        (r.event_id): r._lag
        for r in skew_safe_lag(
            df, part="user_id", order=["ts", "event_id"], value="value", n_buckets=8
        ).select("event_id", "_lag").collect()
    }
    assert two_phase == naive  # exact, including None for each user's first row


def test_skew_safe_lag_degenerate_single_bucket(spark):
    """All rows at one ts (hi == lo): falls back to the plain window and
    still matches."""
    from pyspark.sql.window import Window

    from novlake_spark.operators.skew import skew_safe_lag

    df = spark.createDataFrame(
        [(i, 0, 5, float(i)) for i in range(10)],
        "event_id long, user_id long, ts long, value double",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    naive = {r.event_id: r.lag for r in df.select("event_id", F.lag("value").over(w).alias("lag")).collect()}
    got = {r.event_id: r._lag for r in skew_safe_lag(df, "user_id", ["ts", "event_id"], "value").select("event_id", "_lag").collect()}
    assert got == naive


def test_skew_safe_cumsum_equals_naive_window(spark):
    """skew_safe_cumsum must equal the one-shot running total EXACTLY on
    integer data (the operator's exactness contract) — planted skew,
    duplicate-ts tie groups, negative values."""
    import random

    from pyspark.sql.window import Window

    from novlake_spark.operators.skew import skew_safe_cumsum

    rng = random.Random(11)
    rows = []
    for eid in range(800):
        user = 0 if eid < 500 else 1 + rng.randrange(4)  # hot user 0
        rows.append((eid, user, rng.randrange(0, 40), rng.randrange(-500, 500)))
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long, v long")

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = {r.event_id: r.cs for r in df.select("event_id", F.sum("v").over(w).alias("cs")).collect()}
    got = {
        r.event_id: r._cumsum
        for r in skew_safe_cumsum(df, "user_id", ["ts", "event_id"], "v", n_buckets=8)
        .select("event_id", "_cumsum")
        .collect()
    }
    assert got == naive


def test_skew_safe_row_number_equals_naive_window(spark):
    """row_number via the ones-cumsum two-phase plan must equal the
    one-shot window exactly (integer math — no float caveat at all)."""
    import random

    from pyspark.sql.window import Window

    from novlake_spark.operators.skew import skew_safe_row_number

    rng = random.Random(13)
    rows = [
        (eid, 0 if eid % 3 else 1 + rng.randrange(3), rng.randrange(0, 30))
        for eid in range(600)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    naive = {r.event_id: r.rn for r in df.select("event_id", F.row_number().over(w).alias("rn")).collect()}
    got = {
        r.event_id: r._rn
        for r in skew_safe_row_number(df, "user_id", ["ts", "event_id"], n_buckets=8)
        .select("event_id", "_rn")
        .collect()
    }
    assert got == naive


def test_skew_safe_moving_avg_equals_naive_window(spark):
    """skew_safe_moving_avg (index buckets + ghost rows): BIT-exact vs
    the one-shot window for INTEGRAL values (the GUARANTEED contract);
    floats also measured bit-identical at 1M rows (Spark recomputes
    bounded frames per row) but the test only demands tolerance there,
    since that leans on an engine implementation detail. Covers: hot
    key, sparse keys smaller than the frame, frames spanning bucket
    boundaries, and a singleton key."""
    import math
    import random

    from pyspark.sql.window import Window

    from novlake_spark.operators.skew import skew_safe_moving_avg

    rng = random.Random(17)
    rows = []
    eid = 0
    for _ in range(500):  # hot user 0
        rows.append((eid, 0, rng.randrange(0, 40), float(rng.randrange(0, 10000))))
        eid += 1
    for u in (1, 2, 3):  # sparse users: 2 rows each (< frame)
        for _ in range(2):
            rows.append((eid, u, rng.randrange(0, 40), float(rng.randrange(0, 10000))))
            eid += 1
    rows.append((eid, 9, 5, 42.0))  # singleton key
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    ).withColumn("v_int", F.col("value").cast("long"))

    for k in (1, 4, 7):
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(-(k - 1), Window.currentRow)
        )
        naive = {r.event_id: r.m for r in df.select("event_id", F.avg("v_int").over(w).alias("m")).collect()}
        got = {
            r.event_id: r._mavg
            for r in skew_safe_moving_avg(
                df, "user_id", ["ts", "event_id"], "v_int", frame_rows=k, n_buckets=8
            ).select("event_id", "_mavg").collect()
        }
        assert got == naive, k  # bit-exact: integer frame sums

        # floats: same frame multiset, tolerance-level agreement only
        naive_f = {r.event_id: r.m for r in df.select("event_id", F.avg("value").over(w).alias("m")).collect()}
        got_f = {
            r.event_id: r._mavg
            for r in skew_safe_moving_avg(
                df, "user_id", ["ts", "event_id"], "value", frame_rows=k, n_buckets=8
            ).select("event_id", "_mavg").collect()
        }
        assert all(math.isclose(got_f[e], naive_f[e], rel_tol=1e-9) for e in naive_f), k


def test_skew_safe_moving_avg_boundary_order_ties(spark):
    """ADVICE r5: when the order key is NOT a total order and a tie
    group straddles an index-bucket boundary, a ghosted bucket-tail row
    ties with the next bucket's head — the window now breaks the tie on
    the exact global row number, so frames stay well-defined. The
    one-shot window is itself frame-nondeterministic under duplicate
    order keys, so the test makes the TIED rows carry equal values
    (any consistent tiebreak then yields value-identical frames) and
    demands exact agreement with the naive plan, with ties planted
    exactly at every bucket junction."""
    from pyspark.sql.window import Window

    from novlake_spark.operators.skew import skew_safe_moving_avg

    # 16 rows, n_buckets=4 -> bucket size 4: junctions after positions
    # 4, 8, 12. Rows 3..4, 7..8, 11..12 (0-based) share one ts value per
    # junction and one VALUE per tie group; everything else is distinct.
    ts_vals = [0, 1, 2, 3, 3, 5, 6, 7, 7, 9, 10, 11, 11, 13, 14, 15]
    tie_value = {3: 100, 4: 100, 7: 200, 8: 200, 11: 300, 12: 300}
    rows = [
        (i, 0, ts_vals[i], tie_value.get(i, (i + 1) * 7))
        for i in range(len(ts_vals))
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long, v long")

    k = 3
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")  # unique tiebreak for the REFERENCE
        .rowsBetween(-(k - 1), Window.currentRow)
    )
    naive = {r.event_id: r.m for r in df.select("event_id", F.avg("v").over(w).alias("m")).collect()}
    got = {
        r.event_id: r._mavg
        for r in skew_safe_moving_avg(
            df, "user_id", ["ts"], "v", frame_rows=k, n_buckets=4  # ties in ts!
        ).select("event_id", "_mavg").collect()
    }
    assert got == naive


def test_skew_safe_sessionize_equals_naive_window(spark):
    """skew_safe_sessionize == the one-shot lag+cumsum sessionization
    for a hot key, sparse keys, singleton keys, and gaps landing
    EXACTLY on the threshold (strictly-greater semantics) and at
    sub-second offsets around it (micros compare, not seconds)."""
    import datetime as dt

    from pyspark.sql.window import Window

    from novlake_spark.operators.skew import skew_safe_sessionize

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    t = 0.0
    import random

    rng = random.Random(23)
    for _ in range(400):  # hot user 0: gaps hovering around 600 s
        t += rng.choice([30.0, 599.999999, 600.0, 600.000001, 1200.0])
        rows.append((eid, 0, base + dt.timedelta(seconds=t)))
        eid += 1
    for u in (1, 2):  # sparse users
        for j in range(3):
            rows.append((eid, u, base + dt.timedelta(seconds=j * 700)))
            eid += 1
    rows.append((eid, 9, base))  # singleton
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = {
        r.event_id: r.sid
        for r in df.withColumn("_p", F.lag("ts").over(w))
        .withColumn(
            "_ns",
            F.when(
                F.col("_p").isNull()
                | (F.unix_micros("ts") - F.unix_micros("_p") > 600 * 1_000_000),
                1,
            ).otherwise(0),
        )
        .select("event_id", F.sum("_ns").over(wc).alias("sid"))
        .collect()
    }
    got = {
        r.event_id: r._session
        for r in skew_safe_sessionize(
            df, "user_id", ["ts", "event_id"], "ts", gap_seconds=600, n_buckets=8
        ).select("event_id", "_session").collect()
    }
    assert got == naive

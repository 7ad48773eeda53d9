"""Lakehouse transaction-log queries (round 7): the txlog ACID layer,
driver-graded with FULL oracles.

The transaction-log surface (novlake_spark/txlog.py: atomic commits,
MERGE, time travel, CDF, deletion vectors, Z-order) was pytest-only
through round 6 — ~3k LoC of the repo's most differentiated machinery
with no driver-visible correctness row. These keys replay a
deterministic commit/merge sequence into a THROWAWAY table under /tmp
and grade the resulting snapshots against plain-SQL restatements of
the same semantics in DuckDB.

Lifetime discipline: the returned DataFrame must outlive the temp
table directory, so snapshots are `localCheckpoint(eager=True)`-ed
(distributed materialization into Spark block storage — NOT a driver
collect) before the directory is removed.

Money discipline: o_totalprice is a parquet DOUBLE; graded outputs are
integer CENTS via the boundary-free shared `floor(x*100 + 0.5)` form
on both engines (ORACLE_NOTES.md) — doubling before the merge is an
exact IEEE op, so no rounding-mode boundary exists anywhere.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from novlake_spark.registry import register
from novlake_spark.sources.tables import load_table


def _orders_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _cents(col: str) -> F.Column:
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("long")


@register(
    "q_txlog_merge",
    # side-effecting (full txlog lifecycle per call): the contract
    # schema sweep reads this declaration instead of re-running it
    declared_schema="o_orderkey bigint, o_custkey bigint, price_cents bigint",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(floor(o_totalprice * 2 * 100 + 0.5) AS BIGINT) AS price_cents
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
    FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 <> 0
    """,
)
def q_txlog_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LH1 (round 7): MERGE upsert through the transaction log, graded
    FULL. Base snapshot = even order keys; the merge source = keys
    divisible by 3 with doubled prices — so keys ≡ 0 (mod 6) exercise
    the WHEN MATCHED replace path, odd multiples of 3 the WHEN NOT
    MATCHED insert path, and the remaining even keys must pass through
    untouched. The oracle restates exactly that three-way partition in
    plain SQL; any fault in the merge join, the stats-scoped rewrite,
    or the atomic remove+add commit changes the hash. Scale shape: the
    merge's per-file min/max stats scope the rewrite to overlapping
    files (a 1 GB delta against 100 TB rewrites only the files its key
    range touches); the graded read is a snapshot scan."""
    base = _orders_base(spark, sf_dir).filter(F.col("o_orderkey") % 2 == 0)
    delta = (
        _orders_base(spark, sf_dir)
        .filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    from novlake_spark.txlog import TxTable

    root = tempfile.mkdtemp(prefix="novlake-qmerge-")
    try:
        t = TxTable(spark, f"{root}/t")
        t.commit(base.repartition(4))
        t.merge(delta, key=["o_orderkey"])
        snap = t.read().select(
            "o_orderkey", "o_custkey", _cents("o_totalprice").alias("price_cents")
        )
        # cut lineage from the throwaway directory before removing it
        return snap.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "q_txlog_maintenance",
    # side-effecting (full txlog lifecycle per call): the contract
    # schema sweep reads this declaration instead of re-running it
    declared_schema="o_orderkey bigint, o_custkey bigint, price_cents bigint",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
    FROM orders WHERE o_orderkey % 2 = 0
    """,
)
def q_txlog_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LH4 (round 7): the maintenance pipeline graded FULL — chunked
    appends (4 key-range commits) → log CHECKPOINT → Z-ORDER rewrite
    (optimize: width-bucket ranks bit-interleaved, range-partitioned —
    an atomic remove+add) → shallow CLONE (O(metadata): the clone's
    adds reference the source's files) → read THE CLONE. Every step is
    content-preserving by contract, so the oracle is simply the base
    row set: any row lost or duplicated by checkpoint replay, the
    z-order rewrite, or clone reference resolution breaks the hash.
    This grades three physical paths LH1–LH3 don't touch: checkpoint-
    based log replay, the compaction rewrite, and cross-table absolute
    file references. Scale: checkpoint makes log replay O(1) in commit
    count; optimize's one min/max aggregate feeds map-side z-values
    (no per-column sort); the clone is one log entry at any size."""
    base = _orders_base(spark, sf_dir).filter(F.col("o_orderkey") % 2 == 0)
    from novlake_spark.txlog import TxTable

    root = tempfile.mkdtemp(prefix="novlake-qmaint-")
    try:
        t = TxTable(spark, f"{root}/t")
        kmax = base.agg(F.max("o_orderkey")).collect()[0][0] or 0
        step = kmax // 4 + 1
        for i in range(4):
            t.commit(
                base.filter(
                    (F.col("o_orderkey") >= i * step)
                    & (F.col("o_orderkey") < (i + 1) * step)
                ).repartition(2)
            )
        t.checkpoint()
        t.optimize(zorder_by=["o_orderkey", "o_custkey"], target_files=4)
        clone = t.clone(f"{root}/clone")
        snap = clone.read().select(
            "o_orderkey", "o_custkey", _cents("o_totalprice").alias("price_cents")
        )
        return snap.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "q_txlog_dv_read",
    # side-effecting (full txlog lifecycle per call): the contract
    # schema sweep reads this declaration instead of re-running it
    declared_schema="o_orderkey bigint, o_custkey bigint, price_cents bigint",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
    FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey > 1000
    """,
)
def q_txlog_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LH3 (round 7): the merge-on-read path graded FULL — a deletion-
    vector DELETE (``dv=True``: NO file is rewritten; matching row
    POSITIONS are logged and every reader anti-joins them out via
    ``_metadata.row_index``), then a snapshot read that must return
    exactly the surviving rows. This is a physically DIFFERENT read
    path from LH1/LH2's copy-on-write snapshots — a positional
    anti-join against the DV sidecar — and any off-by-one in position
    capture or row-index matching changes the hash. The change-feed
    path stays pytest-graded: the repo's CDF is file-granular (a
    merge reports rewritten FILES as delete+insert), so its row set
    depends on physical partitioning and has no engine-independent SQL
    restatement — tests/test_deletion_vectors.py and
    tests/test_cdf_mview.py pin it instead. Scale: deleting k rows
    from 100 TB costs one stats-scoped position scan plus a log
    publish; zero data rewrite."""
    base = _orders_base(spark, sf_dir).filter(F.col("o_orderkey") % 2 == 0)
    from novlake_spark.txlog import TxTable

    root = tempfile.mkdtemp(prefix="novlake-qdv-")
    try:
        t = TxTable(spark, f"{root}/t")
        t.commit(base.repartition(4))
        t.delete([("o_orderkey", "<=", 1000)], dv=True)
        snap = t.read().select(
            "o_orderkey", "o_custkey", _cents("o_totalprice").alias("price_cents")
        )
        return snap.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "q_txlog_stream_pipe",
    # side-effecting (full txlog lifecycle per call): the contract
    # schema sweep reads this declaration instead of re-running it
    declared_schema="o_orderkey bigint, o_custkey bigint, price_cents bigint",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
    FROM orders WHERE o_orderkey % 2 = 0
    """,
)
def q_txlog_stream_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LH5 (round 7): the streaming CDC pipe graded FULL — the base
    snapshot tailed through the custom Structured Streaming SOURCE
    (``format("txlog")``: version-ordered microbatches from the log)
    into the exactly-once SINK (txn-keyed commits keyed by epoch), one
    availableNow pass, then the SINK table is read and graded against
    the plain base row set: a dropped microbatch, a replayed epoch, or
    an offset-tracking fault shows up as missing/duplicated rows and
    breaks the hash. This puts the J8 streaming path under the
    cross-engine gate (it was pytest-only); the batch keys can't reach
    it because the source/sink pair IS the surface. Scale: the source
    reads O(new commits) per trigger, the sink publishes one txn-keyed
    commit per epoch — the backfill cost here is the documented
    fixed availableNow lifecycle, not data volume."""
    base = _orders_base(spark, sf_dir).filter(F.col("o_orderkey") % 2 == 0)
    from novlake_spark.sources.txlog_source import register_txlog_source
    from novlake_spark.txlog import TxTable

    register_txlog_source(spark)
    root = tempfile.mkdtemp(prefix="novlake-qpipe-")
    try:
        t = TxTable(spark, f"{root}/t")
        t.commit(base.repartition(4))
        q = (
            spark.readStream.format("txlog")
            .option("path", f"{root}/t")
            .load()
            .writeStream.format("txlog")
            .option("path", f"{root}/sink")
            .option("txnAppId", "q-txlog-pipe")
            .option("checkpointLocation", f"{root}/cp")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "txlog availableNow pipe still running after 300 s — "
                "grading a partial sink would pass rows that never "
                "finished committing (ADVICE r7)"
            )
        snap = (
            TxTable(spark, f"{root}/sink")
            .read()
            .select(
                "o_orderkey", "o_custkey", _cents("o_totalprice").alias("price_cents")
            )
        )
        return snap.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "q_txlog_timetravel",
    # side-effecting (full txlog lifecycle per call): the contract
    # schema sweep reads this declaration instead of re-running it
    declared_schema="o_orderkey bigint, o_custkey bigint, price_cents bigint, version int",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
           0 AS version
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
           1 AS version
    FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 5 <> 0
    """,
)
def q_txlog_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LH2 (round 7): time travel (VERSION AS OF) graded FULL — commit
    even keys (version 0), DELETE the multiples of 5 (version 1), then
    read BOTH versions and stack them tagged by version: the old
    snapshot must still contain every deleted row (immutability of
    published versions) while the new one must not. Any fault in
    snapshot resolution, the delete's remove-set, or log replay breaks
    the hash. The delete is stats-scoped exactly like the merge
    rewrite; reading an old version is pure log replay plus the
    retained files — no data is ever copied to keep history."""
    base = _orders_base(spark, sf_dir).filter(F.col("o_orderkey") % 2 == 0)
    from novlake_spark.txlog import TxTable

    root = tempfile.mkdtemp(prefix="novlake-qtt-")
    try:
        t = TxTable(spark, f"{root}/t")
        t.commit(base.repartition(4))
        v0 = t.latest_version()
        # a modulo predicate isn't in delete()'s (col, op, val) grammar;
        # the delete-matched merge clause IS the general-predicate path
        t.merge(
            base.filter(F.col("o_orderkey") % 5 == 0),
            key=["o_orderkey"],
            delete_matched=True,
            insert_unmatched=False,
        )
        v1 = t.latest_version()
        cols = ["o_orderkey", "o_custkey"]
        old = t.read(version=v0).select(
            *cols, _cents("o_totalprice").alias("price_cents"),
            F.lit(0).cast("int").alias("version"),
        )
        new = t.read(version=v1).select(
            *cols, _cents("o_totalprice").alias("price_cents"),
            F.lit(1).cast("int").alias("version"),
        )
        return old.unionByName(new).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "q_txlog_cdf",
    # side-effecting (full txlog lifecycle per call): the contract
    # schema sweep reads this declaration instead of re-running it
    declared_schema="o_orderkey bigint, o_custkey bigint, price_cents bigint",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(floor(o_totalprice
                      * (CASE WHEN o_orderkey > 1000 AND o_orderkey <= 3000
                              THEN 2 ELSE 1 END)
                      * 100 + 0.5) AS BIGINT) AS price_cents
    FROM orders
    WHERE o_orderkey % 2 = 0
      AND o_orderkey > 1000
      AND NOT (o_orderkey > 3000 AND o_orderkey <= 3100)
    """,
)
def q_txlog_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LH6 (round 8): the change-data-feed read path graded FULL — not
    by hashing the feed itself (the repo's CDF is file-granular: a
    copy-on-write rewrite reports whole files as delete+insert, so the
    raw feed's row set depends on physical partitioning and has no
    engine-independent SQL restatement) but by RECONSTRUCTING the
    current snapshot from it: every row's net multiplicity across the
    full feed (insert = +1, delete = -1) must equal its presence in
    the final state. The chain exercises all three delete-side feed
    producers — a copy-on-write DELETE (file rewrite), a copy-on-write
    UPDATE (delete old row + insert updated row), and a
    deletion-vector DELETE (the ``set_dv`` positional feed path) — and
    any dropped/duplicated feed row, wrong change tag, or DV position
    off-by-one surfaces as a net ≠ {0, 1} and breaks the hash. Scale:
    the feed is O(changed files) per version (log-derived, never a
    snapshot diff), and the reconstruction is one hash aggregation on
    (key, payload) — the standard CDC-consumer idempotence check."""
    base = _orders_base(spark, sf_dir).filter(F.col("o_orderkey") % 2 == 0)
    from novlake_spark.txlog import TxTable

    root = tempfile.mkdtemp(prefix="novlake-qcdf-")
    try:
        t = TxTable(spark, f"{root}/t")
        t.commit(base.repartition(4))                      # v0: inserts
        t.delete([("o_orderkey", "<=", 1000)])             # v1: CoW delete
        t.update(                                          # v2: CoW update
            {"o_totalprice": "o_totalprice * 2"},
            where=[("o_orderkey", ">", 1000), ("o_orderkey", "<=", 3000)],
        )
        t.delete(                                          # v3: DV delete
            [("o_orderkey", ">", 3000), ("o_orderkey", "<=", 3100)], dv=True
        )
        feed = t.changes(-1)  # the full feed, v0..v3
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        net = (
            feed.select(
                "o_orderkey",
                "o_custkey",
                _cents("o_totalprice").alias("price_cents"),
                sign.alias("_s"),
            )
            .groupBy("o_orderkey", "o_custkey", "price_cents")
            .agg(F.sum("_s").alias("_net"))
            .filter(F.col("_net") > 0)
            .select("o_orderkey", "o_custkey", "price_cents")
        )
        return net.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "q_mview_incremental",
    # side-effecting (full txlog + view lifecycle per call): the
    # contract schema sweep reads this declaration instead
    declared_schema=(
        "o_custkey bigint, spend_cents bigint, n_orders bigint, avg_cents double"
    ),
    oracle="""
    SELECT o_custkey,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS spend_cents,
           count(*) AS n_orders,
           CAST(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / count(*) AS avg_cents
    FROM orders WHERE o_orderkey > 500
    GROUP BY o_custkey
    """,
)
def q_mview_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LH7 (round 8): incremental materialized-view maintenance graded
    FULL — the last pytest-only txlog surface (mview.py). Chain: commit
    the even order keys → full view build (refresh #1) → commit the odd
    keys AND copy-on-write delete everything ≤ 500 → refresh #2, which
    must fold ONLY the signed change-feed delta (inserts +, deletes −)
    into the stored per-group state — never rescanning the base — and
    drop groups whose live row count reaches zero. The oracle is the
    view's defining aggregate over the final base state in plain SQL,
    so a wrong sign, a double-counted delta (the exactly-once
    src@version txn mark), a missed group death, or a stats-scoped
    rewrite that dropped an untouched group all break the hash. Money
    discipline: the summed measure is integer cents (sums of BIGINT
    are associative — a DOUBLE sum would drift by fold order between
    the incremental path and the oracle's single pass); AVG is the one
    derived measure, a single IEEE division of identical integers on
    both engines. Scale: refresh cost is O(delta + overlapping view
    files) — the dashboard-over-100-TB shape where recompute is a full
    scan but maintenance is the size of the day's commits."""
    cents_base = _orders_base(spark, sf_dir).select(
        "o_orderkey", "o_custkey", _cents("o_totalprice").alias("price_cents")
    )
    from novlake_spark.mview import IncrementalAggView
    from novlake_spark.txlog import TxTable

    root = tempfile.mkdtemp(prefix="novlake-qmview-")
    try:
        t = TxTable(spark, f"{root}/t")
        t.commit(cents_base.filter(F.col("o_orderkey") % 2 == 0).repartition(4))
        view = IncrementalAggView(
            t,
            f"{root}/mv",
            keys=["o_custkey"],
            measures={
                "spend_cents": ("sum", "price_cents"),
                "n_orders": ("count",),
                "avg_cents": ("avg", "price_cents"),
            },
        )
        view.refresh()  # full build from v0
        t.commit(cents_base.filter(F.col("o_orderkey") % 2 == 1).repartition(4))
        t.delete([("o_orderkey", "<=", 500)])
        view.refresh()  # incremental: folds only the two commits' delta
        return view.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "q_mview_minmax",
    # side-effecting (full txlog + view lifecycle per call): the
    # contract schema sweep reads this declaration instead
    declared_schema=(
        "o_custkey bigint, min_cents bigint, max_cents bigint, n_orders bigint"
    ),
    oracle="""
    SELECT o_custkey,
           CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS min_cents,
           CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS max_cents,
           count(*) AS n_orders
    FROM orders WHERE o_orderkey > 500
    GROUP BY o_custkey
    """,
)
def q_mview_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LH7b (round 9, VERDICT r8 task #4): MIN/MAX materialized-view
    maintenance with honest delete semantics. MIN/MAX are NOT
    self-maintainable under deletes (once the extremum row dies, no
    folded state names the runner-up), so the refresh decomposes: pure
    monotone fold for groups whose deletes provably can't have held the
    extremum, a source rescan SCOPED to exactly the extremum-death
    groups otherwise (mview.py module docstring). The chain makes both
    paths and the churn trap all fire in one refresh: even keys → full
    build → odd keys committed AND ``o_orderkey <= 500`` deleted in the
    SAME window. Every group with a surviving delete above its folded
    candidate folds; every group whose min/max row died rescans; and
    the odd keys <= 500 are inserted-then-deleted IN-WINDOW — a fold
    that trusted the insert-side extremum would resurrect them (the
    tie-test catches this without row identity). Oracle = the defining
    MIN/MAX/COUNT over the final base state, so a stale extremum, a
    resurrected churn row, or an over/under-scoped rescan all break the
    hash. Money discipline: integer cents end-to-end — MIN/MAX of
    BIGINT are order-free on both engines."""
    cents_base = _orders_base(spark, sf_dir).select(
        "o_orderkey", "o_custkey", _cents("o_totalprice").alias("price_cents")
    )
    from novlake_spark.mview import IncrementalAggView
    from novlake_spark.txlog import TxTable

    root = tempfile.mkdtemp(prefix="novlake-qmviewmm-")
    try:
        t = TxTable(spark, f"{root}/t")
        t.commit(cents_base.filter(F.col("o_orderkey") % 2 == 0).repartition(4))
        view = IncrementalAggView(
            t,
            f"{root}/mv",
            keys=["o_custkey"],
            measures={
                "min_cents": ("min", "price_cents"),
                "max_cents": ("max", "price_cents"),
                "n_orders": ("count",),
            },
        )
        view.refresh()  # full build from v0
        t.commit(cents_base.filter(F.col("o_orderkey") % 2 == 1).repartition(4))
        t.delete([("o_orderkey", "<=", 500)])
        view.refresh()  # fold + scoped rescan + churn rejection
        return view.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "q_llm_contamination_snapshot",
    # side-effecting (txlog lifecycle per call): the contract schema
    # sweep reads this declaration instead of re-running it
    declared_schema="doc_id bigint, contaminated int",
    oracle="""
    WITH v0 AS (SELECT doc_id, text, source FROM documents WHERE doc_id % 2 = 0),
         bench AS (SELECT DISTINCT md5(lower(trim(text))) AS h
                   FROM v0 WHERE source = 'src0')
    SELECT v0.doc_id,
           CAST((bench.h IS NOT NULL) AS INT) AS contaminated
    FROM v0 LEFT JOIN bench ON md5(lower(trim(v0.text))) = bench.h
    WHERE v0.source <> 'src0'
    """,
)
def q_llm_contamination_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L63 (round 8): version-pinned train/eval decontamination — the
    cross-snapshot validity property VERDICT r7 task #8 names. A
    decontamination run is only reproducible if it is pinned to the
    snapshot it was computed against: this key commits the even-doc_id
    half of the corpus as v0, then commits the odd half as v1, and runs
    the exact-hash contamination check (train = non-src0 docs, bench =
    the distinct normalized-text digests of the src0 eval slice)
    strictly against ``VERSION AS OF 0`` — while v1 exists in the same
    log. The oracle restates the v0 slice arithmetically (doc_id % 2 =
    0), so ANY v1 leakage breaks the grade twice over: an odd train doc
    adds a result row (row-count/hash break), and an odd bench doc
    grows the digest set and can flip contamination flags. Composes
    LH2's time travel with the contamination operator; exact-hash match
    (not shingle overlap) keeps the graded surface about SNAPSHOT
    semantics, not tokenization. Scale: the bench digest set shuffles
    as 16-byte digests (never text), and the train side joins on the
    digest — the same bounded-join shape as q_llm_dedup_exact."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    from novlake_spark.txlog import TxTable

    root = tempfile.mkdtemp(prefix="novlake-qcontam-")
    try:
        t = TxTable(spark, f"{root}/t")
        t.commit(docs.filter(F.col("doc_id") % 2 == 0).repartition(4))  # v0
        t.commit(docs.filter(F.col("doc_id") % 2 == 1).repartition(4))  # v1
        v0 = t.read(version=0).withColumn(
            "_h", F.md5(F.lower(F.trim(F.col("text"))))
        )
        bench = (
            v0.filter(F.col("source") == "src0")
            .select("_h")
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        out = (
            v0.filter(F.col("source") != "src0")
            .join(bench, "_h", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("_hit"), F.lit(0)).cast("int").alias("contaminated"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "q_llm_contamination_ngram",
    # side-effecting (txlog lifecycle per call): the contract schema
    # sweep reads this declaration instead of re-running it
    declared_schema=(
        "doc_id bigint, n_ngrams bigint, n_hits bigint, contaminated int"
    ),
    oracle="""
    WITH v0 AS (SELECT doc_id, source, string_split(lower(text), ' ') AS toks
                FROM documents WHERE doc_id % 2 = 0),
         sh AS (SELECT doc_id, source,
                       unnest(list_distinct(list_transform(range(1, len(toks) - 11),
                              i -> md5(array_to_string(toks[i:i+12], ' '))))) AS h
                FROM v0),
         bench AS (SELECT DISTINCT h FROM sh WHERE source = 'src0'),
         ev AS (SELECT s.doc_id, (bench.h IS NOT NULL)::INT AS hit
                FROM sh s LEFT JOIN bench ON s.h = bench.h
                WHERE s.source <> 'src0')
    SELECT doc_id,
           count(*) AS n_ngrams,
           CAST(sum(hit) AS BIGINT) AS n_hits,
           CAST((sum(hit) > 0) AS INT) AS contaminated
    FROM ev GROUP BY doc_id
    """,
)
def q_llm_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L68 (round 9, VERDICT r8 task #6): FUZZY version-pinned
    decontamination — the 13-gram-overlap eval-hygiene protocol
    (GPT-3 appendix C / PaLM: a train document is contaminated if it
    shares ANY 13-gram with the benchmark set), which the exact-hash
    L63 cannot catch when the leaked passage is embedded in a longer
    document. Composes the span-dedup shingle machinery with L63's
    snapshot discipline: even docs commit as v0, odd as v1, and the
    scan runs strictly against ``VERSION AS OF 0`` — any v1 leak
    changes row counts AND can flip flags. Per-doc DISTINCT 13-gram
    sets are built map-side in the Arrow shingle UDF (unique=True —
    no full-width distinct exchange), hashed to md5 so the bench join
    shuffles 16-byte digests, never 13-token strings (~100 B each) —
    at 100 TB that is the difference between shuffling the corpus and
    shuffling a fingerprint table. Docs shorter than 13 tokens have no
    13-grams and drop out (the protocol can't flag them). No broadcast
    hint on the bench side: it is corpus-derived here and grows with
    SF (the q_llm_contamination policy — AQE decides from sizes)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    from novlake_spark.operators import text as Tx
    from novlake_spark.txlog import TxTable

    root = tempfile.mkdtemp(prefix="novlake-qcontamng-")
    try:
        t = TxTable(spark, f"{root}/t")
        t.commit(docs.filter(F.col("doc_id") % 2 == 0).repartition(4))  # v0
        t.commit(docs.filter(F.col("doc_id") % 2 == 1).repartition(4))  # v1
        v0 = t.read(version=0)
        sh = v0.select(
            "doc_id",
            "source",
            F.explode(Tx.shingles_arrow(F.col("text"), 13, unique=True)).alias("sh"),
        ).select("doc_id", "source", F.md5("sh").alias("h"))
        bench = (
            sh.filter(F.col("source") == "src0")
            .select("h")
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        ev = (
            sh.filter(F.col("source") != "src0")
            .join(bench, "h", "left")
            .select("doc_id", F.coalesce(F.col("_hit"), F.lit(0)).alias("hit"))
        )
        out = ev.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum("hit").cast("long").alias("n_hits"),
            (F.sum("hit") > 0).cast("int").alias("contaminated"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "q_txlog_schema_lifecycle",
    # side-effecting (full txlog lifecycle per call): the contract
    # schema sweep reads this declaration instead of re-running it
    declared_schema=(
        "o_orderkey bigint, o_custkey bigint, cents bigint, channel string"
    ),
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           CASE WHEN o_orderkey % 2 = 1 THEN 'late' ELSE NULL END AS channel
    FROM orders
    """,
)
def q_txlog_schema_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LH8 (round 8): the SCHEMA lifecycle graded FULL — the remaining
    pytest-only metadata machinery composed into one chain whose final
    state has a plain-SQL restatement. Chain: commit the even order
    keys with integer-cents prices (v0) → enable column mapping
    (physical names decouple from logical) → RENAME price_cents →
    cents (metadata-only: v0's files must now read under the NEW
    logical name through the mapping indirection) → append the odd
    keys carrying an extra ``channel`` column (additive schema
    evolution: v0 rows must null-fill) → copy-on-write DELETE of a key
    range → RESTORE to the pre-delete version (metadata-only rollback:
    every deleted row must come back). The oracle is simply all orders
    with the CASE-tagged channel — so a mapping fault (old files
    unreadable or read under the old name), a lost evolution null-fill,
    or a restore that resurrects the delete instead of undoing it each
    breaks rows or hash. Scale: rename/restore are O(1) log entries at
    any table size; evolution rewrites nothing (readers union schemas
    via the mapping); only the delete's overlapping files rewrite."""
    base = _orders_base(spark, sf_dir).select(
        "o_orderkey", "o_custkey", _cents("o_totalprice").alias("price_cents")
    )
    from novlake_spark.txlog import TxTable

    root = tempfile.mkdtemp(prefix="novlake-qschema-")
    try:
        t = TxTable(spark, f"{root}/t")
        t.commit(base.filter(F.col("o_orderkey") % 2 == 0).repartition(4))  # v0
        t.enable_column_mapping()
        t.rename_column("price_cents", "cents")
        late = (
            base.filter(F.col("o_orderkey") % 2 == 1)
            .select(
                "o_orderkey",
                "o_custkey",
                F.col("price_cents").alias("cents"),
                F.lit("late").alias("channel"),
            )
            .repartition(4)
        )
        t.commit(late)  # additive evolution: older rows null-fill channel
        pre_delete = t.latest_version()
        t.delete([("o_orderkey", "<=", 400)])
        t.restore(pre_delete)  # metadata-only rollback of the delete
        snap = t.read().select("o_orderkey", "o_custkey", "cents", "channel")
        return snap.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

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
        q.awaitTermination(300)
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

"""Change-data-capture replication between transaction-logged tables:
tail the source's row-level change feed and apply it onto a target
keyed by a primary key — the cross-region / dev-mirror / downstream-mart
primitive (Delta calls the write half APPLY CHANGES INTO).

Pipeline shape: ``readStream.format("txlog")`` with
``readChangeFeed=true`` delivers every commit's inserts and deletes
tagged ``(_change_type, _commit_version)``; ``foreachBatch`` applies
them in commit order — deletes before inserts within a version, which
is exactly the file-rewrite semantics the feed encodes (a MERGE
surfaces as delete-of-old-rows + insert-of-new-rows in one version, so
applying in that order converges the target even though the feed is
file-granular and re-delivers a rewritten file's surviving rows).

Exactly-once: every applied phase commits under txn
``<app>@<batchId>:<version>:<d|i>``. A crash mid-batch re-runs the
batch; already-applied phases are log-detected no-ops, the rest apply —
at-least-once delivery plus idempotent commits = exactly-once state.

At 100 TB: each applied phase is a stats-scoped MERGE (only target
files whose key range overlaps the delta are rewritten), and the feed
itself is O(changed files). The replication lag floor is the trigger
interval plus one MERGE; the bandwidth floor is the source's actual
churn, never table size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from novlake_spark.txlog import TxTable

_META = ("_change_type", "_commit_version")


def apply_changes(
    spark: SparkSession,
    target_path: str,
    batch_df,
    batch_id: int,
    key: list[str],
    txn_app: str,
) -> None:
    """Apply one micro-batch of change-feed rows onto ``target_path``.
    Public so a user's own ``foreachBatch`` can compose it with other
    work; :func:`replicate` is the turnkey wrapper."""
    # bounded collect: one row per source commit in this batch
    versions = sorted(
        r[0] for r in batch_df.select("_commit_version").distinct().collect()
    )
    t = TxTable(spark, target_path)
    for v in versions:
        part = batch_df.filter(F.col("_commit_version") == v)
        dels = part.filter(F.col("_change_type") == "delete").drop(*_META)
        ins = part.filter(F.col("_change_type") == "insert").drop(*_META)
        # .take(1) guards: MERGE with an empty source would still scope
        # ALL files (no key bounds) and rewrite the table as a no-op
        if t.latest_version() is not None and dels.take(1):
            t.merge(
                dels, key, delete_matched=True, txn=f"{txn_app}@{batch_id}:{v}:d"
            )
        if ins.take(1):
            t.merge(ins, key, txn=f"{txn_app}@{batch_id}:{v}:i")


def replicate(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    key: list[str],
    checkpoint: str,
    txn_app: str | None = None,
    available_now: bool = True,
):
    """Start (or resume, via ``checkpoint``) replicating ``source_path``
    onto ``target_path``. Returns the StreamingQuery; with
    ``available_now`` it drains the current backlog and stops — call it
    on a schedule for batch-incremental replication, or pass ``False``
    for a continuously-running mirror."""
    from novlake_spark.sources.txlog_source import register_txlog_source

    register_txlog_source(spark)
    app = txn_app or f"repl:{target_path.rstrip('/')}"

    def _apply(batch_df, batch_id: int) -> None:
        apply_changes(spark, target_path, batch_df, batch_id, key, app)

    writer = (
        spark.readStream.format("txlog")
        .option("path", source_path)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""End-to-end incremental training-data curation on the lakehouse:
raw documents land in a transaction-logged table, a streaming pipe
(txlog source → foreachBatch) quality-filters each micro-batch and
folds it into a curated table with an INSERT-ONLY MERGE on the content
digest — cross-batch exact dedup without ever rescanning the curated
corpus. This is the 100 TB shape: each increment costs O(new docs) for
filtering plus a stats-scoped merge, while replays are txn-keyed no-ops.
"""

import pyspark.sql.functions as F

from novlake_spark.sources.txlog_source import register_txlog_source
from novlake_spark.txlog import TxTable


def _curate_batch(spark, curated_path, batch_df, batch_id):
    """Quality-gate the increment, then dedup-insert by content digest:
    matched_condition='false' makes every key match a no-op (first
    writer wins), insert_unmatched adds only genuinely new content."""
    good = batch_df.filter(
        (F.length("text") >= 40) & (F.size(F.split(F.col("text"), r"\s+")) >= 8)
    ).withColumn("digest", F.md5(F.lower(F.trim(F.col("text")))))
    # one digest may repeat WITHIN the increment too: keep lowest doc_id
    first = good.groupBy("digest").agg(F.min("doc_id").alias("doc_id"))
    good = good.join(first, ["digest", "doc_id"])
    t = TxTable(spark, curated_path)
    if t.latest_version() is None:
        t.commit(good, txn=f"curate@{batch_id}")
    else:
        t.merge(
            good,
            key=["digest"],
            matched_condition="false",  # WHEN MATCHED: do nothing
            txn=f"curate@{batch_id}",
        )


def _pump(spark, raw_path, curated_path, cp):
    q = (
        spark.readStream.format("txlog")
        .option("path", raw_path)
        .load()
        .writeStream.foreachBatch(
            lambda df, bid: _curate_batch(spark, curated_path, df, bid)
        )
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_incremental_curation_pipeline(spark, tmp_path):
    register_txlog_source(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    raw = TxTable(spark, str(tmp_path / "raw"))
    half = docs.filter(F.col("doc_id") % 2 == 0)
    raw.commit(half)
    cp = str(tmp_path / "cp")
    curated_path = str(tmp_path / "curated")
    _pump(spark, raw.path, curated_path, cp)
    curated = TxTable(spark, curated_path)
    n1 = curated.read().count()
    assert n1 > 0
    # digests are unique in the curated table (cross-batch invariant)
    assert curated.read().select("digest").distinct().count() == n1

    # second increment: the other half PLUS exact duplicates of already-
    # curated docs (re-keyed) — duplicates must not land
    dupes = (
        half.limit(20).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    raw.commit(docs.filter(F.col("doc_id") % 2 == 1).unionByName(dupes))
    _pump(spark, raw.path, curated_path, cp)
    n2 = curated.read().count()
    assert n2 > n1  # new unique content arrived
    assert curated.read().select("digest").distinct().count() == n2
    # none of the re-keyed duplicates survived (their digest was taken)
    assert curated.read().filter(F.col("doc_id") >= 1_000_000).count() == 0

    # replay the whole stream from scratch on the SAME curated table:
    # txn keys make every batch a no-op, not a duplicate fold
    import shutil

    shutil.rmtree(cp)
    before = curated.read().count()
    _pump(spark, raw.path, curated_path, cp)
    assert curated.read().count() == before

"""The txlog Python Data Source (novlake_spark.sources.txlog_source):
format("txlog") batch reads with pushed-filter file skipping, and
readStream over the commit log — exactly-once tailing, checkpoint
restart, change-feed mode."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull

from novlake_spark.sources.txlog_source import (
    _PyLog,
    _to_predicates,
    _TxLogBatchReader,
    register_txlog_source,
)
from novlake_spark.txlog import TxTable


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 100))
    t.commit(_kv(spark, 100, 200))
    register_txlog_source(spark)
    return t


def test_pylog_matches_jvm_log(table):
    py = _PyLog(table.path)
    assert py.versions() == table.versions()
    assert sorted(py.snapshot_files()) == sorted(table.snapshot_files())
    assert py.schema_at() == table.schema_at()
    # time travel agrees too
    assert sorted(py.snapshot_files(0)) == sorted(table.snapshot_files(0))


def test_batch_read_equals_native(table):
    ds = table.spark.read.format("txlog").option("path", table.path).load()
    native = table.read()
    assert ds.schema == native.schema
    assert sorted(r.k for r in ds.collect()) == sorted(r.k for r in native.collect())


def test_batch_time_travel(table):
    ds = (
        table.spark.read.format("txlog")
        .option("path", table.path)
        .option("version", "0")
        .load()
    )
    assert ds.count() == 100


def test_pushed_filters_prune_files(table):
    """Each commit wrote disjoint k-ranges; an equality predicate must
    plan only the matching file(s) — asserted on the reader directly,
    where the partition list is observable."""
    reader = _TxLogBatchReader(table.schema_at(), {"path": table.path})
    n_all = len(reader.partitions())
    unhandled = reader.pushFilters([EqualTo(("k",), 150)])
    assert list(unhandled)  # every filter reported back for row-level re-apply
    n_pruned = len(reader.partitions())
    assert n_pruned < n_all
    # end-to-end: the filtered scan is still row-exact
    df = (
        table.spark.read.format("txlog")
        .option("path", table.path)
        .load()
        .filter(F.col("k") == 150)
    )
    assert [r.v for r in df.collect()] == [1500]


def test_filter_translation_keeps_only_prunable_shapes():
    preds = _to_predicates(
        [EqualTo(("k",), 1), GreaterThan(("v",), 5), IsNotNull(("k",)),
         EqualTo(("a", "b"), 1)]  # nested path: not prunable
    )
    assert preds == [("k", "=", 1), ("v", ">", 5)]


def test_schema_evolution_pads_old_files(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "evo"))
    t.commit(_kv(spark, 0, 10))
    t.commit(_kv(spark, 10, 20).withColumn("tag", F.lit("new")))
    register_txlog_source(spark)
    df = spark.read.format("txlog").option("path", t.path).load()
    rows = {r.k: r.tag for r in df.collect()}
    assert rows[5] is None and rows[15] == "new"


def _drain(spark, path, out_dir, checkpoint, **opts):
    """Run the stream to exhaustion into a parquet file sink (the one
    built-in sink that recovers from a checkpoint, which the restart
    tests need) and return the accumulated output."""
    reader = spark.readStream.format("txlog").option("path", path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    sdf = reader.load()
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.schema(sdf.schema).parquet(out_dir)


def test_stream_full_history_then_incremental(spark, tmp_path):
    """First run delivers the whole table; after a restart from the same
    checkpoint only NEW commits are delivered — exactly-once across the
    restart because offsets are committed versions."""
    t = TxTable(spark, str(tmp_path / "s"))
    t.commit(_kv(spark, 0, 50))
    t.commit(_kv(spark, 50, 80))
    register_txlog_source(spark)
    cp = str(tmp_path / "cp")
    out = _drain(spark, t.path, str(tmp_path / "out"), cp)
    assert out.count() == 80
    t.commit(_kv(spark, 80, 90))
    out = _drain(spark, t.path, str(tmp_path / "out"), cp)
    # file sink accumulates across the two runs on the same checkpoint
    assert out.count() == 90
    assert sorted(r.k for r in out.collect()) == list(range(90))


def test_stream_starting_version_latest(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "tail"))
    t.commit(_kv(spark, 0, 50))
    register_txlog_source(spark)
    cp = str(tmp_path / "cp")
    out = _drain(spark, t.path, str(tmp_path / "out"), cp, startingVersion="latest")
    assert out.count() == 0  # nothing after stream start yet
    t.commit(_kv(spark, 50, 60))
    out = _drain(spark, t.path, str(tmp_path / "out"), cp)
    assert sorted(r.k for r in out.collect()) == list(range(50, 60))


def test_stream_rejects_non_append_commits(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "rm"))
    t.commit(_kv(spark, 0, 50))
    t.delete(where=[("k", "<", 10)])
    register_txlog_source(spark)
    q = (
        spark.readStream.format("txlog")
        .option("path", t.path)
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="not append-only"):
        q.awaitTermination(120)


def test_stream_change_feed_delivers_deletes(spark, tmp_path):
    """readChangeFeed=true turns a DELETE commit into tagged delete rows
    (file-granular: the rewritten file's surviving rows re-insert),
    matching TxTable.changes() row-for-row."""
    t = TxTable(spark, str(tmp_path / "cdf"))
    t.commit(_kv(spark, 0, 50))
    t.delete(where=[("k", "<", 10)])
    register_txlog_source(spark)
    out = _drain(
        spark, t.path, str(tmp_path / "out"), str(tmp_path / "cp"), readChangeFeed="true"
    )
    got = [(r.k, r._change_type, r._commit_version) for r in out.collect()]
    batch = [
        (r.k, r._change_type, r._commit_version)
        for r in t.changes(-1).collect()
    ]
    assert sorted(got) == sorted(batch)
    assert {c for _, c, _ in got} == {"insert", "delete"}


def test_lake_stream_table_facade(spark, tmp_path):
    from novlake_spark.lake import Lake

    t = TxTable(spark, str(tmp_path / "fac"))
    t.commit(_kv(spark, 0, 25))
    sdf = Lake(spark).stream_table(t.path)
    assert sdf.isStreaming and set(sdf.columns) == {"k", "v"}
    q = (
        sdf.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.schema(sdf.schema).parquet(str(tmp_path / "out")).count() == 25

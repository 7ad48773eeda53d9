"""Deletion vectors (merge-on-read DELETE): a set_dv log action records
row positions instead of rewriting files; every reader — snapshot,
time travel, DML rewrites, change feed, the Python data source, CDC
replication — applies them. Tests cover the union fold, the rewrite
fallback, both conflict directions, and end-to-end replication."""

import os

import pyspark.sql.functions as F
import pytest

from novlake_spark.txlog import CommitConflict, TxTable


def _kv(spark, lo, hi, mul=10):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * mul).alias("v")
    )


def _files_on_disk(path):
    d = os.path.join(path, "data")
    if not os.path.isdir(d):
        return []
    return sorted(
        f for f in os.listdir(d) if f.endswith(".parquet") and not f.startswith(".")
    )


def test_dv_delete_is_metadata_only(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 100))
    before = _files_on_disk(t.path)
    v = t.delete([("k", "<", 5)], dv=True)
    assert _files_on_disk(t.path) == before  # no file written OR removed
    assert sorted(r.k for r in t.read().collect()) == list(range(5, 100))
    assert t.read(version=v - 1).count() == 100  # time travel pre-DV
    adds = t.snapshot_adds()
    assert sum(len(a.get("dv", [])) for a in adds) == 5


def test_dv_union_across_deletes(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 50))
    t.delete([("k", "<", 5)], dv=True)
    t.delete([("k", ">=", 45)], dv=True)
    t.delete([("k", "<", 3)], dv=True)  # overlap: union, not double
    assert sorted(r.k for r in t.read().collect()) == list(range(5, 45))


def test_dv_applied_under_predicate_read(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 100))
    t.delete([("k", "=", 10)], dv=True)
    got = t.read(where=[("k", ">=", 5), ("k", "<=", 15)])
    assert sorted(r.k for r in got.collect()) == [5, 6, 7, 8, 9, 11, 12, 13, 14, 15]


def test_rewrite_after_dv_does_not_resurrect(spark, tmp_path):
    """UPDATE reads through the DV; the rewritten file must not bring
    DV-deleted rows back, and the DV itself is materialized away."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 20))
    t.delete([("k", "<", 5)], dv=True)
    t.update({"v": "v + 1"}, where=[("k", ">=", 0)])  # touches the dv'd file
    rows = {r.k: r.v for r in t.read().collect()}
    assert set(rows) == set(range(5, 20))
    assert rows[7] == 71
    assert not any(a.get("dv") for a in t.snapshot_adds())  # dv gone with the file


def test_dv_fallback_to_rewrite_above_cap(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 100))
    t.dv_max_rows = 3
    before = set(t.snapshot_files())
    t.delete([("k", "<", 50)], dv=True)  # 50 matches > cap: rewrite path
    # rewrite semantics, not DV: the touched files left the snapshot
    # (fully-deleted files produce no replacement at all — zero-row
    # outputs are never committed), and no deletion vector exists
    assert set(t.snapshot_files()) != before
    assert not any(a.get("dv") for a in t.snapshot_adds())
    assert t.read().count() == 50


def test_rewrite_conflicts_with_interleaved_dv(spark, tmp_path):
    """A compaction computed before a DV landed must refuse to publish —
    its merged copy was read without the DV."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 50))
    base = t.latest_version()
    t.delete([("k", "=", 7)], dv=True)  # interleaves before the compact publishes
    with pytest.raises(CommitConflict, match="deletion vectors"):
        t.compact(target_version=base)


def test_dv_conflicts_with_interleaved_rewrite(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 50))
    base = t.latest_version()
    touched = t.snapshot_adds(base)
    t.update({"v": "v * 2"}, where=[("k", ">=", 0)])  # rewrites every file
    with pytest.raises(CommitConflict, match="rewritten"):
        t._delete_dv(touched, [("k", "=", 3)], base)


def test_dv_survives_checkpoint_and_clean_log(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 30))
    t.delete([("k", "<", 10)], dv=True)
    t.checkpoint()
    t.clean_log(t.latest_version())
    assert sorted(r.k for r in t.read().collect()) == list(range(10, 30))


def test_dv_change_feed_rows(spark, tmp_path):
    """The set_dv commit surfaces exactly the vectored rows as deletes;
    a later rewrite-delete of the same file reports only the survivors."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 20).coalesce(1))  # ONE file: v2 must touch it all
    t.delete([("k", "<", 4)], dv=True)  # v1: dv delete
    t.delete([("k", "<", 8)])  # v2: rewrite delete (4..7 + dv'd file)
    ch = t.changes(0).collect()
    v1 = sorted(r.k for r in ch if r._commit_version == 1 and r._change_type == "delete")
    assert v1 == [0, 1, 2, 3]
    v2_del = sorted(r.k for r in ch if r._commit_version == 2 and r._change_type == "delete")
    assert v2_del == list(range(4, 20))  # 0..3 NOT re-reported
    v2_ins = sorted(r.k for r in ch if r._commit_version == 2 and r._change_type == "insert")
    assert v2_ins == list(range(8, 20))  # survivors re-inserted


def test_dv_through_python_data_source(spark, tmp_path):
    from novlake_spark.sources.txlog_source import register_txlog_source

    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 40))
    t.delete([("k", "<", 10)], dv=True)
    register_txlog_source(spark)
    df = spark.read.format("txlog").option("path", t.path).load()
    assert sorted(r.k for r in df.collect()) == list(range(10, 40))


def test_dv_replicates_via_cdc(spark, tmp_path):
    """End-to-end: a DV delete on the source flows through the change
    feed and deletes on the target."""
    from novlake_spark.replicate import replicate

    src = TxTable(spark, str(tmp_path / "src"))
    src.commit(_kv(spark, 0, 30))
    cp = str(tmp_path / "cp")
    dst_path = str(tmp_path / "dst")
    q = replicate(spark, src.path, dst_path, key=["k"], checkpoint=cp)
    q.awaitTermination(180)
    src.delete([("k", "<", 10)], dv=True)
    q = replicate(spark, src.path, dst_path, key=["k"], checkpoint=cp)
    q.awaitTermination(180)
    dst = TxTable(spark, dst_path)
    assert sorted(r.k for r in dst.read().collect()) == sorted(
        r.k for r in src.read().collect()
    )


def test_dv_restore_and_clone(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 20))
    t.delete([("k", "<", 10)], dv=True)
    clone = t.clone(str(tmp_path / "cl"))
    assert clone.read().count() == 10  # dv rides the shallow clone
    t.restore(0)
    assert t.read().count() == 20  # pre-DV snapshot restored


# -- merge-on-read UPDATE -------------------------------------------------


def test_dv_update_writes_only_updated_rows(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 100).coalesce(1))
    before = _files_on_disk(t.path)
    t.update({"v": "v + 1"}, where=[("k", "<", 3)], dv=True)
    after = _files_on_disk(t.path)
    assert set(before) <= set(after) and len(after) == len(before) + 1  # old file untouched
    rows = {r.k: r.v for r in t.read().collect()}
    assert len(rows) == 100
    assert rows[1] == 11 and rows[50] == 500
    # the new file holds ONLY the 3 updated copies
    new_add = [a for a in t.snapshot_adds() if not a.get("dv")]
    assert sum(a["rows"] for a in new_add) == 3


def test_dv_update_idempotent_predicate(spark, tmp_path):
    """A second identical DV update matches the UPDATED rows (the old
    positions are vectored out), so it updates again, not duplicates."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 20).coalesce(1))
    t.update({"v": "v + 1"}, where=[("k", "=", 5)], dv=True)
    t.update({"v": "v + 1"}, where=[("k", "=", 5)], dv=True)
    rows = {r.k: r.v for r in t.read().collect()}
    assert len(rows) == 20 and rows[5] == 52


def test_dv_update_conflicts_with_interleaved_dv_delete(spark, tmp_path):
    """Unlike two DV deletes (benign union), a DV UPDATE's appended copy
    derives from the vectored rows — an interleaved DV on the same file
    must conflict or shared rows double."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 50).coalesce(1))
    base = t.latest_version()
    touched = t.snapshot_adds(base)
    t.delete([("k", "=", 9)], dv=True)  # interleaves
    with pytest.raises(CommitConflict):
        t._update_dv(touched, {"v": "v + 1"}, [("k", "<", 3)], base)


def test_dv_update_change_feed_and_replication(spark, tmp_path):
    from novlake_spark.replicate import replicate

    src = TxTable(spark, str(tmp_path / "src"))
    src.commit(_kv(spark, 0, 30))
    cp = str(tmp_path / "cp")
    dst_path = str(tmp_path / "dst")
    replicate(spark, src.path, dst_path, key=["k"], checkpoint=cp).awaitTermination(180)
    src.update({"v": "v * 2"}, where=[("k", "<", 5)], dv=True)
    replicate(spark, src.path, dst_path, key=["k"], checkpoint=cp).awaitTermination(180)
    dst = TxTable(spark, dst_path)
    assert sorted((r.k, r.v) for r in dst.read().collect()) == sorted(
        (r.k, r.v) for r in src.read().collect()
    )


def test_reorg_purges_dvs(spark, tmp_path):
    """reorg() rewrites only DV-carrying files past the ratio,
    materializing the deletes; light-DV files stay by reference."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 100).coalesce(1))   # file A: heavy DV soon
    t.commit(_kv(spark, 100, 200).coalesce(1)) # file B: light DV
    t.delete([("k", "<", 40)], dv=True)        # 40% of file A
    t.delete([("k", "=", 150)], dv=True)       # 1% of file B
    before = {a["file"] for a in t.snapshot_adds()}
    t.reorg(min_dv_ratio=0.1)
    adds = t.snapshot_adds()
    after = {a["file"] for a in adds}
    # file B survived by reference (still has its small dv); A replaced
    assert len(before & after) == 1
    heavy = [a for a in adds if a.get("dv")]
    assert len(heavy) == 1 and len(heavy[0]["dv"]) == 1
    assert sorted(r.k for r in t.read().collect()) == [
        k for k in range(40, 200) if k != 150
    ]
    assert t.describe_history()[0]["operation"] == "REORG (PURGE)"
    # nothing above the ratio anymore: no-op
    v = t.latest_version()
    assert t.reorg(min_dv_ratio=0.1) == v


def test_dv_delete_conflicts_with_interleaved_dv_update(spark, tmp_path):
    """A DV delete computed before a DV UPDATE landed must conflict —
    the update re-added updated copies of rows outside the delete's
    vector, so publishing would let 'deleted' rows survive."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 50).coalesce(1))
    base = t.latest_version()
    touched = t.snapshot_adds(base)
    t.update({"v": "v + 1"}, where=[("k", "=", 7)], dv=True)  # interleaves
    with pytest.raises(CommitConflict, match="DV-updated"):
        t._delete_dv(touched, [("k", "=", 7)], base)

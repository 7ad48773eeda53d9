"""Transaction-logged Parquet table (novlake_spark.txlog): atomic
multi-file commits, snapshot isolation / time travel, optimistic
concurrency, compaction, vacuum."""

import pytest

from novlake_spark.txlog import CommitConflict, TxTable


def _df(spark, *vals):
    return spark.createDataFrame([(v,) for v in vals], "x long")


def test_append_read_and_time_travel(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    assert t.commit(_df(spark, 1, 2)) == 0
    assert t.commit(_df(spark, 3)) == 1
    assert sorted(r.x for r in t.read().collect()) == [1, 2, 3]
    assert sorted(r.x for r in t.read(version=0).collect()) == [1, 2]


def test_overwrite_replaces_snapshot(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 1, 2))
    t.commit(_df(spark, 9), mode="overwrite")
    assert [r.x for r in t.read().collect()] == [9]
    # the pre-overwrite snapshot is still readable (isolation)
    assert sorted(r.x for r in t.read(version=0).collect()) == [1, 2]


def test_append_survives_a_lost_race(spark, tmp_path):
    """A competing writer claims the version we computed; the append
    must land in the NEXT slot without rewriting data files."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 1))
    # simulate the race: another writer publishes version 1 between our
    # version computation and publish
    rival = TxTable(spark, str(tmp_path / "t"))
    real_publish = t._try_publish

    def racy_publish(entry):
        if entry["version"] == 1 and not racy_publish.raced:
            racy_publish.raced = True
            rival.commit(_df(spark, 100))  # rival takes version 1
        return real_publish(entry)

    racy_publish.raced = False
    t._try_publish = racy_publish
    v = t.commit(_df(spark, 2))
    assert v == 2  # retried into the next slot
    assert sorted(r.x for r in t.read().collect()) == [1, 2, 100]


def test_conflict_exhaustion_cleans_up(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 1))
    t._try_publish = lambda entry: False
    with pytest.raises(CommitConflict):
        t.commit(_df(spark, 2), max_retries=2)
    # the unpublished files were deleted; the table is unchanged
    t2 = TxTable(spark, str(tmp_path / "t"))
    assert [r.x for r in t2.read().collect()] == [1]
    assert t2.versions() == [0]


def test_compact_and_vacuum(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    for v in (1, 2, 3):
        t.commit(_df(spark, v))
    n_before = len(t.snapshot_files())
    cv = t.compact()
    assert sorted(r.x for r in t.read().collect()) == [1, 2, 3]
    assert len(t.snapshot_files()) < n_before or n_before == 1
    # old files survive for time travel until vacuumed
    assert sorted(r.x for r in t.read(version=2).collect()) == [1, 2, 3]
    removed = t.vacuum(keep_from_version=cv)
    assert removed  # pre-compaction files are gone
    assert sorted(r.x for r in t.read().collect()) == [1, 2, 3]
    with pytest.raises(Exception):
        t.read(version=2).collect()


def test_txn_idempotent_commit(spark, tmp_path):
    """Same txn id committed twice -> second is a no-op returning the
    original version (the foreachBatch-replay exactly-once contract)."""
    t = TxTable(spark, str(tmp_path / "t"))
    v1 = t.commit(_df(spark, 1, 2), txn="app.batch0")
    v2 = t.commit(_df(spark, 1, 2), txn="app.batch0")  # replay
    assert v1 == v2
    assert sorted(r.x for r in t.read().collect()) == [1, 2]
    assert len(t.versions()) == 1


def test_streaming_foreachbatch_exactly_once_into_txtable(spark, sf_small, tmp_path):
    """End-to-end: a file-source stream lands in a TxTable through
    foreachBatch with txn-keyed commits; a deliberate double-invocation
    of the batch function (simulating a post-failure re-execution) does
    not duplicate rows."""
    import pyspark.sql.functions as F
    from novlake_spark.sources.tables import load_table

    events = load_table(spark, sf_small, "events")
    src = str(tmp_path / "src")
    events.limit(100).select("event_id", "user_id").repartition(2).write.parquet(src)

    t = TxTable(spark, str(tmp_path / "table"))

    def sink(batch_df, batch_id):
        t.commit(batch_df, txn=f"q1.{batch_id}")
        t.commit(batch_df, txn=f"q1.{batch_id}")  # simulated retry

    q = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert t.read().count() == 100
    assert t.read().select("event_id").distinct().count() == 100


def test_replay_properties():
    """Pure log-replay invariants on randomized commit histories."""
    from hypothesis import given, settings, strategies as st

    from novlake_spark.txlog import replay

    files = st.text(alphabet="abc", min_size=1, max_size=2)
    entry = st.builds(
        lambda mode, add, remove: {
            "mode": mode,
            "add": [{"file": f} for f in add],
            "remove": remove,
        },
        st.sampled_from(["append", "overwrite"]),
        st.lists(files, max_size=3),
        st.lists(files, max_size=2),
    )

    @settings(max_examples=300, deadline=None)
    @given(entries=st.lists(entry, max_size=8))
    def check(entries):
        live = replay(entries)
        # 1. prefix monotone: replay(all) == fold of replay(prefix) + last
        if entries:
            assert live == replay(
                [{"mode": "append", "add": [{"file": f} for f in replay(entries[:-1])],
                  "remove": []}, entries[-1]]
            )
        # 2. overwrite resets: anything before the last overwrite is gone
        #    unless re-added after it
        for i, e in enumerate(entries):
            if e["mode"] == "overwrite":
                later = replay(entries[i:])
                assert set(live) == set(later) or any(
                    x["mode"] == "overwrite" for x in entries[i + 1:]
                )
        # 3. a file removed in the final entry is not live
        if entries:
            for f in entries[-1]["remove"]:
                if not any(a["file"] == f for a in entries[-1]["add"]):
                    assert f not in live

    check()

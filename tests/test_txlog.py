"""Transaction-logged Parquet table (novlake_spark.txlog): atomic
multi-file commits, snapshot isolation / time travel, optimistic
concurrency, compaction, vacuum, stats-based file skipping, schema
enforcement/evolution, MERGE."""

import pytest

from novlake_spark.txlog import CommitConflict, SchemaMismatch, TxTable, file_matches


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
    preview = t.vacuum(keep_from_version=cv, retain_ms=0, dry_run=True)
    assert preview and t.read(version=2).count() == 3  # nothing deleted yet
    removed = t.vacuum(keep_from_version=cv, retain_ms=0)  # quiesced table
    assert sorted(removed) == sorted(preview)  # dry run predicted exactly
    assert removed  # pre-compaction files are gone
    assert sorted(r.x for r in t.read().collect()) == [1, 2, 3]
    with pytest.raises(Exception):
        t.read(version=2).collect()


def test_scoped_compaction_rewrites_only_matching_files(spark, tmp_path):
    """OPTIMIZE … WHERE: compaction scoped by stats — only files whose
    range admits the predicate rewrite; the rest ride by reference."""
    t = TxTable(spark, str(tmp_path / "t"))
    for lo in (0, 100, 200, 300):
        for part in (0, 5):
            df = spark.createDataFrame([(lo + part + i,) for i in range(5)], "x long")
            t.commit(df.coalesce(1))
    before = {a["file"] for a in t.snapshot_adds()}
    assert len(before) == 8
    t.compact(where=[("x", "<", 110)])  # files for ranges 0.. and 100..
    after = {a["file"] for a in t.snapshot_adds()}
    untouched = {a["file"] for a in t.snapshot_adds() if a["stats"]["x"][0] >= 200}
    assert untouched <= before  # out-of-scope files never rewritten
    assert len(after) < len(before)
    # compaction moves rows, never drops them — even rows outside the
    # predicate inside an admitted file
    assert t.read().count() == 40
    assert sorted(r.x for r in t.read(where=[("x", "<", 10)]).collect()) == list(range(10))


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


# ---------------------------------------------------------------------------
# round-3 hardening: temp-file hygiene, vacuum retention, logical conflicts
# ---------------------------------------------------------------------------

def test_stale_temp_and_junk_log_files_do_not_brick_the_table(spark, tmp_path):
    """A writer that dies between temp-create and rename (or any junk in
    _log/) must not break readers or later committers — the round-2
    ADVICE 'high': _log/.tmp-*.json matched the versions() glob and
    int() crashed every subsequent operation."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 1, 2))
    log_dir = tmp_path / "t" / "_log"
    # junk a dead writer could leave in the old (buggy) layout, plus
    # arbitrary non-numeric names
    (log_dir / ".tmp-deadbeef.json").write_text("{not even json")
    (log_dir / "garbage.json").write_text("{}")
    (log_dir / "_tmp").mkdir(exist_ok=True)
    (log_dir / "_tmp" / "orphan").write_text('{"version": 99}')
    t2 = TxTable(spark, str(tmp_path / "t"))
    assert t2.versions() == [0]
    assert sorted(r.x for r in t2.read().collect()) == [1, 2]
    assert t2.commit(_df(spark, 3)) == 1  # committing still works


def test_vacuum_retention_protects_inflight_commit_files(spark, tmp_path):
    """_write_data lands files in data/ BEFORE the log publish; vacuum
    must never delete unreferenced-but-young files (round-2 ADVICE
    'medium': a vacuum racing an in-flight commit corrupted it)."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 1))
    # simulate an in-flight commit: data staged, log entry not yet published
    adds = t._write_data(_df(spark, 99))
    assert t.snapshot_files() != [a["file"] for a in adds]  # unpublished
    removed = t.vacuum(keep_from_version=0)  # default 1h retention
    assert removed == []  # young in-flight files survive
    # the in-flight commit can still publish and read back intact
    v = t.commit(_df(spark, 2))
    assert sorted(r.x for r in t.read().collect()) == [1, 2]
    # with the window forced off, the (now abandoned) staged files of the
    # simulated dead writer do get reclaimed
    removed = t.vacuum(keep_from_version=0, retain_ms=0)
    assert sorted(removed) == sorted(a["file"] for a in adds)
    assert sorted(r.x for r in t.read().collect()) == [1, 2]


def test_concurrent_compactions_conflict_instead_of_duplicating(spark, tmp_path):
    """Two compactions from the same base must not both land (round-2
    ADVICE 'medium': blind rebase let both remove-lists apply
    idempotently and every row came back twice)."""
    t = TxTable(spark, str(tmp_path / "t"))
    for v in (1, 2, 3):
        t.commit(_df(spark, v))
    rival = TxTable(spark, str(tmp_path / "t"))
    rival.compact()  # first compaction lands
    with pytest.raises(CommitConflict):
        t.compact(target_version=2)  # second, derived from the old base
    assert sorted(r.x for r in t.read().collect()) == [1, 2, 3]


def test_remove_remove_conflict_detected_on_retry(spark, tmp_path):
    """A remove-commit that loses the publish race to an overlapping
    remove must raise, not rebase."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 1))
    t.commit(_df(spark, 2))
    files = t.snapshot_files()
    rival = TxTable(spark, str(tmp_path / "t"))
    real_publish = t._try_publish

    def racy_publish(entry):
        if not racy_publish.raced:
            racy_publish.raced = True
            rival.compact()  # rival removes the same files first
        return real_publish(entry)

    racy_publish.raced = False
    t._try_publish = racy_publish
    with pytest.raises(CommitConflict):
        t.commit(_df(spark, 1, 2), remove=files)
    assert sorted(r.x for r in t.read().collect()) == [1, 2]


def test_append_composes_across_interleaved_overwrite_free_commits(spark, tmp_path):
    """Pure appends never logically conflict — they retry into the next
    slot (regression guard: the conflict check must not over-reject)."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 1))
    rival = TxTable(spark, str(tmp_path / "t"))
    real_publish = t._try_publish

    def racy_publish(entry):
        if not racy_publish.raced:
            racy_publish.raced = True
            rival.commit(_df(spark, 100))
        return real_publish(entry)

    racy_publish.raced = False
    t._try_publish = racy_publish
    assert t.commit(_df(spark, 2)) == 2
    assert sorted(r.x for r in t.read().collect()) == [1, 2, 100]


# ---------------------------------------------------------------------------
# per-file min/max stats + file skipping
# ---------------------------------------------------------------------------

def test_add_actions_carry_rows_and_minmax_stats(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "x long, s string")
    t.commit(df.coalesce(1))
    (add,) = t.snapshot_adds()
    assert add["rows"] == 3
    assert add["stats"]["x"] == [1, 3]
    assert add["stats"]["s"] == ["a", "c"]


def test_predicate_read_plans_only_matching_files(spark, tmp_path):
    """N files with disjoint key ranges: a predicate read must touch
    only the matching files (VERDICT round-2 'missing' #3)."""
    t = TxTable(spark, str(tmp_path / "t"))
    for lo in (0, 100, 200, 300):
        df = spark.createDataFrame([(lo + i,) for i in range(10)], "x long")
        t.commit(df.coalesce(1))
    assert len(t.snapshot_adds()) == 4
    plan = t.scan_plan([("x", ">=", 100), ("x", "<", 150)])
    assert plan["total"] == 4 and plan["scanned"] == 1
    out = t.read(where=[("x", ">=", 100), ("x", "<", 150)])
    # the Spark scan reads exactly the one admitted file
    assert len(out.inputFiles()) == 1
    assert sorted(r.x for r in out.collect()) == list(range(100, 110))
    # residual filter still applies row-level inside the admitted file
    out2 = t.read(where=[("x", "=", 105)])
    assert [r.x for r in out2.collect()] == [105]


def test_in_list_read_prunes_and_scopes_dml(spark, tmp_path):
    """IN-list point lookups prune on the JVM path too (range check +
    Bloom probe per listed value), and the same tuple grammar scopes
    DML row filters — parity with the Python source's pushFilters."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.bloom_cols = ["x"]
    for lo in (0, 100, 200, 300):
        df = spark.createDataFrame([(lo + i,) for i in range(10)], "x long")
        t.commit(df.coalesce(1))
    plan = t.scan_plan([("x", "in", [5, 7])])  # both in file 1
    assert plan["total"] == 4 and plan["scanned"] == 1
    # range admits file 1, bloom rejects the absent values inside it
    assert t.scan_plan([("x", "in", [50, 60])])["scanned"] == 0
    out = t.read(where=[("x", "in", [5, 205])])
    assert len(out.inputFiles()) == 2  # one per matching range
    assert sorted(r.x for r in out.collect()) == [5, 205]
    # DML with an IN scope: deletes exactly the listed keys
    t.delete([("x", "in", [3, 301])])
    remaining = {r.x for r in t.read().collect()}
    assert 3 not in remaining and 301 not in remaining
    assert len(remaining) == 38


def test_file_skipping_is_conservative(spark, tmp_path):
    """Missing stats, null-only columns and non-comparable values must
    keep (or provably-skip) files without ever losing rows."""
    # a legacy add-action with no stats is always scanned
    assert file_matches({"file": "f"}, [("x", "=", 1)])
    # zero-row files are always skipped
    assert not file_matches({"file": "f", "rows": 0}, [])
    # all-null column: no comparison predicate can match
    assert not file_matches(
        {"file": "f", "rows": 5, "stats": {"x": [None, None]}}, [("x", ">", 1)]
    )
    # type-mismatched predicate value: keep the file
    assert file_matches(
        {"file": "f", "rows": 5, "stats": {"x": [1, 9]}}, [("x", "=", "nine")]
    )


def test_merge_rewrites_only_overlapping_files(spark, tmp_path):
    """MERGE via the log: one atomic remove+add commit, scoped by key
    stats to the files the source can touch."""
    t = TxTable(spark, str(tmp_path / "t"))
    for lo in (0, 100, 200):
        df = spark.createDataFrame(
            [(lo + i, f"v{lo + i}") for i in range(10)], "k long, v string"
        )
        t.commit(df.coalesce(1))
    before = set(t.snapshot_files())
    src = spark.createDataFrame([(105, "NEW"), (108, "NEW")], "k long, v string")
    t.merge(src, key=["k"])
    after = set(t.snapshot_files())
    # files 0-9 and 200-209 carried by reference, 100-109 rewritten
    assert len(before & after) == 2
    got = {r.k: r.v for r in t.read().collect()}
    assert len(got) == 30
    assert got[105] == "NEW" and got[108] == "NEW" and got[101] == "v101"
    # delete_matched drops the keys instead
    t.merge(spark.createDataFrame([(205, "x")], "k long, v string"),
            key=["k"], delete_matched=True)
    assert t.read().count() == 29
    assert t.read(where=[("k", "=", 205)]).count() == 0


def test_merge_concurrent_reader_sees_old_or_new_never_a_mix(spark, tmp_path):
    """Snapshot isolation through a MERGE: a reader that resolved its
    file set before the merge still reads a consistent snapshot; no
    *_old / *_merging prefixes ever exist (VERDICT next-round #2)."""
    import os
    t = TxTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(i, "old") for i in range(20)], "k long, v string")
    t.commit(df)
    reader = t.read(version=0)  # resolves files at version 0
    src = spark.createDataFrame([(k, "new") for k in range(5)], "k long, v string")
    t.merge(src, key=["k"])
    # old snapshot: fully old values; new snapshot: merged
    assert {r.v for r in reader.collect()} == {"old"}
    got = {r.k: r.v for r in t.read().collect()}
    assert sum(1 for v in got.values() if v == "new") == 5
    assert not [p for p in os.listdir(tmp_path) if p.endswith(("_old", "_merging"))]


def test_merge_on_empty_table_inserts(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    src = spark.createDataFrame([(1, "a")], "k long, v string")
    t.merge(src, key=["k"])
    assert [(r.k, r.v) for r in t.read().collect()] == [(1, "a")]


# ---------------------------------------------------------------------------
# schema enforcement + additive evolution
# ---------------------------------------------------------------------------

def test_schema_enforced_on_append(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(1, "a")], "x long, s string"))
    # identical schema: fine
    t.commit(spark.createDataFrame([(2, "b")], "x long, s string"))
    # missing column: rejected before any data lands
    with pytest.raises(SchemaMismatch):
        t.commit(spark.createDataFrame([(3,)], "x long"))
    # changed type: rejected
    with pytest.raises(SchemaMismatch):
        t.commit(spark.createDataFrame([("3", "c")], "x string, s string"))
    assert t.read().count() == 2  # no partial writes from the rejects


def test_schema_additive_evolution_and_merged_readback(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(1, "a")], "x long, s string"))
    # superset: accepted, schema evolves
    t.commit(spark.createDataFrame([(2, "b", 9.5)], "x long, s string, score double"))
    cur = t.schema_at()
    assert [f.name for f in cur.fields] == ["x", "s", "score"]
    rows = {r.x: r.score for r in t.read().collect()}
    assert rows == {1: None, 2: 9.5}  # old file surfaces new column as null
    # time travel reads the old schema
    assert [f.name for f in t.schema_at(version=0).fields] == ["x", "s"]
    assert "score" not in t.read(version=0).columns


def test_schema_overwrite_may_change_freely(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(1, "a")], "x long, s string"))
    t.commit(spark.createDataFrame([(True,)], "flag boolean"), mode="overwrite")
    assert t.read().columns == ["flag"]
    assert [f.name for f in t.schema_at().fields] == ["flag"]


# ---------------------------------------------------------------------------
# log checkpoints: O(checkpoint + tail) snapshot resolution
# ---------------------------------------------------------------------------

def test_checkpoint_resolution_reads_only_the_tail(spark, tmp_path):
    """After checkpoint(C), resolving the latest snapshot must read the
    checkpoint plus entries > C only — not the whole log."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.checkpoint_interval = 0  # manual control in this test
    for v in range(6):
        t.commit(_df(spark, v))
    t.checkpoint()  # at version 5
    t.commit(_df(spark, 100))
    fresh = TxTable(spark, str(tmp_path / "t"))
    read_versions = []
    real_read = fresh._read_entry
    fresh._read_entry = lambda v: (read_versions.append(v), real_read(v))[1]
    assert sorted(r.x for r in fresh.read().collect()) == [0, 1, 2, 3, 4, 5, 100]
    assert set(read_versions) == {6}  # only the post-checkpoint tail


def test_checkpoint_preserves_time_travel_and_schema(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.checkpoint_interval = 0
    t.commit(spark.createDataFrame([(1, "a")], "x long, s string"))
    t.commit(spark.createDataFrame([(2, "b", 1.5)], "x long, s string, f double"))
    t.checkpoint()
    # checkpoint carries the evolved schema
    fresh = TxTable(spark, str(tmp_path / "t"))
    assert [f.name for f in fresh.schema_at().fields] == ["x", "s", "f"]
    # time travel below the checkpoint still replays entries
    assert sorted(r.x for r in fresh.read(version=0).collect()) == [1]
    assert "f" not in fresh.read(version=0).columns


def test_auto_checkpoint_every_interval(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.checkpoint_interval = 3
    for v in range(7):  # versions 0..6 -> auto-checkpoints at 3 and 6
        t.commit(_df(spark, v))
    assert t.checkpoints() == [3, 6]
    assert sorted(r.x for r in t.read().collect()) == list(range(7))


def test_clean_log_after_checkpoint(spark, tmp_path):
    """Entries at/below the newest checkpoint <= horizon are deletable;
    later snapshots resolve from checkpoint + retained tail."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.checkpoint_interval = 0
    for v in range(5):
        t.commit(_df(spark, v))
    with pytest.raises(ValueError):
        t.clean_log(keep_from_version=3)  # no checkpoint yet
    t.checkpoint(3)
    removed = t.clean_log(keep_from_version=3)
    assert removed == [0, 1, 2, 3]
    fresh = TxTable(spark, str(tmp_path / "t"))
    assert sorted(r.x for r in fresh.read().collect()) == [0, 1, 2, 3, 4]
    assert sorted(r.x for r in fresh.read(version=3).collect()) == [0, 1, 2, 3]
    with pytest.raises(ValueError):
        fresh.read(version=1)  # below the cleaned horizon
    # committing continues normally after log cleaning
    assert fresh.commit(_df(spark, 99)) == 5
    assert 99 in [r.x for r in fresh.read().collect()]


def test_txn_idempotency_survives_clean_log(spark, tmp_path):
    """Checkpoints carry the txn map, so a replayed foreachBatch commit
    stays a no-op even after its log entry was cleaned away."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.checkpoint_interval = 0
    v0 = t.commit(_df(spark, 1), txn="app.b0")
    t.commit(_df(spark, 2), txn="app.b1")
    t.checkpoint()
    t.clean_log(keep_from_version=2)
    fresh = TxTable(spark, str(tmp_path / "t"))
    assert fresh.versions() == []  # entries folded into the checkpoint
    assert fresh.commit(_df(spark, 1), txn="app.b0") == v0  # replay = no-op
    assert sorted(r.x for r in fresh.read().collect()) == [1, 2]


def test_commit_after_full_clean_log_does_not_reuse_versions(spark, tmp_path):
    """With every entry folded into a checkpoint, the next commit must
    claim checkpoint_version+1, not version 0 (a re-claimed low version
    would be invisible to replay — data loss)."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.checkpoint_interval = 0
    t.commit(_df(spark, 1))
    t.commit(_df(spark, 2))
    t.checkpoint()  # at 1
    t.clean_log(keep_from_version=2)
    fresh = TxTable(spark, str(tmp_path / "t"))
    assert fresh.versions() == []
    assert fresh.commit(_df(spark, 3)) == 2  # NOT 0
    assert sorted(r.x for r in fresh.read().collect()) == [1, 2, 3]
    # vacuum must treat checkpoint-held files as live
    assert fresh.vacuum(keep_from_version=0, retain_ms=0) == []
    assert sorted(r.x for r in fresh.read().collect()) == [1, 2, 3]


# -------------------------------------------------------- bloom skipping

def test_bloom_skips_point_lookups(spark, tmp_path):
    """Equality predicates on a high-cardinality string key must skip
    files via the per-file Bloom filter — min/max can't prune a uuid-ish
    key that spans the full range in every file."""
    import pyspark.sql.functions as F

    from novlake_spark.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    t.bloom_cols = ["u"]
    # 8 commits of 50 rows each; the key is md5(id) so every file's
    # min/max range covers essentially the whole keyspace
    df = spark.range(400).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("u")
    )
    for i in range(8):
        t.commit(df.filter((F.col("id") >= i * 50) & (F.col("id") < (i + 1) * 50)).coalesce(1))
    probe = df.filter(F.col("id") == 123).collect()[0].u
    plan = t.scan_plan([("u", "=", probe)])
    assert plan["total"] == 8
    assert plan["scanned"] == 1, plan  # bloom pinpoints the one file
    # absent value: nothing scanned (false positives possible but ~0 at
    # 50 rows / 8192 bits)
    missing = t.scan_plan([("u", "=", "definitely-not-a-key")])
    assert missing["scanned"] == 0, missing
    # row-level correctness through the pruned read
    rows = t.read(where=[("u", "=", probe)]).collect()
    assert len(rows) == 1 and rows[0].id == 123


def test_bloom_skips_integer_keys_and_merges_survive(spark, tmp_path):
    import pyspark.sql.functions as F

    from novlake_spark.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    t.bloom_cols = ["k"]
    # interleaved keys: file A gets evens, file B odds — min/max ranges
    # overlap completely, only the bloom can tell them apart
    base = spark.range(200).select((F.col("id") * 7919 % 100000).alias("k"), F.col("id").alias("v"))
    t.commit(base.filter(F.col("k") % 2 == 0).coalesce(1))
    t.commit(base.filter(F.col("k") % 2 == 1).coalesce(1))
    some_even = base.filter(F.col("k") % 2 == 0).limit(1).collect()[0].k
    plan = t.scan_plan([("k", "=", int(some_even))])
    assert plan["scanned"] == 1, plan
    # files written without bloom (pre-existing) are conservatively kept
    t2 = TxTable(spark, str(tmp_path / "t2"))
    t2.commit(base.coalesce(1))  # no bloom_cols set
    assert t2.scan_plan([("k", "=", 1)])["scanned"] == 1  # kept, not skipped


# -- CLONE ----------------------------------------------------------------


def _kv2(spark, lo, hi):
    import pyspark.sql.functions as F

    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_shallow_clone_is_metadata_only(spark, tmp_path):
    src = TxTable(spark, str(tmp_path / "src"))
    src.commit(_kv2(spark, 0, 100))
    src.commit(_kv2(spark, 100, 200))
    clone = src.clone(str(tmp_path / "cl"))
    # zero-copy: the clone owns no data files at all
    import os

    assert not os.path.exists(str(tmp_path / "cl" / "data"))
    assert sorted(r.k for r in clone.read().collect()) == list(range(200))
    # stats rode along: file skipping works on the clone immediately
    plan = clone.scan_plan([("k", ">=", 150)])
    assert plan["scanned"] < plan["total"]


def test_clone_time_travel_pin(spark, tmp_path):
    src = TxTable(spark, str(tmp_path / "src"))
    src.commit(_kv2(spark, 0, 50))
    src.commit(_kv2(spark, 50, 80))
    clone = src.clone(str(tmp_path / "cl"), version=0)
    assert clone.read().count() == 50  # pinned at source version 0
    src.commit(_kv2(spark, 80, 90))
    assert clone.read().count() == 50  # source evolution is invisible


def test_clone_divergence_and_source_isolation(spark, tmp_path):
    src = TxTable(spark, str(tmp_path / "src"))
    src.commit(_kv2(spark, 0, 100))
    clone = src.clone(str(tmp_path / "cl"))
    clone.commit(_kv2(spark, 100, 120))  # clone-local append
    clone.delete([("k", "<", 10)])  # rewrites a REFERENCED file locally
    assert sorted(r.k for r in clone.read().collect()) == list(range(10, 120))
    # the source never noticed: same rows, same files on disk
    assert sorted(r.k for r in src.read().collect()) == list(range(100))
    # change feed across the clone's rewrite resolves the source path
    changes = clone.changes(0)
    assert {r._change_type for r in changes.collect()} == {"insert", "delete"}


def test_clone_vacuum_never_deletes_source_files(spark, tmp_path):
    src = TxTable(spark, str(tmp_path / "src"))
    src.commit(_kv2(spark, 0, 100))
    clone = src.clone(str(tmp_path / "cl"))
    clone.delete([("k", "<", 50)])  # clone rewrite orphans the references
    removed = clone.vacuum(keep_from_version=clone.latest_version(), retain_ms=0)
    # vacuum only globs the clone's own data/ — source files are immune
    assert src.read().count() == 100
    for f in removed:
        assert (tmp_path / "cl" / "data" / f).exists() is False


def test_deep_clone_is_self_contained(spark, tmp_path):
    src = TxTable(spark, str(tmp_path / "src"))
    src.commit(_kv2(spark, 0, 60))
    clone = src.clone(str(tmp_path / "cl"), deep=True)
    import shutil

    shutil.rmtree(str(tmp_path / "src"))  # source gone entirely
    assert clone.read().count() == 60


def test_clone_refuses_existing_target(spark, tmp_path):
    src = TxTable(spark, str(tmp_path / "src"))
    src.commit(_kv2(spark, 0, 10))
    other = TxTable(spark, str(tmp_path / "cl"))
    other.commit(_kv2(spark, 0, 5))
    with pytest.raises(ValueError, match="already a table"):
        src.clone(str(tmp_path / "cl"))


def test_clone_readable_through_data_source(spark, tmp_path):
    from novlake_spark.sources.txlog_source import register_txlog_source

    src = TxTable(spark, str(tmp_path / "src"))
    src.commit(_kv2(spark, 0, 40))
    src.clone(str(tmp_path / "cl"))
    register_txlog_source(spark)
    df = spark.read.format("txlog").option("path", str(tmp_path / "cl")).load()
    assert df.count() == 40


# -- TIMESTAMP AS OF ------------------------------------------------------


def test_timestamp_as_of(spark, tmp_path):
    import time

    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv2(spark, 0, 10))
    time.sleep(0.05)
    between = int(time.time() * 1000)
    time.sleep(0.05)
    t.commit(_kv2(spark, 10, 20))
    assert t.read(timestamp_ms=between).count() == 10
    assert t.read(timestamp_ms=int(time.time() * 1000)).count() == 20
    assert t.version_at_time(between) == 0
    with pytest.raises(ValueError, match="no commit at or before"):
        t.version_at_time(between - 10_000_000)
    with pytest.raises(ValueError, match="not both"):
        t.read(version=0, timestamp_ms=between)


def test_timestamp_as_of_spans_python_commits(spark, tmp_path):
    """Entries published by the Python writer are stamped too — time
    travel resolves across a mixed-writer history."""
    import time

    from novlake_spark.sources.txlog_source import register_txlog_source

    register_txlog_source(spark)
    path = str(tmp_path / "t")
    t = TxTable(spark, path)
    t.commit(_kv2(spark, 0, 10))
    time.sleep(0.05)
    between = int(time.time() * 1000)
    time.sleep(0.05)
    _kv2(spark, 10, 20).write.format("txlog").option("path", path).mode("append").save()
    assert t.read(timestamp_ms=between).count() == 10
    assert t.version_at_time(int(time.time() * 1000)) == 1


def test_lake_attach_tx_sql_over_snapshots(spark, tmp_path):
    from novlake_spark.lake import Lake

    lake = Lake(spark)
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv2(spark, 0, 10))
    t.commit(_kv2(spark, 10, 30))
    lake.attach_tx(t.path, "tcur")
    lake.attach_tx(t.path, "t0", version=0)
    got = lake.query(
        "SELECT (SELECT count(*) FROM tcur) AS cur, (SELECT count(*) FROM t0) AS v0"
    ).collect()[0]
    assert (got.cur, got.v0) == (30, 10)


def test_cluster_by_commit_prunes_from_first_read(spark, tmp_path):
    """Ingest-time clustering: a cluster_by commit range-partitions the
    data so file stats are tight, and a point/range predicate prunes
    files WITHOUT any OPTIMIZE rewrite."""
    import pyspark.sql.functions as F

    t = TxTable(spark, str(tmp_path / "t"))
    # deliberately shuffled input: without clustering every file would
    # span the whole key range and nothing could prune
    df = (
        spark.range(0, 10_000)
        .select(F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
        .orderBy(F.rand(seed=7))
    )
    t.commit(df, cluster_by=["k"], target_files=8)
    plan = t.scan_plan([("k", ">=", 9_900)])
    assert plan["total"] > 1
    assert plan["scanned"] < plan["total"]
    assert t.read(where=[("k", ">=", 9_900)]).count() == 100


def test_describe_history_labels_operations(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv2(spark, 0, 50).coalesce(1))
    t.merge(_kv2(spark, 40, 60), key=["k"])
    t.delete([("k", "=", 3)], dv=True)
    t.update({"v": "v + 1"}, where=[("k", "=", 10)])
    t.analyze(bloom_cols=["k"])
    hist = t.describe_history()
    ops = [h["operation"] for h in hist]
    assert ops == ["ANALYZE", "UPDATE", "DELETE (DV)", "MERGE", "WRITE"]
    assert hist[0]["version"] == 4 and hist[-1]["version"] == 0
    assert hist[2]["dv_rows"] == 1
    assert all(h["timestamp_ms"] > 0 for h in hist)


def test_cluster_by_accepts_transforms(spark, tmp_path):
    """Hidden-partitioning-style transform expressions cluster the data
    (files span few distinct buckets) while the column stays raw."""
    import pyspark.sql.functions as F

    t = TxTable(spark, str(tmp_path / "t"))
    df = spark.range(0, 2_000).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("bucket_src")
    ).orderBy(F.rand(seed=3))
    t.commit(df, cluster_by=["k % 4"], target_files=4)
    # range partitioner boundaries come from sampling, so the exact
    # file count wobbles — what matters: multiple files, full fidelity
    assert 2 <= len(t.snapshot_adds()) <= 4
    assert t.read().count() == 2_000


def test_detail_and_small_file_compaction(spark, tmp_path):
    """detail() reports snapshot totals from metadata; small-file
    compaction merges only the per-batch dribble, carrying big files
    by reference."""
    import pyspark.sql.functions as F

    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv2(spark, 0, 20_000).coalesce(1))  # one big file
    for i in range(3):  # sink-style dribble: three tiny commits
        t.commit(_kv2(spark, 20_000 + i * 10, 20_000 + (i + 1) * 10).coalesce(1))
    d = t.detail()
    assert d["num_files"] == 4 and d["rows"] == 20_030
    assert d["bytes"] and d["bytes"] > 0
    big = {a["file"] for a in t.snapshot_adds() if a["bytes"] > 50_000}
    assert len(big) == 1
    t.compact(small_file_mb=0.05)  # 50 KB threshold
    adds = t.snapshot_adds()
    assert big <= {a["file"] for a in adds}  # big file untouched
    assert len(adds) == 2  # big + one merged small
    assert t.read().count() == 20_030
    assert t.describe_history()[0]["operation"] == "COMPACT"
    # below-2-files: no-op
    v = t.latest_version()
    assert t.compact(small_file_mb=0.05) == v


def test_maintenance_runbook(spark, tmp_path):
    """The scheduled-maintenance sequence on a lived-in table: dribbled
    commits + DV deletes in, fewer files / no heavy DVs / stats+bloom /
    trimmed log+data out — all while staying readable and correct."""
    import sys

    sys.path.insert(0, "tools")
    from maintenance import maintain

    t = TxTable(spark, str(tmp_path / "t"))
    for i in range(6):  # sink-style dribble
        t.commit(_kv2(spark, i * 100, (i + 1) * 100).coalesce(1))
    t.delete([("k", "<", 50)], dv=True)  # heavy DV on the first file
    expect = sorted(range(50, 600))
    report = maintain(
        spark,
        t.path,
        keep_versions=2,
        small_file_mb=1.0,
        dv_ratio=0.1,
        bloom_cols=["k"],
        retain_ms=0,
    )
    assert sorted(r.k for r in t.read().collect()) == expect
    after = report["after"]
    assert after["num_files"] < report["before"]["num_files"]
    assert after["dv_rows"] == 0
    assert all("k" in (a.get("bloom") or {}) for a in t.snapshot_adds())
    assert report["fsck"] == []  # no dangling references on a healthy table
    assert isinstance(report["vacuum"], list)
    # log trimmed: early versions resolved only through the checkpoint
    assert min(t.versions()) > 0


def test_add_and_drop_column_metadata_only(spark, tmp_path):
    import os

    import pyspark.sql.functions as F
    import pytest as _pytest

    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv2(spark, 0, 20))
    files = sorted(os.listdir(str(tmp_path / "t" / "data")))
    t.add_column("tag", "string")
    assert sorted(os.listdir(str(tmp_path / "t" / "data"))) == files
    rows = t.read().collect()
    assert all(r.tag is None for r in rows) and len(rows) == 20
    # new writes may carry it; old files still surface null
    t.commit(_kv2(spark, 20, 25).withColumn("tag", F.lit("x")))
    vals = {r.k: r.tag for r in t.read().collect()}
    assert vals[3] is None and vals[22] == "x"
    # drop hides the column everywhere without touching data files
    t.drop_column("tag")
    assert "tag" not in t.read().columns
    # time travel still sees the pre-drop shape
    assert "tag" in t.read(version=t.latest_version() - 1).columns
    with _pytest.raises(KeyError):
        t.drop_column("tag")
    with _pytest.raises(ValueError, match="already exists"):
        t.add_column("k", "long")
    # constraint-referenced columns are protected
    t.add_constraint("v_pos", "v >= 0")
    with _pytest.raises(ValueError, match="referenced by CHECK"):
        t.drop_column("v")
    ops = [h["operation"] for h in t.describe_history()]
    assert "ADD COLUMN" in ops and "DROP COLUMN" in ops


def test_vacuum_chaos_never_corrupts_inflight_commits(spark, tmp_path):
    """True-thread chaos (VERDICT r3 #7): an aggressive vacuum loop
    (default retention window) races real commits. Every commit that
    lands must read back intact — the young-file guard is what stands
    between _write_data's stage-then-publish gap and data loss. 10
    rounds; the assertion is timing-independent."""
    import threading

    path = str(tmp_path / "t")
    t = TxTable(spark, path)
    t.commit(_df(spark, 0))
    stop = threading.Event()
    vac_removed, errors = [], []

    def vacuum_loop():
        v = TxTable(spark, path)
        while not stop.is_set():
            try:
                vac_removed.extend(v.vacuum(keep_from_version=0))
            except Exception as e:  # pragma: no cover - failure reporting
                errors.append(e)

    th = threading.Thread(target=vacuum_loop)
    th.start()
    committed = [0]
    try:
        for i in range(1, 11):
            TxTable(spark, path).commit(_df(spark, i))
            committed.append(i)
    finally:
        stop.set()
        th.join()
    assert not errors, errors
    assert vac_removed == []  # every unreferenced file was young
    # every landed commit reads back intact — no file went missing
    assert sorted(r.x for r in t.read().collect()) == committed
    assert t.fsck() == []  # no dangling add-actions

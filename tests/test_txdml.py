"""TxTable DML: DELETE / UPDATE (stats-scoped rewrites), RESTORE
(metadata-only rollback), and CHECK constraints."""

import pytest

from novlake_spark.txlog import ConstraintViolation, TxTable


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _three_file_table(spark, tmp_path):
    """Three commits with disjoint key ranges → three stats-scoped files."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, [(i, f"a{i}") for i in range(10)]).coalesce(1))
    t.commit(_kv(spark, [(i, f"b{i}") for i in range(100, 110)]).coalesce(1))
    t.commit(_kv(spark, [(i, f"c{i}") for i in range(200, 210)]).coalesce(1))
    return t


def test_delete_scopes_rewrite_to_matching_files(spark, tmp_path):
    t = _three_file_table(spark, tmp_path)
    before = {a["file"] for a in t.snapshot_adds()}
    v = t.delete([("k", ">=", 100), ("k", "<=", 105)])
    assert v == 3
    ks = sorted(r.k for r in t.read().collect())
    assert ks == list(range(10)) + list(range(106, 110)) + list(range(200, 210))
    # only the middle file was rewritten: the other two survive by reference
    after = {a["file"] for a in t.snapshot_adds()}
    assert len(before & after) == 2
    # pre-delete snapshot still time-travels
    assert len(t.read(version=2).collect()) == 30


def test_delete_null_predicate_keeps_row(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, [(1, "x"), (None, "null-key"), (2, "y")]))
    t.delete([("k", "<=", 1)])
    vs = sorted(r.v for r in t.read().collect())
    # SQL DELETE: NULL predicate is not TRUE → the null-key row stays
    assert vs == ["null-key", "y"]


def test_delete_no_matching_file_is_metadata_noop(spark, tmp_path):
    t = _three_file_table(spark, tmp_path)
    v = t.delete([("k", ">=", 1000)])
    assert v == 2  # current version returned, nothing published
    assert t.latest_version() == 2


def test_update_applies_only_to_matching_rows(spark, tmp_path):
    t = _three_file_table(spark, tmp_path)
    v = t.update({"v": "upper(v)", "k": "k + 1000"}, [("k", ">=", 200)])
    assert v == 3
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows[0] == "a0" and rows[100] == "b100"  # untouched
    assert 200 not in rows and rows[1200] == "C200"  # updated
    # schema did not drift (cast back to recorded type)
    assert t.schema_at() == t.schema_at(2)


def test_update_unknown_column_raises(spark, tmp_path):
    t = _three_file_table(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown columns"):
        t.update({"nope": "1"}, [("k", ">=", 0)])


def test_restore_is_metadata_only_rollback(spark, tmp_path):
    t = _three_file_table(spark, tmp_path)
    files_v1 = set(t.snapshot_files(1))
    t.delete([("k", ">=", 0)])  # v3: empty table
    assert t.read().count() == 0
    v = t.restore(1)
    assert v == 4
    assert sorted(r.k for r in t.read().collect()) == list(range(10)) + list(
        range(100, 110)
    )
    # restored snapshot references the ORIGINAL files — nothing rewritten
    assert set(t.snapshot_files()) == files_v1
    # and the rolled-back state is still itself time-travelable
    assert t.read(version=3).count() == 0


def test_restore_after_vacuum_raises(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, [(1, "a")]))
    t.commit(_kv(spark, [(2, "b")]), mode="overwrite")
    t.vacuum(keep_from_version=1, retain_ms=0)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        t.restore(0)
    # nothing was published by the failed restore
    assert t.latest_version() == 1


def test_check_constraint_blocks_bad_commit(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, [(1, "a")]))
    t.add_constraint("k_positive", "k > 0")
    assert t.constraints() == {"k_positive": "k > 0"}
    v_before = t.latest_version()
    with pytest.raises(ConstraintViolation, match="k_positive"):
        t.commit(_kv(spark, [(5, "ok"), (-1, "bad")]))
    assert t.latest_version() == v_before  # violating commit left no trace
    t.commit(_kv(spark, [(7, "ok")]))  # passing rows still land
    assert t.read().count() == 2


def test_check_constraint_null_passes(spark, tmp_path):
    """SQL-standard CHECK: NULL is not FALSE, so null rows pass."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, [(1, "a")]))
    t.add_constraint("k_positive", "k > 0")
    t.commit(_kv(spark, [(None, "null-key")]))
    assert t.read().count() == 2


def test_add_constraint_validates_existing_data(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, [(-3, "bad")]))
    with pytest.raises(ConstraintViolation):
        t.add_constraint("k_positive", "k > 0")
    assert t.constraints() == {}


def test_drop_constraint(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, [(1, "a")]))
    t.add_constraint("k_positive", "k > 0")
    t.drop_constraint("k_positive")
    t.commit(_kv(spark, [(-1, "now fine")]))
    assert t.read().count() == 2
    with pytest.raises(KeyError):
        t.drop_constraint("never_existed")


def test_constraint_survives_checkpoint_and_clean_log(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, [(1, "a")]))
    t.add_constraint("k_positive", "k > 0")
    t.commit(_kv(spark, [(2, "b")]))
    cp = t.checkpoint()
    t.clean_log(keep_from_version=cp)
    fresh = TxTable(spark, str(tmp_path / "t"))  # no cached state
    assert fresh.constraints() == {"k_positive": "k > 0"}
    with pytest.raises(ConstraintViolation):
        fresh.commit(_kv(spark, [(-1, "bad")]))


def test_replace_where_swaps_region_atomically(spark, tmp_path):
    t = _three_file_table(spark, tmp_path)
    fresh = _kv(spark, [(100, "NEW100"), (101, "NEW101")])
    v = t.replace_where(fresh, [("k", ">=", 100), ("k", "<=", 199)])
    assert v == 3
    rows = {r.k: r.v for r in t.read().collect()}
    # region replaced: 10 old rows out, 2 new in; other regions untouched
    assert rows[100] == "NEW100" and 105 not in rows
    assert rows[0] == "a0" and rows[200] == "c200"
    assert len(rows) == 22


def test_replace_where_rejects_out_of_region_rows(spark, tmp_path):
    t = _three_file_table(spark, tmp_path)
    v_before = t.latest_version()
    stray = _kv(spark, [(100, "in"), (5, "OUT of region")])
    with pytest.raises(ValueError, match="outside the predicate region"):
        t.replace_where(stray, [("k", ">=", 100), ("k", "<=", 199)])
    assert t.latest_version() == v_before


def test_merge_txn_is_idempotent(spark, tmp_path):
    """A replayed micro-batch MERGE (same txn id) must be a no-op —
    the exactly-once contract for foreachBatch upsert sinks."""
    t = _three_file_table(spark, tmp_path)
    delta = _kv(spark, [(0, "UPSERTED"), (999, "INSERTED")])
    v1 = t.merge(delta, key=["k"], txn="app.batch-7")
    v2 = t.merge(delta, key=["k"], txn="app.batch-7")  # replay
    assert v1 == v2
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows[0] == "UPSERTED" and rows[999] == "INSERTED"
    assert len(rows) == 31  # 30 original + 1 insert, NOT duplicated


# -- MERGE clause refinements ---------------------------------------------


def _kv3(spark, lo, hi, mul=10):
    import pyspark.sql.functions as F

    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * mul).alias("v")
    )


def test_merge_update_set_subset(spark, tmp_path):
    """WHEN MATCHED THEN UPDATE SET of one column, referencing both
    sides of the join — unmatched target columns keep their values."""
    from novlake_spark.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv3(spark, 0, 20))
    t.merge(
        _kv3(spark, 5, 10, mul=1),
        key=["k"],
        update_set={"v": "t.v + s.v"},  # additive update, not replacement
    )
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows[7] == 7 * 10 + 7  # updated
    assert rows[3] == 30  # untouched


def test_merge_matched_condition(spark, tmp_path):
    """WHEN MATCHED AND <cond>: rows failing the condition keep target
    values even though their key matched."""
    from novlake_spark.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv3(spark, 0, 10))
    t.merge(
        _kv3(spark, 0, 10, mul=1),
        key=["k"],
        matched_condition="t.v > 50",  # only rows with big target v
        insert_unmatched=False,
    )
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows[8] == 8  # fired: replaced by source row
    assert rows[3] == 30  # condition false: untouched


def test_merge_conditional_delete(spark, tmp_path):
    from novlake_spark.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv3(spark, 0, 10))
    t.merge(
        _kv3(spark, 0, 10, mul=1),
        key=["k"],
        delete_matched=True,
        matched_condition="s.v >= 5",
        insert_unmatched=False,
    )
    assert sorted(r.k for r in t.read().collect()) == [0, 1, 2, 3, 4]


def test_merge_no_insert_clause(spark, tmp_path):
    from novlake_spark.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv3(spark, 0, 5))
    t.merge(_kv3(spark, 3, 8, mul=1), key=["k"], insert_unmatched=False)
    rows = {r.k: r.v for r in t.read().collect()}
    assert set(rows) == {0, 1, 2, 3, 4}  # 5..7 NOT inserted
    assert rows[3] == 3 and rows[4] == 4  # matched rows replaced


def test_merge_duplicate_source_keys_rejected(spark, tmp_path):
    import pytest

    from novlake_spark.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv3(spark, 0, 5))
    dup = _kv3(spark, 1, 3).unionAll(_kv3(spark, 2, 4))
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge(dup, key=["k"], update_set={"v": "s.v"})


def test_merge_clause_txn_idempotent(spark, tmp_path):
    from novlake_spark.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv3(spark, 0, 10))
    t.merge(_kv3(spark, 0, 5, mul=2), key=["k"], update_set={"v": "s.v"}, txn="m1")
    state = sorted((r.k, r.v) for r in t.read().collect())
    t.merge(_kv3(spark, 0, 5, mul=2), key=["k"], update_set={"v": "s.v"}, txn="m1")
    assert sorted((r.k, r.v) for r in t.read().collect()) == state


def test_merge_schema_evolution(spark, tmp_path):
    """evolve_schema=True: source-only columns evolve the table schema;
    pre-existing rows surface them as null."""
    import pyspark.sql.functions as F
    import pytest

    from novlake_spark.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv3(spark, 0, 10))
    src = _kv3(spark, 5, 15).withColumn("tag", F.lit("new"))
    with pytest.raises(Exception):  # refused without the flag
        t.merge(src, key=["k"])
    t.merge(src, key=["k"], evolve_schema=True)
    rows = {r.k: (r.v, r.tag) for r in t.read().collect()}
    assert set(rows) == set(range(15))
    assert rows[2] == (20, None)  # untouched row: evolved column is null
    assert rows[7] == (70, "new")  # replaced by source row
    assert "tag" in t.schema_at().fieldNames()

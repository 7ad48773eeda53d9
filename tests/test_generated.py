"""Generated columns (Delta's GENERATED ALWAYS AS) on the transaction
log — computed when absent, validated when present, one enforcement
path shared with CHECK constraints."""

import pytest

from novlake_spark.txlog import ConstraintViolation, TxTable


def _df(spark, *rows):
    return spark.createDataFrame(list(rows), "qty long, unit long")


def test_computed_when_absent(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.set_generated("total", "qty * unit")
    t.commit(_df(spark, (2, 10), (3, 5)))
    rows = {r.qty: r.total for r in t.read().collect()}
    assert rows == {2: 20, 3: 15}
    assert t.generated_columns() == {"total": "qty * unit"}
    # stats exist for the computed column → it prunes like any other
    assert all("total" in a["stats"] for a in t.snapshot_adds())


def test_validated_when_present(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.set_generated("total", "qty * unit")
    ok = spark.createDataFrame([(2, 10, 20)], "qty long, unit long, total long")
    t.commit(ok)
    bad = spark.createDataFrame([(2, 10, 999)], "qty long, unit long, total long")
    with pytest.raises(ConstraintViolation, match="total"):
        t.commit(bad)
    assert t.read().count() == 1  # the bad commit landed nothing


def test_existing_rows_guard_and_drop(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, (1, 1)))
    with pytest.raises(ValueError, match="backfill"):
        t.set_generated("total", "qty * unit")  # column absent, rows exist
    # declaring over an EXISTING valid column works (validates snapshot)
    t2 = TxTable(spark, str(tmp_path / "t2"))
    t2.commit(spark.createDataFrame([(2, 3, 6)], "qty long, unit long, total long"))
    t2.set_generated("total", "qty * unit")
    t2.commit(_df(spark, (4, 4)))  # computed for the new rows
    assert {r.total for r in t2.read().collect()} == {6, 16}
    t2.drop_generated("total")
    assert t2.generated_columns() == {}
    free = spark.createDataFrame([(1, 1, 42)], "qty long, unit long, total long")
    t2.commit(free)  # no longer validated
    assert 42 in {r.total for r in t2.read().collect()}


def test_generated_conflicts_with_identity(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.set_identity("id")
    with pytest.raises(ValueError, match="identity"):
        t.set_generated("id", "qty * 2")

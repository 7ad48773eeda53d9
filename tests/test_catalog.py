"""File-backed table catalog (novlake_spark.catalog): persistent
name→table registry with atomic updates, attach-to-session views, and
snapshot-pinned loads of transaction-logged tables."""

import pyspark.sql.functions as F
import pytest

from novlake_spark.catalog import Catalog
from novlake_spark.lake import Lake
from novlake_spark.txlog import TxTable


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_register_persists_across_instances(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "orders"))
    t.commit(_kv(spark, 0, 30))
    _kv(spark, 0, 10).write.parquet(str(tmp_path / "dim"))
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.register("orders", t.path)
    cat.register("dim", str(tmp_path / "dim"), fmt="parquet")
    # a brand-new instance (≈ new session) sees both entries
    cat2 = Catalog(spark, str(tmp_path / "cat"))
    assert set(cat2.tables()) == {"orders", "dim"}
    assert cat2.load("orders").count() == 30
    assert cat2.load("dim").count() == 10


def test_register_conflicts_and_replace(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.register("t", "/a")
    with pytest.raises(ValueError, match="already registered"):
        cat.register("t", "/b")
    cat.register("t", "/b", replace=True)
    assert cat.tables()["t"]["path"] == "/b"
    cat.drop("t")
    assert cat.tables() == {}


def test_attach_enables_sql_over_named_tables(spark, tmp_path):
    lake = Lake(spark)
    t = TxTable(spark, str(tmp_path / "facts"))
    t.commit(_kv(spark, 0, 50))
    _kv(spark, 0, 5).write.parquet(str(tmp_path / "small"))
    cat = lake.catalog(str(tmp_path / "cat"))
    cat.register("facts", t.path)
    cat.register("small", str(tmp_path / "small"), fmt="parquet")
    attached = cat.attach()
    assert sorted(attached) == ["facts", "small"]
    got = lake.query(
        "SELECT count(*) AS n FROM facts JOIN small USING (k)"
    ).collect()[0]
    assert got.n == 5


def test_load_pins_txlog_snapshots(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(_kv(spark, 0, 10))
    t.commit(_kv(spark, 10, 25))
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.register("t", t.path)
    assert cat.load("t", version=0).count() == 10
    with pytest.raises(ValueError, match="time travel"):
        cat.register("p", str(tmp_path / "t" / "data"), fmt="parquet")
        cat.load("p", version=0)


def test_concurrent_registrations_all_land(spark, tmp_path):
    """The retrying atomic-replace means racing registrations never
    lose each other's entries."""
    import threading

    cat = Catalog(spark, str(tmp_path / "cat"))
    errors = []

    def worker(i):
        try:
            Catalog(spark, str(tmp_path / "cat")).register(f"t{i}", f"/p{i}")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert set(cat.tables()) == {f"t{i}" for i in range(6)}

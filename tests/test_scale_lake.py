"""Scale-oriented lake utilities: bucketed co-located joins (no
exchange) and small-file compaction."""

import glob
import os

import pyspark.sql.functions as F

from novlake_spark.lake import Lake
from novlake_spark.plans import explain_str


def test_bucketed_join_has_no_exchange(spark, sf_small, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        lake = Lake(spark)
        lake.attach_dir(sf_small, ["orders", "lineitem"])
        o = lake.query("SELECT o_orderkey, o_totalprice FROM orders")
        li = lake.query("SELECT l_orderkey, l_quantity FROM lineitem")
        lake.save_bucketed(o, "orders_b", "o_orderkey", 8, sort_by="o_orderkey")
        lake.save_bucketed(li, "lineitem_b", "l_orderkey", 8, sort_by="l_orderkey")
        joined = spark.table("orders_b").join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = explain_str(joined, "simple")
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_compact_reduces_file_count(spark, sf_small, tmp_path):
    lake = Lake(spark)
    lake.attach_dir(sf_small, ["lineitem"])
    path = str(tmp_path / "li_many")
    # simulate a small-file mess: 64 files
    lake.query("SELECT * FROM lineitem").repartition(64).write.parquet(path)
    before = len(glob.glob(os.path.join(path, "*.parquet")))
    assert before == 64
    n_rows = spark.read.parquet(path).count()
    new_files = lake.compact(path, target_file_mb=128)
    after = len(glob.glob(os.path.join(path, "*.parquet")))
    assert after == new_files < before
    assert spark.read.parquet(path).count() == n_rows


def test_clustered_write_roundtrip(spark, sf_small, tmp_path):
    lake = Lake(spark)
    lake.attach_dir(sf_small, ["lineitem"])
    li = lake.query("SELECT * FROM lineitem")
    path = str(tmp_path / "li_clustered")
    out = lake.replace_table(li.repartition(4), "li_c", path, cluster_by=["l_shipdate"])
    assert out.count() == li.count()
    # within each parquet file rows are shipdate-ordered (tight row-group stats)
    files = [f for f in glob.glob(os.path.join(path, "*.parquet"))]
    import pyarrow.parquet as pq

    for f in files[:2]:
        col = pq.read_table(f, columns=["l_shipdate"]).column(0).to_pylist()
        assert col == sorted(col)


def test_null_ordering_controls(spark):
    df = spark.createDataFrame([(1, 5.0), (2, None), (3, 1.0)], "id long, v double")
    last = [r.id for r in df.orderBy(F.col("v").asc_nulls_last()).collect()]
    first = [r.id for r in df.orderBy(F.col("v").asc_nulls_first()).collect()]
    assert last == [3, 1, 2]
    assert first == [2, 3, 1]


def test_conditional_null_functions(spark):
    df = spark.createDataFrame([(1.0, 0.0), (float("nan"), 2.0)], "a double, b double")
    out = df.select(
        F.coalesce(F.nullif("b", F.lit(0.0)), F.lit(-1.0)).alias("nz"),
        F.isnan("a").alias("nan"),
        F.nvl(F.nullif("b", F.lit(2.0)), F.lit(9.0)).alias("nvl"),
    ).collect()
    assert out[0].nz == -1.0 and out[0].nan is False and out[0].nvl == 0.0
    assert out[1].nz == 2.0 and out[1].nan is True and out[1].nvl == 9.0


def test_analyze_feeds_catalog_statistics(spark, sf_small):
    """lake.analyze records table rowCount/bytes and per-column
    NDV/min/max in the catalog — the inputs CBO join reordering reads.
    Values are asserted against ground truth, not just presence."""
    lake = Lake(spark)
    lake.attach_dir(sf_small, ["nation"])
    n = lake.query("SELECT * FROM nation")
    spark.sql("DROP TABLE IF EXISTS nation_t")
    import shutil as _sh, os as _os
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    _sh.rmtree(_os.path.join(wh, "nation_t"), ignore_errors=True)
    n.write.mode("overwrite").saveAsTable("nation_t")

    stats = lake.analyze("nation_t", columns=["n_nationkey", "n_regionkey"])
    truth = n.count()
    assert stats["rows"] == truth
    assert stats["bytes"] > 0
    key = stats["columns"]["n_nationkey"]
    assert int(key["distinct_count"]) == truth  # PK: NDV == rowCount
    assert int(key["min"]) == 0 and int(key["max"]) == truth - 1
    assert int(stats["columns"]["n_regionkey"]["distinct_count"]) <= 5

    # With CBO on, the catalog relation carries rowCount into plan
    # statistics (join-reorder's input); without it only sizeInBytes
    # (from files) flows. The conf is what a production cluster sets.
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        plan = spark.table("nation_t")._jdf.queryExecution().optimizedPlan()
        assert plan.stats().rowCount().isDefined()
        assert int(str(plan.stats().rowCount().get())) == truth
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")

"""Runtime bloom-filter join pruning (§8.1 backlog #3): a selective
filter on one join side injects a bloom-filter aggregate that pre-filters
the other side's scan — rows that can't join never leave the scan stage.
Thresholds are production-scale by default; lowered here to observe the
mechanism on fixture data."""

import pyspark.sql.functions as F

from novlake_spark.plans import explain_str
from novlake_spark.sources.tables import load_table


def test_bloom_filter_join_pruning_fires(spark, sf_small):
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_small, "lineitem")
        orders = load_table(spark, sf_small, "orders").filter(F.col("o_totalprice") > 400000)
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select("l_orderkey", "l_quantity")
        plan = explain_str(joined, "formatted").lower()
        assert "bloomfilter" in plan or "bloom_filter" in plan, plan[:1500]
        # and it must not change results
        expected = li.join(orders.hint("broadcast"), li.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == expected
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# -- ANALYZE retrofit -----------------------------------------------------


def test_analyze_retrofits_bloom_on_existing_table(spark, tmp_path):
    """A table committed WITHOUT bloom filters gains them via analyze()
    — point-lookup pruning starts working with zero data rewritten."""
    import os

    import pyspark.sql.functions as F

    from novlake_spark.txlog import TxTable, file_matches

    t = TxTable(spark, str(tmp_path / "t"))
    evens = spark.range(50).select((F.col("id") * 2).alias("k"))
    t.commit(evens.coalesce(1))
    assert not any(a.get("bloom") for a in t.snapshot_adds())
    files_before = sorted(os.listdir(str(tmp_path / "t" / "data")))
    t.analyze(bloom_cols=["k"])
    assert sorted(os.listdir(str(tmp_path / "t" / "data"))) == files_before
    adds = t.snapshot_adds()
    assert all("k" in (a.get("bloom") or {}) for a in adds)
    # odd in-range value: only bloom can prune it
    assert not any(file_matches(a, [("k", "=", 51)]) for a in adds)
    assert any(file_matches(a, [("k", "=", 50)]) for a in adds)
    # idempotent: nothing left to do → no new version
    v = t.latest_version()
    assert t.analyze(bloom_cols=["k"]) == v


def test_analyze_adds_stats_to_statless_files(spark, tmp_path):
    """Files whose add actions carry no stats at all (external/legacy
    writer shape) get min/max retrofitted and become range-prunable."""
    import pyspark.sql.functions as F

    from novlake_spark.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.range(1000).select(F.col("id").alias("k")),
        collect_stats=False,
    )
    assert all("stats" not in a for a in t.snapshot_adds())
    plan = t.scan_plan([("k", ">=", 990)])
    assert plan["scanned"] == plan["total"]  # nothing prunable yet
    t.analyze()
    plan = t.scan_plan([("k", ">=", 990)])
    assert plan["scanned"] < plan["total"]
    assert t.read(where=[("k", ">=", 990)]).count() == 10

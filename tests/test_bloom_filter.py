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

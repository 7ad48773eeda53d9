"""Dynamic partition pruning: joining a partitioned fact against a
filtered dimension must prune fact partitions at runtime — at 100 TB
this is the difference between scanning 3 partitions and 25."""

import pyspark.sql.functions as F

from novlake_spark.plans import explain_str
from novlake_spark.sources.tables import load_table


def test_dynamic_partition_pruning_fires(spark, sf_small, tmp_path):
    # fact partitioned by nation key
    cust = load_table(spark, sf_small, "customer")
    fact_path = str(tmp_path / "cust_part")
    cust.write.partitionBy("c_nationkey").parquet(fact_path)
    fact = spark.read.parquet(fact_path)

    dim = load_table(spark, sf_small, "nation").filter(F.col("n_name") < "E")  # few nations
    joined = fact.join(dim, fact.c_nationkey == dim.n_nationkey).select("c_custkey", "n_name")

    plan = explain_str(joined, "formatted")
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    expected = (
        cust.join(dim, cust.c_nationkey == dim.n_nationkey).count()
    )
    assert joined.count() == expected

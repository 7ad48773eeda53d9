"""§2 I5 map functions and H5 unionByName — API rows exercised as unit
smoke (no map-typed or schema-divergent fixture columns exist)."""

import pyspark.sql.functions as F


def test_map_functions(spark):
    df = spark.range(3).select(
        F.create_map(F.lit("id"), F.col("id"), F.lit("sq"), F.col("id") * F.col("id")).alias("m")
    )
    out = df.select(
        F.map_keys("m").alias("ks"),
        F.map_values("m").alias("vs"),
        F.element_at("m", "sq").alias("sq"),
    ).collect()
    assert out[2].ks == ["id", "sq"]
    assert out[2].vs == [2, 4]
    assert out[2].sq == 4


def test_map_from_entries_roundtrip(spark):
    df = spark.range(2).select(
        F.map_from_entries(F.array(F.struct(F.lit("k").alias("key"), F.col("id").alias("value")))).alias("m")
    )
    back = df.select(F.to_json("m").alias("j")).collect()
    assert back[1].j == '{"k":1}'


def test_union_by_name_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id long, a string")
    b = spark.createDataFrame([(2, 9.5)], "id long, b double")
    out = a.unionByName(b, allowMissingColumns=True).orderBy("id").collect()
    assert out[0].a == "x" and out[0].b is None
    assert out[1].a is None and out[1].b == 9.5


def test_approx_percentile_within_5pct_of_exact(spark, sf_small):
    """E13 accuracy pin: GK sketch (accuracy=1000) must land within 5%
    of the exact per-group median at fixture scale."""
    from novlake_spark.sources.tables import load_table

    li = load_table(spark, sf_small, "lineitem")
    rows = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
    ).collect()
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) <= 0.05 * abs(r.exact), r

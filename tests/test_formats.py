"""Source/sink format coverage beyond Parquet/CSV/JSON: ORC, text, and
struct-typed columns round-trip through the Lake surface."""

import pyspark.sql.functions as F

from novlake_spark.lake import Lake


def test_orc_roundtrip(spark, sf_small, tmp_path):
    lake = Lake(spark)
    lake.attach_dir(sf_small, ["nation"])
    df = lake.query("SELECT n_nationkey, n_name FROM nation")
    out = lake.replace_table(df, "nation_orc", str(tmp_path / "n_orc"), fmt="orc")
    assert out.count() == 25
    assert dict(out.dtypes)["n_name"] == "string"


def test_text_source(spark, tmp_path):
    p = str(tmp_path / "lines")
    spark.createDataFrame([("alpha",), ("beta gamma",)], "value string").write.text(p)
    back = spark.read.text(p)
    assert {r.value for r in back.collect()} == {"alpha", "beta gamma"}


def test_struct_column_ops(spark, sf_small):
    from novlake_spark.sources.tables import load_table

    orders = load_table(spark, sf_small, "orders")
    df = orders.select(
        F.struct("o_orderkey", "o_totalprice").alias("s"),
    ).select(
        F.col("s.o_orderkey").alias("k"),
        F.col("s").getField("o_totalprice").alias("p"),
        F.to_json("s").alias("j"),
    )
    row = df.orderBy("k").first()
    assert row.k == 0 and row.j.startswith('{"o_orderkey":0')


def test_struct_parquet_roundtrip(spark, tmp_path):
    df = spark.range(4).select(
        F.col("id"),
        F.struct(F.col("id").alias("a"), (F.col("id") * 2).alias("b")).alias("nested"),
    )
    p = str(tmp_path / "nested")
    df.write.parquet(p)
    back = spark.read.parquet(p).select("id", "nested.a", "nested.b")
    assert back.filter(F.col("b") == F.col("a") * 2).count() == 4

"""Relational workload on the lakehouse: the TPC-H fixtures loaded into
transaction-logged tables (ingest-time clustered), named through the
catalog, queried via the SQL surface — results must equal the same SQL
over the raw parquet. Proves the whole stack composes: txlog read path
× catalog views × Spark SQL × the query inventory's semantics."""

import pyspark.sql.functions as F

from novlake_spark.lake import Lake
from novlake_spark.sources.tables import load_table
from novlake_spark.txlog import TxTable

_Q5ISH = """
SELECT n_name,
       sum(l_extendedprice * (1 - l_discount)) AS revenue,
       count(*) AS n
FROM {li} li
JOIN {o} o   ON li.l_orderkey = o.o_orderkey
JOIN {c} c   ON o.o_custkey = c.c_custkey
JOIN {n} n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= timestamp '1994-01-01'
GROUP BY n_name
ORDER BY n_name
"""


def test_tpch_shape_over_txlog_tables(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    lake = Lake(spark)
    cat = lake.catalog(str(tmp_path / "cat"))
    for name, cluster in [
        ("lineitem", "l_orderkey"),
        ("orders", "o_orderkey"),
        ("customer", "c_custkey"),
        ("nation", "n_nationkey"),
    ]:
        df = load_table(spark, sf, name)
        t = TxTable(spark, str(tmp_path / name))
        t.commit(df, cluster_by=[cluster], target_files=4)
        cat.register(name, t.path)
    cat.attach()
    got = spark.sql(
        _Q5ISH.format(li="lineitem", o="orders", c="customer", n="nation")
    ).collect()
    # same SQL over the raw parquet
    for name in ["lineitem", "orders", "customer", "nation"]:
        load_table(spark, sf, name).createOrReplaceTempView(f"raw_{name}")
    want = spark.sql(
        _Q5ISH.format(li="raw_lineitem", o="raw_orders", c="raw_customer", n="raw_nation")
    ).collect()
    assert [(r.n_name, round(r.revenue, 4), r.n) for r in got] == [
        (r.n_name, round(r.revenue, 4), r.n) for r in want
    ]
    # the clustered layout actually prunes on the cluster key
    li = TxTable(spark, str(tmp_path / "lineitem"))
    kmax = load_table(spark, sf, "lineitem").agg(F.max("l_orderkey")).collect()[0][0]
    plan = li.scan_plan([("l_orderkey", ">=", int(kmax * 0.9))])
    assert plan["scanned"] < plan["total"]

"""§2.C — projection, predicates, CASE WHEN, DISTINCT (+ A2 preview,
§2.G top-k).

These shapes are where Catalyst's pushdown matters most: every filter
below reaches the Parquet scan as ``PushedFilters`` (row-group stat
skipping) and every projection prunes ``ReadSchema`` to the referenced
columns — asserted in tests/test_plans.py. At 100 TB that is the
difference between scanning terabytes and scanning the few columns ×
row-groups the query touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from novlake_spark.operators.numerics import grid
from novlake_spark.registry import register
from novlake_spark.sources.tables import load_table


@register(
    "q_project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS revenue,
           floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100 AS charge,
           CAST(l_quantity AS INT) AS qty
    FROM lineitem
    """,
)
def q_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/C6: projection with computed columns, aliases, and a cast.

    Per-row money rounding uses floor(x*100+0.5)/100 instead of
    round(x,2): products of 2-dp decimals land exactly on half-cents,
    where Spark (HALF_UP) and DuckDB (HALF_EVEN) disagree; the floor
    form evaluates bit-identically on both engines (SURVEY.md §2.I3).
    """
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = revenue * (1 + F.col("l_tax"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(revenue * 100 + F.lit(0.5)) / 100).alias("revenue"),
        (F.floor(charge * 100 + F.lit(0.5)) / 100).alias("charge"),
        F.col("l_quantity").cast("int").alias("qty"),
    )


@register(
    "q_filter_bool",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, round(l_discount, 2) AS disc
    FROM lineitem
    WHERE (l_returnflag = 'R' AND l_discount > 0.05)
       OR (l_quantity < 5 AND NOT l_linestatus = 'F')
    """,
)
def q_filter_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: conjunction/disjunction/negation predicates."""
    li = load_table(spark, sf_dir, "lineitem")
    pred = ((F.col("l_returnflag") == "R") & (F.col("l_discount") > 0.05)) | (
        (F.col("l_quantity") < 5) & (~(F.col("l_linestatus") == "F"))
    )
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_returnflag", F.round("l_discount", 2).alias("disc")
    )


@register(
    "q_filter_in_between_like",
    oracle="""
    SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 50000 AND 150000
      AND o_orderstatus LIKE 'F%'
      AND o_orderdate IS NOT NULL
    """,
)
def q_filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: IN / BETWEEN / LIKE / IS [NOT] NULL predicates."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(50000, 150000)
        & F.col("o_orderstatus").like("F%")
        & F.col("o_orderdate").isNotNull()
    ).select("o_orderkey", "o_orderpriority", F.round("o_totalprice", 2).alias("total"))


@register(
    "q_case_when",
    oracle="""
    SELECT o_orderstatus,
           CASE WHEN o_totalprice > 250000 THEN 'big'
                WHEN o_totalprice > 120000 THEN 'mid'
                ELSE 'small' END AS bucket,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total
    FROM orders
    GROUP BY o_orderstatus, bucket
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: CASE WHEN bucketing feeding an aggregation. Exactness: the
    money total is an order-free BIGINT cents sum with one presentation
    division (round-10 float-class phase 2, ORACLE_NOTES.md #4)."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") > 250000, "big")
        .when(F.col("o_totalprice") > 120000, "mid")
        .otherwise("small")
    )
    return (
        orders.withColumn("bucket", bucket)
        .groupBy("o_orderstatus", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(grid(F.col("o_totalprice"), 100)).cast("long") / F.lit(100.0)).alias(
                "total"
            ),
        )
    )


@register(
    "q_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: DISTINCT projection — plans as a keys-only hash aggregate, so
    map-side partial dedup bounds the shuffle at O(distinct values)."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: global top-k. Spark plans TakeOrderedAndProject: each task
    keeps a k-element heap, the driver merges — no global sort ever
    materializes, which is why ORDER BY + LIMIT is safe at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@register(
    "q_util_preview",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 2) AS total
    FROM orders ORDER BY o_orderkey LIMIT 10
    """,
)
def q_util_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: Lake.preview — LIMIT-n peek, made deterministic with an ORDER
    BY on the unique key so both engines agree on which rows."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy("o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_orderstatus", F.round("o_totalprice", 2).alias("total"))
    )

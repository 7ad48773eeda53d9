"""§2.H — set operations.

UNION ALL is a zero-shuffle concatenation of partitions; the
distinct-flavored ops (UNION/INTERSECT/EXCEPT) each cost one hash
shuffle on the full row — at scale prefer keyed semi/anti joins when
only a key column matters, which is exactly how Spark plans INTERSECT
(left semi) and EXCEPT (left anti) internally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from novlake_spark.registry import register
from novlake_spark.sources.tables import load_table


@register(
    "q_set_union_all",
    oracle="""
    SELECT c_custkey AS key, 'cust' AS src FROM customer
    UNION ALL
    SELECT s_suppkey AS key, 'supp' AS src FROM supplier
    """,
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1: UNION ALL — bag union, duplicates preserved."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_custkey").alias("key"), F.lit("cust").alias("src")).unionAll(
        supplier.select(F.col("s_suppkey").alias("key"), F.lit("supp").alias("src"))
    )


@register(
    "q_set_union",
    oracle="""
    SELECT c_custkey AS key FROM customer
    UNION
    SELECT s_suppkey AS key FROM supplier
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2: UNION with distinct semantics."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_custkey").alias("key"))
        .union(supplier.select(F.col("s_suppkey").alias("key")))
        .distinct()
    )


@register(
    "q_set_intersect",
    oracle="""
    SELECT c_custkey AS key FROM customer
    INTERSECT
    SELECT o_custkey AS key FROM orders WHERE o_totalprice > 400000
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: INTERSECT (distinct) — customers that placed a big order."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.select(F.col("c_custkey").alias("key")).intersect(
        orders.filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("key"))
    )


@register(
    "q_set_except",
    oracle="""
    SELECT c_custkey AS key FROM customer
    EXCEPT
    SELECT o_custkey AS key FROM orders WHERE o_totalprice > 400000
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: EXCEPT (distinct) — customers with no big order."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.select(F.col("c_custkey").alias("key")).subtract(
        orders.filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("key"))
    )

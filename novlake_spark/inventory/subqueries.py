"""Subqueries, CTEs, and PIVOT (§2 A1 SQL surface depth).

These keys exercise Catalyst's subquery machinery — scalar subqueries
become joins against broadcast single-row plans, IN/EXISTS predicates
rewrite to semi joins (``RewritePredicateSubquery``), and correlated
scalar subqueries decorrelate into aggregated left joins
(``RewriteCorrelatedScalarSubquery``) — i.e. the textual SQL a novlake
user would ship to Athena runs natively and still plans as distributed
joins, never nested loops. Where dialects agree, one SQL string drives
both engines (the Lake.query path, A1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from novlake_spark.operators.numerics import avg_cents_sql, cents_sql
from novlake_spark.registry import register
from novlake_spark.sources.tables import load_table


def _sql(spark: SparkSession, sf_dir: str, text: str, tables: list[str]) -> DataFrame:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(text)


_SCALAR_SQL = f"""
    SELECT o_orderkey, {cents_sql("o_totalprice")} AS total
    FROM orders
    WHERE o_totalprice > CAST(1.8 AS DOUBLE) *
          (SELECT {avg_cents_sql("o_totalprice")} FROM orders)
"""


@register("q_subquery_scalar", oracle=_SCALAR_SQL)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery — planned as a broadcast of the
    1-row aggregate into the scan's filter, so the big side is read
    once with the threshold folded in."""
    return _sql(spark, sf_dir, _SCALAR_SQL, ["orders"])


_IN_SQL = """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
"""


@register("q_subquery_in", oracle=_IN_SQL)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery — Catalyst rewrites to a left-semi hash join
    (verifiably the same plan family as q_join_semi)."""
    return _sql(spark, sf_dir, _IN_SQL, ["customer", "orders"])


_CORR_SQL = f"""
    SELECT o.o_orderkey, o.o_custkey, {cents_sql("o.o_totalprice")} AS total
    FROM orders o
    WHERE o.o_totalprice > CAST(1.5 AS DOUBLE) *
          (SELECT {avg_cents_sql("o2.o_totalprice")}
           FROM orders o2
           WHERE o2.o_custkey = o.o_custkey)
"""


@register("q_subquery_correlated", oracle=_CORR_SQL)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — decorrelated into a per-key
    aggregate joined back (one shuffle by custkey), not a re-executed
    inner query per outer row."""
    return _sql(spark, sf_dir, _CORR_SQL, ["orders"])


_CTE_SQL = """
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS spend_cents,
             count(*) AS n_orders
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, spend_cents, n_orders,
             rank() OVER (ORDER BY spend_cents DESC, o_custkey) AS rnk
      FROM spend
    )
    SELECT CAST(r.rnk AS BIGINT) AS rnk, r.o_custkey, c.c_name,
           spend_cents / CAST(100 AS DOUBLE) AS spend, r.n_orders
    FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
    WHERE r.rnk <= 25
"""


@register("q_cte", oracle=_CTE_SQL)
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH/CTE pipeline: aggregate → window rank → dimension join."""
    return _sql(spark, sf_dir, _CTE_SQL, ["orders", "customer"])


@register(
    "q_pivot",
    oracle="""
    SELECT l_linestatus,
           round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END), 2) AS A,
           round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0 END), 2) AS N,
           round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END), 2) AS R
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: returnflag values become columns. Explicit value list =
    single-pass plan (no extra distinct-values job) — required practice
    at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .na.fill(0.0)
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT o_orderkey, metric, round(val, 2) AS val
    FROM (
      SELECT o_orderkey, 'total' AS metric, o_totalprice AS val FROM orders
      UNION ALL
      SELECT o_orderkey, 'key100' AS metric, CAST(o_custkey * 100 AS DOUBLE) AS val FROM orders
    )
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide columns → (metric, value) rows via
    DataFrame.unpivot — a zero-shuffle Expand, the inverse of q_pivot."""
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("total"),
        (F.col("o_custkey") * 100).cast("double").alias("key100"),
    )
    return wide.unpivot("o_orderkey", ["total", "key100"], "metric", "_v").select(
        "o_orderkey", "metric", F.round("_v", 2).alias("val")
    )

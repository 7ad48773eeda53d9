"""§2.F — window functions.

A window spec costs one shuffle by partition key + one sort per
distinct (partitionBy, orderBy) pair; Spark reuses the exchange across
functions sharing a spec, so each query below bundles several functions
over one spec where semantics allow. All orderings are made *total*
with a unique tie-break key (SURVEY.md §5.3) — the single biggest
source of cross-engine hash mismatches.

Scale note: partition keys here (user_id, nation, custkey) have
bounded per-key row counts, so no single task sees unbounded state. A
global (un-partitioned) window would serialize on one task — none is
used outside the tiny-dimension F8 case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from novlake_spark.operators.numerics import grid
from novlake_spark.registry import register
from novlake_spark.sources.tables import load_table


@register(
    "q_win_row_number",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders
    """,
)
def q_win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: row_number over a total per-customer recency order."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return orders.select("o_custkey", "o_orderkey", F.row_number().over(w).cast("long").alias("rn"))


@register(
    "q_win_rank",
    oracle="""
    SELECT c_nationkey, c_custkey,
           rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
    FROM customer
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: rank/dense_rank — tie-tolerant (equal acctbals share a rank,
    so the output is deterministic without a tie-break column)."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return customer.select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "q_win_ntile",
    oracle="""
    SELECT c_custkey,
           ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: ntile quartiles — order made total (acctbal, custkey) because
    ntile assigns by row position, where ties would be ambiguous."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return customer.select("c_custkey", F.ntile(4).over(w).cast("long").alias("quartile"))


@register(
    "q_win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           round(value, 2) AS value,
           round(coalesce(lag(value)  OVER w, 0), 2) AS prev_value,
           round(coalesce(lead(value) OVER w, 0), 2) AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: lag/lead over each user's event timeline."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        F.round(F.coalesce(F.lag("value").over(w), F.lit(0.0)), 2).alias("prev_value"),
        F.round(F.coalesce(F.lead("value").over(w), F.lit(0.0)), 2).alias("next_value"),
    )


@register(
    "q_win_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
               / (CAST(100 AS DOUBLE) *
                  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS mov_avg
    FROM orders
    """,
)
def q_win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: 3-row moving average over each customer's order history.

    Exactness (round-10 float phase 2, the skew-safe twin's cents
    pattern): the frame sums per-row integer cents (order-free BIGINT)
    and divides ONCE by the frame's exact row count — no ``round()`` on
    a float window aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    cents = grid(F.col("o_totalprice"), 100)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(cents).over(w).cast("long")
            / (F.lit(100.0) * F.count(F.lit(1)).over(w))
        ).alias("mov_avg"),
    )


@register(
    "q_win_cumsum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               / CAST(100 AS DOUBLE) AS cum_spend
    FROM orders
    """,
)
def q_win_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: running total (unbounded-preceding frame).

    ROWS (not the default RANGE) frame: with RANGE, ties would share a
    cumulative value and engines could disagree on float accumulation
    order; ROWS over a total order fixes both. Exactness (round-10
    float phase 2): the running sum accumulates integer cents — every
    prefix is BIGINT-exact, so no intermediate float ordering exists to
    disagree about — and the dollar presentation is one division.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(grid(F.col("o_totalprice"), 100)).over(w).cast("long") / F.lit(100.0)).alias(
            "cum_spend"
        ),
    )


@register(
    "q_win_range_frame",
    oracle="""
    SELECT user_id, event_id,
           count(*) OVER (PARTITION BY user_id
                          ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour
    FROM events
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: RANGE frame over epoch seconds — events per user in the
    trailing hour. RANGE frames are value-based, so equal timestamps
    share a frame and no tie-break is needed for determinism.

    Oracle uses floor(epoch(ts)): DuckDB's double→BIGINT cast *rounds*
    fractional seconds while Spark's unix_timestamp truncates, shifting
    frame boundaries by one second for half the rows (found at sf0.1).
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return events.select("user_id", "event_id", F.count(F.lit(1)).over(w).alias("n_last_hour"))


@register(
    "q_win_first_last",
    oracle="""
    SELECT DISTINCT c_nationkey,
           round(first_value(c_acctbal) OVER w, 2) AS first_bal,
           round(last_value(c_acctbal)  OVER w, 2) AS last_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: first_value/last_value with an explicit full frame (the
    default frame ends at CURRENT ROW, which silently turns last_value
    into 'current value' — the classic footgun, avoided identically on
    both engines)."""
    customer = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return customer.select(
        "c_nationkey",
        F.round(F.first("c_acctbal").over(w), 2).alias("first_bal"),
        F.round(F.last("c_acctbal").over(w), 2).alias("last_bal"),
    ).distinct()


@register(
    "q_win_nth_value",
    oracle="""
    SELECT DISTINCT c_nationkey,
           nth_value(c_custkey, 2) OVER w AS second_cust,
           nth_value(c_custkey, 3) OVER w AS third_cust
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: nth_value over an explicit full frame (same footgun note as
    first/last: the default frame would truncate at CURRENT ROW)."""
    customer = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return customer.select(
        "c_nationkey",
        F.nth_value("c_custkey", 2).over(w).alias("second_cust"),
        F.nth_value("c_custkey", 3).over(w).alias("third_cust"),
    ).distinct()


@register(
    "q_win_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_orderstatus, o_orderkey, round(o_totalprice, 2) AS total,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: top-k per group via row_number<=k — the distributed top-k
    idiom (each group's heap stays on its own task; no global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.select(
            "o_orderstatus",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_win_percent_rank",
    oracle="""
    SELECT c_nationkey, c_custkey,
           floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pct_rank,
           floor(cume_dist()    OVER w * 1000000 + 0.5) / 1000000 AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
    """,
)
def q_win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: percent_rank / cume_dist (tie-stable like rank).

    Rounded via floor(x·1e6+0.5)/1e6, not round(): these are exact
    rationals (k/group_size) that land on .5 micro-boundaries where
    HALF_UP (Spark) and HALF_EVEN (DuckDB) disagree — found at sf0.1.
    """
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
    return customer.select(
        "c_nationkey",
        "c_custkey",
        (F.floor(F.percent_rank().over(w) * 1000000 + F.lit(0.5)) / 1000000).alias("pct_rank"),
        (F.floor(F.cume_dist().over(w) * 1000000 + F.lit(0.5)) / 1000000).alias("cume"),
    )

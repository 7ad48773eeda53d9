"""TPC-H-adapted analytics suite over the fixture star schema.

The fixture tables are TPC-H-shaped but trimmed (no partsupp; no
l_shipmode/l_commitdate/l_receiptdate, o_comment/o_shippriority,
c_address/c_phone, p_mfgr/p_container), so each query keeps the
*plan shape* of its TPC-H counterpart — the join graph, aggregation
pattern, and subquery structure that exercise the optimizer — with
predicates adapted to the columns that exist. Round 7 completes the
named 22-query suite: q_tpch_q1/q_tpch_q3 are the full originals
(trimmed early stand-ins remain as q_agg_groupby / q_join_star — the
new keys carry the complete measure sets, not duplicates). The
partsupp-centric queries
(Q2/Q11/Q20) proxy the part↔supplier relation through lineitem
(supply cost := min unit price ever charged; availqty := shipped
quantity), and the shipmode/receipt-commit queries (Q12/Q21) proxy
"late" as l_shipdate > o_orderdate + 45 days and "mode" as
l_returnflag — every subquery/join/agg pattern of the full 22-query
suite is exercised.

Scale notes: every dimension side (region/nation/customer/supplier/
part, and derived scalar aggregates) is broadcast-eligible; the fact
joins shuffle on their keys; AQE handles the rest. All money aggregates
round to 2 dp and ratios to 4 dp per the oracle-parity rules
(SURVEY.md §5.3). Quantity comparisons against ``0.2*avg(qty)`` are
float-safe because l_quantity values are integral doubles (exact sums
in IEEE754, any summation order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from novlake_spark.operators.numerics import avg_cents_sql, grid
from novlake_spark.registry import register
from novlake_spark.sources.tables import load_table


def _ts(s: str) -> Column:
    return F.lit(s).cast("timestamp")


def _rev() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _money_sum(expr: Column) -> Column:
    """Order-independent, engine-exact 2-dp money sum.

    Money expressions here (price 2dp × discount-complement 2dp, etc.)
    are exact multiples of 1e-4, so ``round(expr*10000)`` recovers the
    exact integer regardless of per-row float error, the BIGINT sum is
    associative (no float summation-order drift between engines or
    partitionings), and the final cents rounding is computed as
    ``floor((s+50)/100)/100`` — a formula with no representable-value
    ambiguity, unlike round(x, 2) whose HALF_UP/HALF_EVEN behavior
    diverges across engines exactly when the sum lands on a .005
    boundary (observed: a per-customer revenue of …843.595).
    """
    s = F.sum(F.round(expr * 10000).cast("long"))
    return _cents_div(s + F.lit(50), 100) / F.lit(100.0)


def _cents_div(t: Column, d: int) -> Column:
    """Exact floor division of a non-negative BIGINT column by ``d``,
    computed entirely in decimal space. ADVICE r7 (medium): the old
    ``floor((s+50)/100.0)`` cast the BIGINT sum to DOUBLE *before*
    dividing, which rounds once the sum passes 2^53 (~9.0e15) — Q1's
    1e-6-grid charge sums sit there already at sf1, so the two engines'
    formulations could differ by ULPs and flip the floor-to-cents
    boundary at exactly the scale-up this repo advertises. Decimal
    division is exact (the true quotient has ≤ 4 fractional digits,
    far under the result scale Spark assigns), and the DuckDB twin uses
    integer ``//`` — both sides produce the identical integer cents,
    then a single IEEE division by 100.0."""
    return F.floor(t.cast("decimal(38,0)") / F.lit(d)).cast("long")


#: SQL twin of :func:`_money_sum` — keep in lockstep. DuckDB's ``//``
#: on BIGINT is exact integer division (operands are always positive
#: here: money sums of positive prices with discounts < 1).
def _money_sum_sql(expr: str) -> str:
    return (
        "CAST((sum(CAST(round((" + expr + ") * 10000) AS BIGINT)) + 50)"
        " // 100 AS DOUBLE) / 100.0"
    )


_REV_SQL = "l_extendedprice * (1 - l_discount)"


def _money_sum6(expr: Column) -> Column:
    """6-dp-exact money sum for THREE-factor money products (Q1's
    charge = price·(1−disc)·(1+tax) is an exact multiple of 1e-6, so
    the 4-dp grid of :func:`_money_sum` would round it onto .5
    boundaries): scale by 1e6 — price ≤ ~1e5 × 1e6 ≪ 2^53, so round()
    recovers the exact integer — sum as BIGINT, then the same
    boundary-free floor-to-cents (integer-exact via :func:`_cents_div`
    — the 1e-6-grid sums pass 2^53 at sf1, so a DOUBLE cast before the
    division is NOT safe here; ADVICE r7)."""
    s = F.sum(F.round(expr * 1000000).cast("long"))
    return _cents_div(s + F.lit(5000), 10000) / F.lit(100.0)


def _money_sum6_sql(expr: str) -> str:
    return (
        "CAST((sum(CAST(round((" + expr + ") * 1000000) AS BIGINT)) + 5000)"
        " // 10000 AS DOUBLE) / 100.0"
    )


@register(
    "q_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           {_money_sum_sql("l_extendedprice")} AS sum_base_price,
           {_money_sum_sql(_REV_SQL)} AS sum_disc_price,
           {_money_sum6_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_price,
           CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: the pricing summary report — THE TPC-H scan-heavy
    aggregation (the trimmed shape shipped round 1 as q_agg_groupby;
    this is the full nine-measure original over the fixture's complete
    l_tax column). Float discipline: every sum goes through an exact
    integer grid (quantities are integral doubles → BIGINT; 2-factor
    money on the 1e-4 grid via _money_sum; the 3-factor charge on the
    1e-6 grid via _money_sum6 — its 4-dp rounding WOULD land on .5
    boundaries), and the averages are single IEEE divisions of
    identical integers on both engines, so every output bit matches
    with no round() anywhere. Plan: one scan, the filter pushed to
    parquet, map-side partial agg into a 4-group exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    qty = F.sum(F.col("l_quantity").cast("long"))
    price_cents = F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
    disc_cents = F.sum(F.round(F.col("l_discount") * 100).cast("long"))
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= _ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            qty.alias("sum_qty"),
            _money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _money_sum(_rev()).alias("sum_disc_price"),
            _money_sum6(charge).alias("sum_charge"),
            (qty.cast("double") / n).alias("avg_qty"),
            (price_cents.cast("double") / F.lit(100.0) / n).alias("avg_price"),
            (disc_cents.cast("double") / F.lit(100.0) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey, {_money_sum_sql(_REV_SQL)} AS revenue, o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: shipping-priority top-10 — the unstarted-revenue ranking
    (the trimmed 3-way star shipped round 1 as q_join_star; this is
    the original's segment-filtered top-k with the fixture's
    c_mktsegment). The customer side broadcast-hints (segment filter
    bounds it); the top-10 is orderBy+limit → TakeOrderedAndProject
    (distributed heap, no global sort materialization), with
    (o_orderdate, l_orderkey) breaking revenue ties so the LIMIT
    boundary is deterministic on both engines — revenue itself is the
    bit-identical floor-formula double."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1998-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("1998-03-15")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_money_sum(_rev()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order-priority counts for orders with a late shipment
    (EXISTS → left-semi join; 'late' = shipped >30 days after order)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.filter((F.col("o_orderdate") >= _ts("1996-07-01")) & (F.col("o_orderdate") < _ts("1996-10-01")))
        .join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q_tpch_q5",
    oracle=f"""
    SELECT n_name, {_money_sum_sql(_REV_SQL)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: local-supplier volume — 6-table star join, revenue per nation
    where the customer and line supplier share a nation in ASIA."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter((F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1997-01-01")))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_money_sum(_rev()).alias("revenue"))
    )


@register(
    "q_tpch_q6",
    oracle=f"""
    SELECT {_money_sum_sql("l_extendedprice * l_discount")} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: forecast-revenue-change — pure scan+filter+global agg; the
    whole predicate must reach the Parquet scan as PushedFilters."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(_money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q_tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {_money_sum_sql(_REV_SQL)} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2'))
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: volume shipping between two nations, by direction and year."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_2"))
    )
    return (
        li.filter((F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01")))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_money_sum(_rev()).alias("revenue"))
    )


@register(
    "q_tpch_q8",
    oracle="""
    SELECT year(o_orderdate) AS o_year,
           CAST(sum(CASE WHEN n2.n_name = 'NATION_7'
                         THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)
                         ELSE 0 END) AS DOUBLE)
           / CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
             AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY year(o_orderdate)
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: market share of NATION_7 suppliers in ASIA-customer STANDARD-
    part revenue, per order year (conditional-agg ratio).

    The share is numerator/denominator of 1e-4-grid BIGINT revenue sums
    (round 9 float-class audit): the old ``round(sum(double)/sum(double),
    4)`` carried two order-dependent float sums INTO a rounding
    boundary. Grid sums are order-free; the long→double casts and the
    single division are correctly rounded, hence bit-identical on both
    engines at any magnitude — no final round() to flip."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    rev = _rev()
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter((F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1998-01-01")))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("c_rk") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .join(p.filter(F.col("p_type") == "STANDARD"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_7",
                        grid(rev, 10000),
                    ).otherwise(F.lit(0))
                ).cast("double")
                # grid(), not F.round(): Spark rounds doubles via
                # decimal-string HALF_UP while DuckDB rounds the binary
                # value — per-row round() re-opened exactly the
                # divergence class this key's migration closed
                # (ADVICE r9 medium)
                / F.sum(grid(rev, 10000)).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "q_tpch_q9",
    oracle=f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           {_money_sum_sql(_REV_SQL + " - 0.5 * p_retailprice * l_quantity")} AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type = 'ECONOMY'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: product-type profit by supplier nation and year
    (supply cost proxied as 0.5×retail price — no partsupp table)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(p.filter(F.col("p_type") == "ECONOMY"), F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_money_sum(profit).alias("sum_profit"))
    )


@register(
    "q_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           {_money_sum_sql(_REV_SQL)} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: returned-item reporting — top 20 customers by lost revenue
    in a quarter (rounded revenue is the sort key → ties break on
    c_custkey identically in both engines)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter((F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1996-04-01")))
        .join(li.filter(F.col("l_returnflag") == "R"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_money_sum(_rev()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: customer order-count distribution (left join so 0-order
    customers appear; count(col) skips the nulls they produce)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q_tpch_q14",
    oracle="""
    SELECT CAST(100 AS DOUBLE)
           * CAST(sum(CASE WHEN p_type = 'PROMO'
                           THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)
                           ELSE 0 END) AS DOUBLE)
           / CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
             AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share in one ship month (conditional agg over
    a broadcast part join)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = _rev()
    return (
        li.filter((F.col("l_shipdate") >= _ts("1996-09-01")) & (F.col("l_shipdate") < _ts("1996-10-01")))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            # grid-ratio (the q8 mkt_share pattern): both sums are
            # order-free BIGINTs on the 1e-4 grid; ×100 of the exact
            # numerator stays exact (≪2^53) and ONE division ends it —
            # the old round(raw/raw, 4) carried two order-dependent
            # float sums into a rounding boundary (round-10 phase 3)
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", grid(rev, 10000)).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum(grid(rev, 10000)).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_money_sum_sql(_REV_SQL)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: top supplier by quarterly revenue. The max is taken over
    *rounded* per-supplier revenue so the equality predicate selects the
    same rows in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter((F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1996-04-01")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_money_sum(_rev()).alias("total_revenue"))
    )
    top = revenue.withColumn(
        "_mx", F.max("total_revenue").over(Window.partitionBy(F.lit(1)))
    ).filter(F.col("total_revenue") == F.col("_mx"))
    return (
        s
        .join(top, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 10, 20, 30, 40, 50)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers per part group (lineitem stands in
    for the missing partsupp as the part↔supplier relation)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pf = p.filter((F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 10, 20, 30, 40, 50)))
    return (
        li.join(pf, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_tpch_q17",
    oracle="""
    WITH pa AS (SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_lim
                FROM lineitem GROUP BY l_partkey)
    SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               / CAST(700 AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa   ON pk = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < qty_lim
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: small-quantity-order revenue — correlated avg decorrelated
    into a per-part aggregate join (what Catalyst does to the original
    subquery form).

    Exactness (round-10 float phase 2): qty_lim is already exact —
    avg of integral quantities is an exact sum and one division, then
    one multiply, identical doubles in both engines — and the revenue
    total now sums per-row integer cents (order-free BIGINT) with the
    /7 presentation as ONE division of exact operands."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg((0.2 * F.avg("l_quantity")).alias("qty_lim"))
    return (
        li.join(p.filter(F.col("p_brand") == "Brand#1"), F.col("p_partkey") == F.col("l_partkey"))
        .join(pa, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            (
                F.sum(grid(F.col("l_extendedprice"), 100)).cast("long") / F.lit(700.0)
            ).alias("avg_yearly")
        )
    )


@register(
    "q_tpch_q18",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING sum(l_quantity) > 250
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: large-volume customers — HAVING on an exact integral-double
    sum, top 100 by order value.

    Scale-correct plan: aggregate lineitem by the bare long key FIRST
    (one narrow shuffle of (orderkey, qty) partials), filter to the
    >250 survivors (~1%), and only then join orders/customer — the
    textbook eager-aggregation rewrite; o_orderkey is unique in orders
    so results are identical to the join-first form, but the wide
    customer/order columns never enter a shuffle.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 250)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            F.round("_sq", 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "q_tpch_q19",
    oracle=f"""
    SELECT {_money_sum_sql(_REV_SQL)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: discounted revenue under OR-of-band predicates spanning both
    join sides (join-then-filter; the per-table prefixes still push
    down)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    band = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(band)
        .agg(_money_sum(_rev()).alias("revenue"))
    )


@register(
    "q_tpch_q2",
    oracle="""
    WITH cost AS (
      SELECT l_partkey AS ck_part, l_suppkey AS ck_supp,
             min(l_extendedprice / l_quantity) AS supply_cost
      FROM lineitem
      GROUP BY 1, 2),
    asia_cost AS (
      SELECT ck_part, ck_supp, supply_cost,
             s_acctbal, s_name, n_name
      FROM cost
      JOIN supplier ON ck_supp = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
    FROM part JOIN asia_cost ON ck_part = p_partkey
    WHERE p_size = 15 AND p_type = 'STANDARD'
      AND supply_cost = (SELECT min(supply_cost) FROM asia_cost a2
                         WHERE a2.ck_part = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: minimum-cost supplier per part — the correlated-min
    subquery, decorrelated (as Catalyst would) into a per-part window
    min over a pre-aggregated part↔supplier cost relation. Supply cost
    is proxied as the minimum unit price (l_extendedprice/l_quantity)
    the supplier ever charged for the part; both engines compute the
    identical IEEE-754 quotient per row, and min is order-independent,
    so the equality predicate is engine-exact with no rounding.

    Scale notes: the region filter reduces suppliers BEFORE the
    lineitem aggregate (broadcast semi join below the shuffle), the
    part filter applies before the window, and the (partkey, suppkey)
    aggregate is the only full-fact shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    asia_supp = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(asia_supp.select("s_suppkey"), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost"))
    )
    best = cost.withColumn(
        "_mn", F.min("supply_cost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("supply_cost") == F.col("_mn"))
    pf = p.filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
    return (
        best.join(pf, F.col("l_partkey") == F.col("p_partkey"))
        .join(asia_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q_tpch_q11",
    oracle="""
    WITH v AS (
      SELECT l_partkey AS partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS vcents
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY 1)
    SELECT partkey, vcents / 100.0 AS part_value
    FROM v
    WHERE vcents > 2.0 * (SELECT CAST(sum(vcents) AS DOUBLE) / count(*) FROM v)
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts holding an outsized share of one nation's
    shipped value — group-by-part sums with a HAVING against a scalar
    aggregate of the whole relation (value > 2× the mean per-part
    value; a ratio, unlike TPC-H's SF-scaled constant, stays selective
    at every scale factor). Sums are exact integer cents
    (l_extendedprice is 2 dp), so the BIGINT totals are identical in
    any summation order and the threshold is the same double in both
    engines.

    Scale notes: the nation filter is a broadcast semi join below the
    per-part shuffle; the global total is a second agg over the
    already-reduced per-part rows, re-broadcast as a single-row
    cross join (no second fact scan).
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    nat_supp = (
        s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_3")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    v = (
        li.join(nat_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("vcents"))
    )
    total = v.agg((F.sum("vcents").cast("double") / F.count(F.lit(1))).alias("_mean"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("vcents") > 2.0 * F.col("_mean"))
        .select("partkey", (F.col("vcents") / 100.0).alias("part_value"))
    )


@register(
    "q_tpch_q12",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('A', 'R')
      AND l_shipdate > o_orderdate + INTERVAL 45 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: priority split of late shipments by class — the
    join + dual conditional-count pattern, with l_returnflag standing
    in for l_shipmode and ship > order + 45 days for receipt > commit."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            F.col("l_returnflag").isin("A", "R")
            & (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q_tpch_q20",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey AS pk, l_suppkey AS sk, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
      GROUP BY 1, 2)
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
      AND s_suppkey IN (
        SELECT sk FROM shipped
        WHERE qty > 0.3 * (SELECT sum(qty) FROM shipped s2 WHERE s2.pk = shipped.pk))
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers dominating supply of a part family — the
    nested IN-subquery chain (part-name filter → per-(part,supplier)
    aggregate → correlated share threshold → supplier IN-list).
    "Dominates" := shipped > 30% of the part's year volume, replacing
    the availqty comparison (no partsupp table). Quantity sums are
    integral doubles, hence exact in both engines.

    Scale notes: the part-name filter is a broadcast semi join below
    the only fact shuffle; the correlated total decorrelates into a
    window sum over the per-(part,supplier) aggregate (second shuffle
    touches reduced data only); the final supplier probe is a
    broadcast semi join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    wanted = p.filter(F.col("p_name").like("large%")).select("p_partkey")
    shipped = (
        li.filter((F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01")))
        .join(wanted, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.sum("l_quantity").alias("qty"))
    )
    dominant = (
        shipped.withColumn("_tot", F.sum("qty").over(Window.partitionBy("pk")))
        .filter(F.col("qty") > 0.3 * F.col("_tot"))
        .select("sk")
        .distinct()
    )
    return (
        s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_5")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(dominant, F.col("s_suppkey") == F.col("sk"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "q_tpch_q21",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_1'
      AND l1.l_shipdate > o_orderdate + INTERVAL 45 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 45 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the sole late shipper on a
    multi-supplier finished order — EXISTS (another supplier on the
    order) + NOT EXISTS (another LATE supplier on the order), late
    proxied as ship > order + 45 days.

    Scale notes: the late set is computed once from the
    orders(F)⋈lineitem join and reused for both the outer rows and the
    NOT-EXISTS probe; both the EXISTS and NOT-EXISTS become hash
    left-semi / left-anti joins on l_orderkey with the suppkey
    inequality as a residual filter.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    late = (
        li.join(o.filter(F.col("o_orderstatus") == "F"), F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    nat_supp = s.join(
        F.broadcast(n.filter(F.col("n_name") == "NATION_1")), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    l1 = late.join(nat_supp, F.col("l_suppkey") == F.col("s_suppkey"))
    other = li.select(F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2"))
    other_late = late.select(F.col("l_orderkey").alias("_ok3"), F.col("l_suppkey").alias("_sk3"))
    return (
        l1.join(
            other,
            (F.col("_ok2") == F.col("l_orderkey")) & (F.col("_sk2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("_ok3") == F.col("l_orderkey")) & (F.col("_sk3") != F.col("l_suppkey")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "q_tpch_q22",
    oracle=f"""
    SELECT n_name, count(*) AS numcust, {_money_sum_sql("c_acctbal")} AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT {avg_cents_sql("c_acctbal")}
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: rich inactive customers per nation — scalar-subquery
    threshold + anti join (country code proxied by nation name)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    # exact threshold: cents sum / (100·n), one division of exact
    # operands — a raw avg(double) is order-of-summation-dependent and
    # a customer whose balance ties the threshold could flip engines
    # (round-10 phase-3 audit: float-aggregate THRESHOLDS)
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(grid(F.col("c_acctbal"), 100)).cast("long")
            / (F.lit(100.0) * F.count(F.lit(1)))
        ).alias("_avg")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("numcust"), _money_sum(F.col("c_acctbal")).alias("totacctbal"))
    )

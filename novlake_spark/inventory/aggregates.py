"""§2.E — aggregations.

Every query here compiles to Spark's two-phase hash aggregation
(partial ``HashAggregate`` → ``Exchange hashpartitioning(keys)`` →
final ``HashAggregate``), i.e. map-side combine happens before the
shuffle, so network volume is O(groups), not O(rows) — the property
that makes these queries scale to 100 TB fact tables. Group-key count
here is tiny (≤ thousands), so the final stage is never the bottleneck;
for high-cardinality keys AQE coalesces/splits post-shuffle partitions.

Oracle-parity rules applied throughout (SURVEY.md §5.3): every computed
column aliased identically in Spark and DuckDB; double aggregates
rounded (2 dp money, 4 dp ratios); DuckDB integer ``SUM`` casts its
HUGEINT back to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from novlake_spark.operators.numerics import grid
from novlake_spark.registry import register
from novlake_spark.sources.tables import load_table

# Cutoff mid-way through the fixture date range (1995…2001) so the
# filter is selective but keeps most groups populated.
Q1_CUTOFF = "1998-12-01 00:00:00"


@register(
    "q_agg_groupby",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                       AS sum_qty,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
                                                                 AS sum_base_price,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0
                                                                 AS sum_disc_price,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0
                                                                 AS sum_charge,
           sum(l_quantity) / count(*)                            AS avg_qty,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / (100.0 * count(*))
                                                                 AS avg_price,
           CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) / (100.0 * count(*))
                                                                 AS avg_disc,
           count(*)                                              AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: TPC-H Q1-shape pricing summary — filter + group-by + 8 aggregates.

    Flagship query. Physical plan: Parquet scan with the shipdate filter
    pushed to row-group stats (``PushedFilters``) and only the 7 needed
    columns read (``ReadSchema``), then partial/final HashAggregate
    around a 6-group exchange — whole-stage codegen end to end.

    Exactness (round-10 float-class phase 2, ORACLE_NOTES.md #4):
    money values land on an exact integer grid PER ROW — ``grid(x, s)``
    of a deterministic per-row double is identical in both engines —
    so every sum is an order-free BIGINT; the dollar presentation is
    ONE IEEE division of exact operands (correctly rounded, engine-
    identical). ``l_quantity`` is integral-valued, so its double sum is
    exact in any order and needs no grid; avgs are single divisions of
    exact numerators/denominators. No ``round()`` survives anywhere.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    price_cents = F.sum(grid(F.col("l_extendedprice"), 100)).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            (price_cents / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(grid(disc_price, 10000)).cast("long") / F.lit(10000.0)).alias(
                "sum_disc_price"
            ),
            (F.sum(grid(charge, 10000)).cast("long") / F.lit(10000.0)).alias(
                "sum_charge"
            ),
            (F.sum("l_quantity") / n).alias("avg_qty"),
            (price_cents / (F.lit(100.0) * n)).alias("avg_price"),
            (
                F.sum(grid(F.col("l_discount"), 100)).cast("long") / (F.lit(100.0) * n)
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_agg_global",
    oracle="""
    SELECT count(*)                              AS n_rows,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
                                                 AS total_price,
           CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) / (100.0 * count(*))
                                                 AS avg_disc,
           min(l_quantity)                       AS min_qty,
           max(l_quantity)                       AS max_qty,
           CAST(sum(l_orderkey) AS BIGINT)       AS key_sum
    FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: global aggregation (no grouping keys) — single-row result.

    Partial aggregation happens per input split; only one tiny row per
    task crosses the network, so this is scan-bound at any scale.
    Exactness: money/ratio sums ride the per-row integer grid (order-
    free BIGINT), presentation is one IEEE division; min/max are
    order-free on identical doubles and need no rounding at all
    (round-10 float-class phase 2, ORACLE_NOTES.md #4).
    """
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(grid(F.col("l_extendedprice"), 100)).cast("long") / F.lit(100.0)).alias(
            "total_price"
        ),
        (
            F.sum(grid(F.col("l_discount"), 100)).cast("long") / (F.lit(100.0) * n)
        ).alias("avg_disc"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.sum("l_orderkey").alias("key_sum"),
    )


@register(
    "q_agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey)  AS distinct_parts,
           count(DISTINCT l_suppkey)  AS distinct_supps,
           count(*)                   AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: exact COUNT(DISTINCT) per group.

    Spark expands multi-distinct into an ``Expand`` + two-level
    aggregate — still fully parallel; the distinct keys are shuffled by
    (group, value) so no single node sees all values.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register("q_agg_approx_distinct", weak=True)  # WEAK oracle: HLL estimates differ per engine
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: approximate count-distinct (HyperLogLog++).

    The 100 TB path for cardinality estimation: fixed-size sketches merge
    associatively, so the exchange carries O(groups × sketch), never the
    values. Driver records a rows-only check (estimates are
    engine-specific); the unit test pins the estimate within 5% of exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
    )


@register("q_agg_approx_percentile", weak=True)  # approx: sketch-dependent values
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13: approximate percentiles (Greenwald-Khanna sketch).

    The 100 TB quantile path: ``approx_percentile`` keeps a fixed-size
    GK sketch per group that merges associatively across partitions, so
    the exchange carries O(groups × sketch) regardless of row count —
    unlike exact ``percentile`` (E12) which must see all values per
    group. Accuracy 1000 → ~0.1% rank error. Rows-only driver check
    (sketch estimates are engine-specific); the unit test pins the
    estimate against the exact percentile at fixture scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile_approx("l_extendedprice", 0.5, 1000), 2).alias("approx_p50"),
        F.round(F.percentile_approx("l_extendedprice", 0.95, 1000), 2).alias("approx_p95"),
    )


_GROUPING_SETS_SQL = """
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               / CAST(100 AS DOUBLE) AS sum_price,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("q_agg_grouping_sets", oracle=_GROUPING_SETS_SQL)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: GROUP BY GROUPING SETS — shared ANSI text runs on both engines.

    Spark plans this as a single ``Expand`` (one replica of each row per
    grouping set) feeding one hash aggregate — one shuffle total, not one
    per set. NULL group keys are coalesced to 'ALL' to keep outputs
    null-free (SURVEY.md §5.3).
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "q_agg_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: hierarchical ROLLUP via the DataFrame API."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "sum_qty",
            "n_rows",
        )
    )


@register(
    "q_agg_cube",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7: full CUBE over two low-cardinality dimensions."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "sum_qty",
            "n_rows",
        )
    )


@register(
    "q_agg_having",
    oracle="""
    SELECT o_custkey,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
                    AS total_spend,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) > 30000000
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8: HAVING = post-aggregation filter on the aggregate value.

    Exactness: the HAVING threshold compares the order-free BIGINT
    cents sum, not a raw float sum — a group whose true spend sits at
    the 300 000.00 boundary gets the same in/out verdict from both
    engines by construction (round-10 float-class phase 2)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.sum(grid(F.col("o_totalprice"), 100)).cast("long")
    return (
        orders.groupBy("o_custkey")
        .agg(
            (cents / F.lit(100.0)).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
            cents.alias("_spend_cents"),
        )
        .filter(F.col("_spend_cents") > 30000000)
        .drop("_spend_cents")
    )


@register(
    "q_agg_conditional",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN l_returnflag = 'R'
                         THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                         ELSE 0 END) AS BIGINT) / 100.0 AS returned_price,
           count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_big_discount,
           CAST(sum(CASE WHEN l_quantity >= 25
                         THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) END) AS BIGINT)
               / (100.0 * count(CASE WHEN l_quantity >= 25 THEN 1 END)) AS avg_price_bulk
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9: conditional aggregation — sum/count/avg over predicated subsets
    in one pass (one scan, one shuffle, instead of three queries).

    Exactness: both money aggregates ride the per-row cents grid; the
    conditional avg is one division of an exact conditional-cents sum
    by an exact conditional count (round-10 float-class phase 2)."""
    li = load_table(spark, sf_dir, "lineitem")
    price_cents = grid(F.col("l_extendedprice"), 100)
    bulk = F.col("l_quantity") >= 25
    return li.groupBy("l_linestatus").agg(
        (
            F.sum(F.when(F.col("l_returnflag") == "R", price_cents).otherwise(F.lit(0))).cast("long")
            / F.lit(100.0)
        ).alias("returned_price"),
        F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias("n_big_discount"),
        (
            F.sum(F.when(bulk, price_cents)).cast("long")
            / (F.lit(100.0) * F.count(F.when(bulk, F.lit(1))))
        ).alias("avg_price_bulk"),
    )


@register(
    "q_agg_stats",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sq,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS DOUBLE) AS sqq,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS sp,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                      * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) AS spp
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           sqrt((sqq - (sq * sq) / n) / (n - 1)) AS sd_qty,
           sqrt((sqq - (sq * sq) / n) / n)       AS sdp_qty,
           ((spp - (sp * sp) / n) / (n - 1)) / 10000.0 AS var_price,
           ((spp - (sp * sp) / n) / n) / 10000.0       AS varp_price
    FROM m
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10: sample/population stddev & variance — merge-able moments,
    computed in the exact sum-of-squares form rather than engine-native
    `stddev_samp`/`var_samp` (round-11 phase-4 migration: the built-in
    moment aggregates fold raw doubles in engine-specific order — the
    q_profile_table avg class wearing a different aggregate, invisible
    to the phase-3 checker because no `sum(`/`avg(` appears; the old
    `round(,4)` presentation only masked it to ~5e-5).

    Exactness recipe (ORACLE_NOTES #6 extended): every SUM is an exact
    integer — quantities as BIGINTs, prices on the cents grid, squares
    summed in DECIMAL(38)/HUGEINT because Σ(cents²) passes 2^63 at
    sf0.1 — then each sum is cast once to DOUBLE (correctly-rounded
    cast of the identical integer on both engines, bit-identical even
    past 2^53) and the variance formula runs as the IDENTICAL
    correctly-rounded IEEE op tree (`- * / sqrt` only, written in
    lockstep here and in the oracle). Variance presents in price² via
    one extra division by 10⁴. Same one-pass, constant-state-per-group
    scaling as the built-ins — the partials are plain integer sums."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    p = grid(F.col("l_extendedprice"), 100)
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("sq"),
        F.sum(q * q).cast("double").alias("sqq"),
        F.sum(p).cast("double").alias("sp"),
        F.sum((p * p).cast("decimal(38,0)")).cast("double").alias("spp"),
    )
    n, sq, sqq, sp, spp = (F.col(c) for c in ("n", "sq", "sqq", "sp", "spp"))
    return m.select(
        "l_returnflag",
        F.sqrt((sqq - (sq * sq) / n) / (n - F.lit(1.0))).alias("sd_qty"),
        F.sqrt((sqq - (sq * sq) / n) / n).alias("sdp_qty"),
        (((spp - (sp * sp) / n) / (n - F.lit(1.0))) / F.lit(10000.0)).alias("var_price"),
        (((spp - (sp * sp) / n) / n) / F.lit(10000.0)).alias("varp_price"),
    )


@register(
    "q_agg_corr",
    oracle="""
    WITH m AS (
      SELECT l_linestatus,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sq,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS DOUBLE) AS sqq,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS sp,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                      * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) AS spp,
             CAST(sum(CAST(l_quantity AS BIGINT)
                      * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) AS sqp,
             CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS sd,
             CAST(sum(CAST(l_quantity AS BIGINT)
                      * CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) AS sqd,
             CAST(sum(CAST(floor(l_tax * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS st,
             CAST(sum(CAST(l_quantity AS BIGINT)
                      * CAST(floor(l_tax * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) AS sqt
      FROM lineitem GROUP BY l_linestatus
    )
    SELECT l_linestatus,
           (n * sqp - sq * sp)
             / (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)) AS qty_price_corr,
           ((sqd - (sq * sd) / n) / (n - 1)) / 100.0 AS qty_disc_covar,
           ((sqt - (sq * st) / n) / n) / 100.0       AS qty_tax_covarp
    FROM m
    """,
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11: correlation / covariance — co-moments in the exact-sums
    form (round-11 phase-4, same rationale as q_agg_stats: the
    engine-native `corr`/`covar_*` fold raw doubles order-dependently
    behind the old `round(,4)` mask). All sums are exact integers on
    per-row grids (quantity BIGINT, price/discount/tax cents;
    Σ(price-cents²) in DECIMAL(38)/HUGEINT), each cast ONCE to double,
    then the classical co-moment formulas run as the identical
    correctly-rounded IEEE tree in both engines. Correlation is
    scale-invariant (the cents grids cancel), covariances present in
    quantity·original-units via one division by 100. One pass,
    integer partials, same scaling as the built-ins."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    p = grid(F.col("l_extendedprice"), 100)
    d = grid(F.col("l_discount"), 100)
    t = grid(F.col("l_tax"), 100)
    m = li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("sq"),
        F.sum(q * q).cast("double").alias("sqq"),
        F.sum(p).cast("double").alias("sp"),
        F.sum((p * p).cast("decimal(38,0)")).cast("double").alias("spp"),
        F.sum(q * p).cast("double").alias("sqp"),
        F.sum(d).cast("double").alias("sd"),
        F.sum(q * d).cast("double").alias("sqd"),
        F.sum(t).cast("double").alias("st"),
        F.sum(q * t).cast("double").alias("sqt"),
    )
    c = F.col
    return m.select(
        "l_linestatus",
        (
            (c("n") * c("sqp") - c("sq") * c("sp"))
            / (
                F.sqrt(c("n") * c("sqq") - c("sq") * c("sq"))
                * F.sqrt(c("n") * c("spp") - c("sp") * c("sp"))
            )
        ).alias("qty_price_corr"),
        (
            ((c("sqd") - (c("sq") * c("sd")) / c("n")) / (c("n") - F.lit(1.0)))
            / F.lit(100.0)
        ).alias("qty_disc_covar"),
        (
            ((c("sqt") - (c("sq") * c("st")) / c("n")) / c("n")) / F.lit(100.0)
        ).alias("qty_tax_covarp"),
    )


@register(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4)  AS median_qty,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12: exact continuous percentiles / median.

    Spark's exact ``percentile`` gathers per-group value multisets — fine
    for bounded groups; at 100 TB with huge groups you'd switch to
    ``approx_percentile`` (t-digest, mergeable constant state), kept as
    the E13 escape hatch.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.5), 4).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", 0.25), 4).alias("p25_price"),
        F.round(F.percentile("l_extendedprice", 0.95), 4).alias("p95_price"),
    )


@register(
    "q_agg_minmax_by",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey, o_totalprice) AS best_order,
           arg_min(o_orderkey, o_totalprice) AS worst_order,
           round(max(o_totalprice), 2) AS best_price
    FROM orders GROUP BY o_custkey
    """,
)
def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E16: min_by/max_by (argmin/argmax) — the key of each customer's
    priciest and cheapest order. Deterministic because (custkey,
    totalprice) is collision-free at every fixture SF (verified); with
    ties you'd order a struct or pre-rank with row_number instead."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("best_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("worst_order"),
        F.round(F.max("o_totalprice"), 2).alias("best_price"),
    )


@register(
    "q_agg_bool",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 0)     AS all_positive,
           bool_or(l_discount > 0.09)   AS any_big_disc,
           CAST(sum(CASE WHEN l_tax > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxy
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E17: boolean aggregates (every/any over predicates)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_big_disc"),
        F.sum(F.when(F.col("l_tax") > 0.05, 1).otherwise(0)).alias("n_taxy"),
    )


@register(
    "q_agg_collect",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations,
           count(*) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E14: collect_list → sorted, stringified for engine-stable hashing.

    collect_list is only safe for bounded groups (25 nations here); the
    sort makes the result deterministic under parallel accumulation.
    """
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
        F.count(F.lit(1)).alias("n_nations"),
    )


@register(
    "q_agg_regr",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) AS DOUBLE) AS nd,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS DOUBLE) AS sxx,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                      * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) AS syy,
             CAST(sum(CAST(l_quantity AS BIGINT)
                      * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ((nd * sxy - sx * sy) / (nd * sxx - sx * sx)) / 100.0 AS slope,
           ((sy - ((nd * sxy - sx * sy) / (nd * sxx - sx * sx)) * sx) / nd)
             / 100.0 AS intercept,
           ((nd * sxy - sx * sy) * (nd * sxy - sx * sy))
             / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)) AS r2
    FROM m
    """,
)
def q_agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E18: linear-regression aggregates — slope/intercept/R² of
    extended price on quantity per return flag, in the exact-sums
    moment form (round-11 phase-4: the built-in `regr_*` family folds
    raw doubles order-dependently, the q_agg_stats class). Sums are
    exact integers (quantity BIGINT, price cents; Σcents² via
    DECIMAL(38)/HUGEINT), one double cast each, then the normal
    equations as the identical correctly-rounded IEEE tree in both
    engines; slope/intercept present in dollars via one division by
    100 (R² is scale-invariant). n is regr_count on the null-free
    fixture (= count(*), pinned by the oracle). The repeated slope
    subexpression in the intercept is written out textually so both
    engines evaluate the same tree — no CSE assumption."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = grid(F.col("l_extendedprice"), 100)
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((y * y).cast("decimal(38,0)")).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    c = F.col
    cov = c("nd") * c("sxy") - c("sx") * c("sy")
    vx = c("nd") * c("sxx") - c("sx") * c("sx")
    vy = c("nd") * c("syy") - c("sy") * c("sy")
    slope_cents = cov / vx
    return m.select(
        "l_returnflag",
        "n",
        (slope_cents / F.lit(100.0)).alias("slope"),
        (((c("sy") - slope_cents * c("sx")) / c("nd")) / F.lit(100.0)).alias(
            "intercept"
        ),
        ((cov * cov) / (vx * vy)).alias("r2"),
    )


@register(
    "q_agg_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY bucket
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E19: fixed-width histogram by floor-binning (portable alternative
    to width_bucket); min/max per bucket double as bin-edge checks.
    Binning is a map-side expression → the histogram is one shuffle of
    ~n_buckets rows."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000.0).alias("bucket")
    return o.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@register(
    "q_agg_string_agg",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           count(*) AS n
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E20: string aggregation (listagg/string_agg/group_concat family).
    Deterministic via explicit element ordering in both engines
    (sort_array before join — DuckDB's ORDER BY inside string_agg).
    Groups are bounded (nations per region), the precondition for any
    collect-to-scalar aggregate at scale."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.join(n, n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register("q_agg_hll_sketch", weak=True)  # WEAK: DataSketches HLL has no DuckDB-equivalent estimate
def q_agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E: mergeable distinct-count sketches (Apache DataSketches HLL,
    Spark 4 hll_sketch_agg / hll_union_agg).

    The point at 100 TB is *re-aggregation without rescanning*: the
    per-segment sketches are built in one pass, and the global row is
    hll_union_agg over those few sketch blobs — a rollup that reads
    bytes, not the fact table. (approx_count_distinct gives one level
    only; sketches compose across partitions, days, and tables.)
    Rows-only check: the estimate is algorithm-defined, not
    SQL-portable."""
    c = load_table(spark, sf_dir, "customer")
    seg = c.groupBy("c_mktsegment").agg(F.hll_sketch_agg("c_custkey").alias("sk"))
    per_seg = seg.select(
        "c_mktsegment", F.hll_sketch_estimate("sk").alias("est_distinct")
    )
    merged = seg.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("__all__").alias("c_mktsegment"),
        F.hll_sketch_estimate("sk").alias("est_distinct"),
    )
    return per_seg.unionAll(merged)


@register(
    "q_agg_mode_freq",
    oracle="""
    WITH c AS (SELECT c_mktsegment, c_nationkey, count(*) AS n
               FROM customer GROUP BY 1, 2),
    r AS (SELECT *, row_number() OVER
               (PARTITION BY c_mktsegment ORDER BY n DESC, c_nationkey) AS rn
          FROM c)
    SELECT c_mktsegment, c_nationkey AS mode_nation, n AS mode_n
    FROM r WHERE rn = 1
    """,
)
def q_agg_mode_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E16: per-group mode with frequency (most common nation per
    segment, ties to the lowest key so the answer is deterministic).
    Two-level aggregate: the (segment, nation) count collapses map-side
    before either shuffle, then a 125-row window picks the argmax — the
    scalable spelling of mode() on grouped data (a naive collect-and-
    count would move raw rows)."""
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    counts = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), F.col("c_nationkey").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").alias("mode_nation"),
            F.col("n").alias("mode_n"),
        )
    )

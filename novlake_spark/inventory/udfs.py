"""§2.K — user-defined function surface (UDF / pandas UDF / UDAF /
grouped-map / mapInPandas / UDTF).

Performance ladder (the docstrings are the scale guidance):
row-at-a-time Python UDF (K1) is the slow path — one Python call per
row, pickled exchange; pandas UDFs (K2/K3) move Arrow record batches
and vectorize 10–100×; applyInPandas/mapInPandas (K4/K5) batch whole
groups/partitions. Every key's logic is also plain-SQL-expressible so
the DuckDB oracle checks the *values*, keeping FULL parity while the
Spark side exercises the Python execution path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf
from pyspark.sql.types import DoubleType, StringType

from novlake_spark.registry import register
from novlake_spark.sources.tables import load_table


@register(
    "q_udf_scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 250000 THEN 'platinum'
                WHEN o_totalprice > 120000 THEN 'gold'
                ELSE 'standard' END AS tier
    FROM orders
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1: row-at-a-time Python UDF (deliberately the slow path; the
    same logic stays SQL-expressible for the oracle)."""

    @udf(returnType=StringType())
    def tier(total: float) -> str:
        if total > 250000:
            return "platinum"
        if total > 120000:
            return "gold"
        return "standard"

    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderkey", tier("o_totalprice").alias("tier"))


@register(
    "q_udf_pandas",
    oracle="""
    SELECT event_id, round(sqrt(value) + ln(1 + value), 6) AS score
    FROM events
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2: vectorized pandas UDF — Arrow batches in, numpy math, Arrow
    out; the acceptable Python hot path at scale."""

    @pandas_udf(DoubleType())
    def score(v: pd.Series) -> pd.Series:
        import numpy as np

        return np.sqrt(v) + np.log1p(v)

    events = load_table(spark, sf_dir, "events")
    return events.select("event_id", F.round(score("value"), 6).alias("score"))


@register(
    "q_udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           avg(l_quantity) AS mean_qty,
           max(l_quantity) - min(l_quantity) AS qty_range
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3: grouped-aggregate pandas UDFs (custom UDAFs) — each group's
    column arrives as one pandas Series; Spark still does partial
    shuffling by key, the Python side only sees final groups.

    Exactness (round-10 float phase 2): ``l_quantity`` is integral-
    valued, so every partial/pandas sum is exact in any order and the
    mean is ONE division — pandas, Spark and DuckDB all produce the
    identical double, no ``round()`` needed. max−min is a single
    subtraction of identical doubles."""

    @pandas_udf(DoubleType())
    def mean_qty(v: pd.Series) -> float:
        # exact: integral values sum exactly; one division
        return float(v.sum() / len(v))

    @pandas_udf(DoubleType())
    def qty_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        mean_qty("l_quantity").alias("mean_qty"),
        qty_range("l_quantity").alias("qty_range"),
    )


@register(
    "q_udf_grouped_map",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) / CAST(100 AS DOUBLE)
             - CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                    OVER (PARTITION BY c_nationkey) AS BIGINT)
               / (CAST(100 AS DOUBLE) * count(*) OVER (PARTITION BY c_nationkey))
             AS centered
    FROM customer
    """,
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4: applyInPandas grouped-map — per-nation mean-centering, the
    canonical 'normalize within group' pattern. Groups must fit in one
    worker's memory (bounded here; at scale pre-aggregate or salt).

    Exactness (round-10 phase-3 audit): pandas' float mean is pairwise-
    summed while the oracle's was Welford-or-sequential — an order-
    dependent pair feeding a rounding boundary. Both sides now center
    on the integer cents grid: exact BIGINT group sum, one division
    each for the value and the mean, one subtraction of identical
    doubles — bit-equal without any round()."""

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.copy()
        cents = np.floor(pdf["c_acctbal"].to_numpy() * 100 + 0.5).astype(np.int64)
        mean = cents.sum() / (100.0 * len(cents))
        pdf["centered"] = cents / 100.0 - mean
        return pdf[["c_custkey", "c_nationkey", "centered"]]

    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_nationkey").applyInPandas(
        center, schema="c_custkey long, c_nationkey int, centered double"
    )


@register(
    "q_udf_mapinpandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS revenue
    FROM lineitem WHERE l_quantity > 45
    """,
)
def q_udf_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5: mapInPandas — streaming per-partition pandas transform with
    filtering (batch iterator in, batch iterator out; constant memory)."""

    def compute(batches):
        import numpy as np

        for pdf in batches:
            out = pdf[pdf["l_quantity"] > 45]
            rev = out["l_extendedprice"] * (1 - out["l_discount"])
            yield pd.DataFrame(
                {
                    "l_orderkey": out["l_orderkey"],
                    "l_linenumber": out["l_linenumber"],
                    "revenue": np.floor(rev * 100 + 0.5) / 100,
                }
            )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    )
    return li.mapInPandas(compute, schema="l_orderkey long, l_linenumber int, revenue double")


@register(
    "q_udtf_split",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
    FROM documents WHERE doc_id < 20
    """,
)
def q_udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6: Python UDTF — one input row expands to one row per token
    (explode expressed as a user-defined table function)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, tok string")
    class SplitTokens:
        def eval(self, doc_id: int, text: str):
            for tok in text.split(" "):
                yield doc_id, tok

    spark.udtf.register("split_tokens", SplitTokens)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT t.doc_id, t.tok FROM documents, LATERAL split_tokens(doc_id, text) t WHERE documents.doc_id < 20"
    )

"""Driver contract for the spark-graft builder (PySpark target).

``entry`` smoke-runs the flagship query at sf0.001; ``queries`` /
``oracle_sql`` re-export the full graded inventory from
novlake_spark.registry (one entry per implemented SURVEY.md §2 row).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import novlake_spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shape pricing summary) on sf0.001."""
    qs = novlake_spark.queries()
    return qs["q_agg_groupby"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return novlake_spark.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every FULL-oracle key."""
    return novlake_spark.oracle_sql()

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

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

# Executor-side importability: cloudpickle serializes the module-level
# functions our mapInPandas/pandas-UDF closures reference BY NAME, so
# Python workers must be able to `import novlake_spark` too. Workers
# inherit the JVM's environment, not the driver's sys.path — exporting
# PYTHONPATH here (BEFORE any SparkSession exists, since the grader
# imports this module first when launched from an arbitrary cwd) makes
# the contract hold regardless of where the driver process started.
if _REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

import novlake_spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shape pricing summary) on sf0.001."""
    qs = novlake_spark.queries()
    return qs["q_agg_groupby"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Session-hygiene contract (ADVICE r11): several operators register
    tracked lazy persists at intra-query reuse points (graph iteration
    frames, LM scan reuse, results cached below presentation sorts).
    They are intentionally NOT released by the operator — the caller's
    action decides when the cache has served its purpose. A long-lived
    session that executes many keys should therefore call
    ``novlake_spark.cache.release_tracked()`` after each consumed
    action (bench.py, tools/verify_local.py and tools/plan_audit.py
    all do), or executor storage accumulates one cached frame per
    persisting key for the session's lifetime — harmless under LRU but
    measured as a 55% run-to-run spread once eviction pressure builds.
    """
    return novlake_spark.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every FULL-oracle key."""
    return novlake_spark.oracle_sql()

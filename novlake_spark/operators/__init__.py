"""Reusable distributed operators built from DataFrame primitives.

Each module implements an algorithm the reference's SQL engine (or the
LLM-pipeline extension list) needs but Spark lacks as a single call —
expressed as compositions of built-in operators so Catalyst/AQE still
optimize them, never as driver-side loops.
"""

from novlake_spark.operators.asof import asof_join

__all__ = ["asof_join"]

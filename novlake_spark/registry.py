"""Query registry: the bridge between SURVEY.md §2 and __spark_entry__.py.

Every graded operator registers itself here with a key, a Spark callable
``(spark, sf_dir) -> DataFrame``, and (for FULL-oracle rows) the
equivalent DuckDB SQL. ``__spark_entry__.queries()`` / ``oracle_sql()``
simply re-export these dicts.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a graded query under ``key``.

    ``oracle`` is the DuckDB SQL string for FULL-oracle rows; omit it for
    WEAK (rows-only) rows such as approximate/algorithm-dependent ops.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in _QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        _QUERIES[key] = fn
        if oracle is not None:
            _ORACLES[key] = oracle
        return fn

    return deco


def _ensure_loaded() -> None:
    # Importing the package registers every query module (side effect).
    import novlake_spark.inventory  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


def describe() -> list[dict[str, Any]]:
    """Inventory view: key, has-oracle, docstring first line."""
    _ensure_loaded()
    out = []
    for key, fn in sorted(_QUERIES.items()):
        doc = (fn.__doc__ or "").strip().splitlines()
        out.append(
            {
                "key": key,
                "oracle": "FULL" if key in _ORACLES else "WEAK",
                "doc": doc[0] if doc else "",
            }
        )
    return out

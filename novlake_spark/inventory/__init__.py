"""Graded query inventory (SURVEY.md §2): importing this package
registers every query key with novlake_spark.registry."""

from novlake_spark.inventory import (  # noqa: F401
    aggregates,
    corpus,
    events,
    functions,
    graphs,
    joins,
    lakehouse,
    llm,
    profiling,
    projection,
    sampling,
    sets,
    subqueries,
    timeseries,
    tpch,
    udfs,
    windows,
)

MODULES = [
    aggregates,
    corpus,
    events,
    functions,
    graphs,
    joins,
    lakehouse,
    llm,
    profiling,
    projection,
    sampling,
    sets,
    subqueries,
    timeseries,
    tpch,
    udfs,
    windows,
]

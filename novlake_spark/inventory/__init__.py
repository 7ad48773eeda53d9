"""Graded query inventory (SURVEY.md §2): importing this package
registers every query key with novlake_spark.registry."""

from novlake_spark.inventory import (  # noqa: F401
    aggregates,
    functions,
    joins,
    projection,
    sets,
    windows,
)

MODULES = [aggregates, functions, joins, projection, sets, windows]

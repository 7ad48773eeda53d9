"""Graded query inventory (SURVEY.md §2): importing this package
registers every query key with novlake_spark.registry."""

from novlake_spark.inventory import aggregates  # noqa: F401

MODULES = [aggregates]

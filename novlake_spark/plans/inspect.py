"""Physical-plan inspection (the ".explain and iterate" loop, mechanized).

Tests use these predicates to pin the *plan shapes* that matter at
100 TB — filter pushdown reaching the Parquet scan, column pruning,
broadcast joins on dimension tables, TakeOrderedAndProject for top-k,
wide whole-stage-codegen spans — so a regression that silently degrades
a plan (e.g. a lost broadcast turning into a 100 TB shuffle) fails CI,
not production.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def has_pushed_filters(df: DataFrame, fragment: str) -> bool:
    """True if the scan reports a pushed-down filter mentioning ``fragment``."""
    plan = explain_str(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line and "[]" not in line.split("PushedFilters")[1][:4]:
            return True
    return False


def pruned_read_schema(df: DataFrame, table_hint: str) -> list[str]:
    """Columns in the Parquet ReadSchema of the scan whose location path
    contains ``table_hint`` — i.e. what the scan will actually read."""
    plan = explain_str(df)
    blocks = plan.split("Location:")
    out: list[str] = []
    for i, block in enumerate(blocks[1:], 1):
        if table_hint in block.splitlines()[0]:
            m = re.search(r"ReadSchema: struct<([^>]*)>", blocks[i])
            if m:
                out = [c.split(":")[0] for c in m.group(1).split(",") if c]
    return out


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df)


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of explicit ``broadcast()`` hints surviving analysis.

    Distinguishes *forced* broadcasts (ResolvedHint in the analyzed
    logical plan — applied regardless of the side's real size) from
    AQE-chosen ones. A query that force-broadcasts a data-dependent
    side (e.g. a per-token vocabulary table) fails at 100 TB even
    though the physical plan at test scale looks identical to the
    AQE-promoted one — so tests pin the hint count, not the join type.
    """
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"ResolvedHint \(strategy=broadcast\)", analyzed))


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen regions (fewer, wider = better fusion).

    Under AQE the codegen stages only exist in the *final* adaptive
    plan, so this executes the query first and parses the ``*(n)``
    markers from the post-execution explain.
    """
    df.collect()
    return len(set(re.findall(r"\*\((\d+)\)", explain_str(df, "simple"))))

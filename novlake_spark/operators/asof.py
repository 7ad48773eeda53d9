"""As-of join (SURVEY.md §2 D10) — the scalable union-window form.

The naive as-of join (`left JOIN right ON key AND r.ts <= l.ts` then
keep the latest right row) explodes to O(|L|·|R|) pairs per key before
the window prunes them — at 100 TB that join is the bottleneck. The
Spark-first formulation used here avoids the join entirely:

1. UNION the two inputs with a side tag (right rows carry the payload,
   left rows carry null payload);
2. one window per key ordered by (ts, tie-break), ``last(payload,
   ignorenulls=True)`` over ROWS UNBOUNDED PRECEDING..CURRENT;
3. keep only left rows — each now annotated with the most recent
   right payload at-or-before its timestamp.

Cost: exactly one shuffle by key and one sort — the same price as a
sort-merge join, with no intermediate blow-up and no skew amplification
(a hot key costs its own row count, not clicks×purchases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: str,
    tie_break: str,
) -> DataFrame:
    """Annotate each ``left`` row with the latest ``right.payload`` whose
    timestamp is <= the left row's, per ``key``.

    Both inputs must share the ``key``/``ts``/``tie_break`` columns;
    ordering ties resolve by ``tie_break`` so results are deterministic.
    Returns the left rows plus a nullable ``asof_{payload}`` column.
    """
    tagged_left = left.withColumn("_is_left", F.lit(True)).withColumn(payload, F.lit(None).cast(dict(right.dtypes)[payload]))
    tagged_right = right.withColumn("_is_left", F.lit(False))
    unioned = tagged_left.unionByName(tagged_right, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col(tie_break).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    annotated = unioned.withColumn(f"asof_{payload}", F.last(payload, ignorenulls=True).over(w))
    return annotated.filter(F.col("_is_left")).drop("_is_left", payload)

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

Round 7 adds the two pandas-``merge_asof`` refinements users actually
reach for: ``direction="forward"`` (earliest right row at-or-after —
the same window with a FOLLOWING frame and ``first`` instead of
``last``) and ``tolerance_micros`` (a match older/newer than the
tolerance is nulled out — the matched row's timestamp rides the same
window as a second annotated column, so the bound costs no extra
shuffle). Both compose: the cost model is unchanged — one shuffle, one
sort, whatever the options.
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
    direction: str = "backward",
    tolerance_micros: int | None = None,
) -> DataFrame:
    """Annotate each ``left`` row with the nearest ``right.payload`` at
    or before (``direction="backward"``) / at or after (``"forward"``)
    its timestamp, per ``key``.

    Both inputs must share the ``key``/``ts``/``tie_break`` columns;
    ordering ties resolve by ``tie_break`` so results are deterministic
    (within one timestamp, rows order by the tie-break REGARDLESS of
    side — both engines of a cross-engine check must state the same
    single-stream formulation). ``tolerance_micros`` nulls the match
    when the timestamp gap exceeds it (``ts`` must be a timestamp
    column; the gap compares in integer microseconds — the repo-wide
    interval discipline). Returns the left rows plus a nullable
    ``asof_{payload}`` column.

    Contract: right-side ``payload`` values must be NON-NULL — the
    payload pick skips nulls (``ignorenulls=True``), so the tolerance
    gap is computed against the same row the payload came from only
    because both picks gate on ``payload IS NOT NULL`` (ADVICE r7: a
    NULL-payload right row nearer than the matched one would otherwise
    make the gap lie, silently nulling or admitting the wrong match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    tagged_left = left.withColumn("_is_left", F.lit(True)).withColumn(
        payload, F.lit(None).cast(dict(right.dtypes)[payload])
    )
    tagged_right = right.withColumn("_is_left", F.lit(False))
    unioned = tagged_left.unionByName(tagged_right, allowMissingColumns=True)

    base = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tie_break).asc())
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731

    out = f"asof_{payload}"
    annotated = unioned.withColumn(out, pick(F.col(payload)).over(w))
    if tolerance_micros is not None:
        right_us = F.when(
            ~F.col("_is_left") & F.col(payload).isNotNull(),
            F.unix_micros(F.col(ts)),
        )
        annotated = annotated.withColumn("_asof_us", pick(right_us).over(w))
        gap = (
            F.unix_micros(F.col(ts)) - F.col("_asof_us")
            if direction == "backward"
            else F.col("_asof_us") - F.unix_micros(F.col(ts))
        )
        annotated = annotated.withColumn(
            out, F.when(gap <= F.lit(int(tolerance_micros)), F.col(out))
        ).drop("_asof_us")
    return annotated.filter(F.col("_is_left")).drop("_is_left", payload)

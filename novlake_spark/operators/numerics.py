"""Cross-engine-exact numeric forms (the ORACLE_NOTES.md #4 discipline).

``round()`` on a float aggregate is the repo's documented flake class:
raw-float sums are order-of-summation-dependent, and even on identical
doubles Spark's decimal-string HALF_UP and DuckDB's binary rounding can
disagree within an ULP of a boundary. The exact alternative lands each
value on an integer grid FIRST — ``floor(x·scale + 0.5)`` of the
deterministic per-row double — so sums are BIGINT (order-free) and any
final division is a single correctly-rounded IEEE op.

This helper exists so the grid expression has ONE spelling: the r9
code review found it hand-rolled in six places, and any drift in one
copy (someone substituting ``F.round``) silently re-opens the flake
class for that key. The SQL twin is the literal
``CAST(floor(x * <scale> + 0.5) AS BIGINT)`` — keep oracles in
lockstep with this form.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def grid(col: Column, scale: int) -> Column:
    """``floor(col·scale + 0.5)`` as BIGINT — the exact integer grid.

    For non-negative inputs this is round-half-up; for negative inputs
    it rounds half toward +inf — fine as a SPEC (both engines compute
    the identical deterministic result), just not symmetric rounding.
    """
    return F.floor(col * scale + F.lit(0.5)).cast("long")


def grid_sql(expr: str, scale: int) -> str:
    """SQL twin of :func:`grid` — keep in lockstep (ONE spelling rule).

    The round-10 phase-3 review found the cents/avg fragments hand-
    copied across six oracles; these helpers make the op-identical
    invariant structural instead of copy-discipline.

    ``expr`` is parenthesized before scaling (ADVICE r10): callers
    today pass bare column refs, but the helper exists precisely so a
    future compound operand like ``a - b`` can't misparse as
    ``a - (b * scale)``."""
    return f"CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)"


def cents_sql(expr: str) -> str:
    """Per-row exact 2-dp presentation: grid to cents, ONE division."""
    return f"{grid_sql(expr, 100)} / CAST(100 AS DOUBLE)"


def avg_cents_sql(expr: str) -> str:
    """Exact mean of a 2-dp money column: order-free BIGINT cents sum,
    ONE division by the exact scaled count."""
    return (
        f"CAST(sum({grid_sql(expr, 100)}) AS BIGINT)"
        f" / (CAST(100 AS DOUBLE) * count(*))"
    )

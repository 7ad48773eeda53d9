"""Deterministic sampling / splitting / corpus-mixing operators.

Training-data pipelines need *reproducible* sampling: the same row must
land in the same sample/split on every run, on every cluster size, and
when the job is re-run months later — `df.sample(seed=…)` cannot
guarantee that (its outcome depends on partitioning), so these
operators derive the decision from a content hash of stable key
columns instead.

Scale properties (the reason this design wins at 100 TB):

- **Shuffle-free**: every decision is a map-side expression over the
  row's own key columns — no repartition, no global pass, no state.
  The filter composes with column pruning (only key columns + selected
  outputs are read) and runs inside whole-stage codegen.
- **Cluster-size invariant**: md5 of the key is the same on 1 executor
  or 1000, unlike partition-index-based `sample`.
- **Composable**: split assignment is a deterministic function, so
  train/val/test are disjoint by construction and any table keyed the
  same way (e.g. labels joined later) lands in the same split.

The hex-prefix trick: md5 yields a uniform hex string; the first two
hex chars are a uniform integer in [0, 256) and hex strings compare
lexicographically in numeric order ('00' < '0a' < '1a' < 'ff'), so
``md5(key)[:2] < format(round(rate*256), '02x')`` samples at ~rate with
8-bit granularity — portable verbatim to any engine with md5
(DuckDB: ``substring(md5(x), 1, 2)``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_key(*cols: Column | str) -> Column:
    """Stable row digest: md5 of '-'-joined key columns (cast to string)."""
    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    return F.md5(F.concat_ws("-", *parts))


def _threshold_hex(rate: float) -> str:
    """Sampling rate → 2-hex-char threshold (8-bit granularity)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    n = round(rate * 256)
    # rate 1.0 → all rows: 'zz' sorts above every 2-char hex string,
    # whereas '100' would compare lexicographically *below* 'ff'.
    return "zz" if n >= 256 else format(n, "02x")


def det_sample(df: DataFrame, keys: list[str], rate: float) -> DataFrame:
    """Deterministic ~rate sample keyed on ``keys`` (map-side filter)."""
    return df.filter(F.substring(hash_key(*keys), 1, 2) < F.lit(_threshold_hex(rate)))


def stratified_sample(df: DataFrame, keys: list[str], strata: str, rates: dict[str, float]) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-rebalancing tool
    (e.g. downsample 'en' to 10%, keep low-resource languages at 100%).

    Strata absent from ``rates`` are dropped (rate 0).
    """
    thr: Column = F.lit("00")
    for value, rate in rates.items():
        thr = F.when(F.col(strata) == value, F.lit(_threshold_hex(rate))).otherwise(thr)
    return df.filter(F.substring(hash_key(*keys), 1, 2) < thr)


def split_assign(keys: list[str], splits: dict[str, float], col_name: str = "split") -> Column:
    """Column assigning each row a named split with the given fractions.

    Fractions must sum to ≤ 1.0; remainder goes to the *last* named
    split. Assignment is a pure function of the key columns → disjoint
    and exhaustive by construction, stable across runs/engines.
    """
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    h = F.substring(hash_key(*keys), 1, 2)
    expr: Column | None = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        cond = h < F.lit(_threshold_hex(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return out.alias(col_name)


def reservoir_per_group(
    df: DataFrame, keys: list[str], group: str, k: int
) -> DataFrame:
    """Deterministic fixed-size sample: exactly min(k, |group|) rows per
    group, chosen by hash rank — the reproducible equivalent of a
    per-group reservoir sample (same rows on any cluster size / rerun,
    which `sample`-then-`limit` cannot guarantee).

    Rate-based :func:`stratified_sample` yields a *proportional* sample;
    this yields a *fixed budget* per group — the shape needed for
    "k exemplar documents per language/source" eval-set construction.

    One shuffle (hash-partition by group); per-group ranking is a sort
    within partitions. Hot groups are the AQE skew-split case, and the
    rank predicate prunes to k rows per group before anything downstream.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group).orderBy(hash_key(*keys), *[F.col(c) for c in keys])
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )

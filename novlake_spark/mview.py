"""Incrementally-maintained aggregate views over transaction-logged
tables: the classic materialized-view delta-maintenance algorithm
(self-maintainable aggregates over insert/delete streams — Gupta &
Mumick's incremental view maintenance framework, applied to a Delta-style
change feed) on Spark.

Why this matters at 100 TB: a dashboard aggregate over a 100 TB fact
table costs a full scan per refresh if recomputed; with a change feed it
costs O(delta). SUM/COUNT (and AVG = SUM/COUNT at read time) are
self-maintainable under inserts AND deletes — each refresh folds the
signed delta into the running state, no rescan of the base table, and
groups whose live row count reaches zero are dropped (not left as
stale zeros).

Exactly-once: each refresh commits with ``txn="src@<version>"`` — the
source high-water mark rides the view's own transaction log (and its
checkpoints), so a crashed/re-run refresh is a no-op instead of
double-counting. The refresh commit itself is stats-scoped like MERGE:
only view files whose group-key range overlaps the delta are rewritten.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from novlake_spark.txlog import TxTable, file_matches, _stat_value

#: Hidden column: live base-row count per group. Needed even when the
#: user only asked for SUMs — it is what detects group death (count==0)
#: and makes AVG derivable. Persisted in the view table.
_N = "__n_rows"


class IncrementalAggView:
    """A grouped-aggregate table maintained incrementally from a
    :class:`TxTable` change feed.

    ``measures`` maps output column name → spec:

    - ``("sum", col)``   running SUM(col)
    - ("count",)         running COUNT(*)
    - ``("avg", col)``   SUM(col) and the hidden row count are stored;
      the AVG is computed at :meth:`read` time (AVG is not
      self-maintainable directly, SUM/COUNT are).

    Example::

        view = IncrementalAggView(orders_tx, path, keys=["o_custkey"],
                                  measures={"spend": ("sum", "o_totalprice"),
                                            "n": ("count",)})
        view.refresh()   # after each batch of source commits
    """

    def __init__(
        self,
        source: TxTable,
        path: str,
        keys: list[str],
        measures: dict[str, tuple],
    ):
        if not keys:
            raise ValueError("at least one group key required")
        for name, spec in measures.items():
            if spec[0] not in ("sum", "count", "avg"):
                raise ValueError(f"{name}: unsupported measure {spec[0]!r}")
        self.source = source
        self.keys = list(keys)
        self.measures = dict(measures)
        self.view = TxTable(source.spark, path)

    # -- watermark ---------------------------------------------------------
    def processed_version(self) -> int:
        """Highest source version folded into the view (-1 = none)."""
        marks = [
            int(t.split("@", 1)[1])
            for t in self.view.txn_versions()
            if t.startswith("src@")
        ]
        return max(marks, default=-1)

    # -- delta computation ---------------------------------------------------
    def _delta(self, from_v: int, to_v: int):
        """Signed per-group delta over source versions (from_v, to_v]."""
        ch = self.source.changes(from_v, to_v)
        w = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
        aggs = [F.sum(w).alias(_N)]
        for name, spec in self.measures.items():
            if spec[0] == "count":
                aggs.append(F.sum(w).alias(name))
            else:  # sum / avg share storage: signed SUM(col)
                aggs.append(F.sum(w * F.col(spec[1])).alias(name))
        return ch.groupBy(*self.keys).agg(*aggs)

    def refresh(self) -> int | None:
        """Fold source commits since the last refresh into the view;
        returns the view version committed (None = already current).
        O(delta + overlapping view files), never a base-table scan.
        """
        last = self.processed_version()
        latest = self.source.latest_version()
        if latest is None or latest <= last:
            return None
        delta = self._delta(last, latest)
        txn = f"src@{latest}"

        view_latest = self.view.latest_version()
        if view_latest is None:
            state = delta.filter(F.col(_N) > 0)
            return self.view.commit(state, mode="append", txn=txn)

        # stats-scope the rewrite: only view files whose leading-key
        # range overlaps the delta's are read and replaced
        base = view_latest
        adds = self.view.snapshot_adds(base)
        k0 = self.keys[0]
        bounds = delta.agg(
            F.min(k0).alias("lo"),
            F.max(k0).alias("hi"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(k0).isNull().cast("int")).alias("nulls"),
        ).collect()[0]
        if bounds["n"] == 0:  # no groups changed at all
            empty = self.view.read(base).limit(0)
            return self.view.commit(empty, mode="append", txn=txn, base_version=base)
        if bounds["nulls"]:
            # null group keys are invisible to min/max stats — a file
            # holding the null group can't be proven untouched, so scope
            # to everything (rare: a null group key is usually a bug)
            touched = list(adds)
        else:
            preds = [
                (k0, ">=", _stat_value(bounds["lo"])),
                (k0, "<=", _stat_value(bounds["hi"])),
            ]
            touched = [a for a in adds if file_matches(a, preds)]
        if touched:
            # via _read_adds so the view table's schema contract (and a
            # hypothetical column mapping on it) is honored
            cur = self.view._read_adds(touched, self.view.schema_at())
        else:
            cur = self.view.read(base).limit(0)
        # combine: full outer on keys, add signed delta to running state.
        # Delta columns are suffixed pre-join so every reference below is
        # by unambiguous name (outer joins on a string key list coalesce
        # the key columns, which makes df[col] references fragile).
        stat_names = [_N, *self.measures]  # matches _delta's column order
        d = delta.select(
            *[F.col(k).alias(f"__dk_{k}") for k in self.keys],
            *[F.col(n).alias(f"__d_{n}") for n in stat_names],
        )
        cond = None
        for k in self.keys:
            c = cur[k].eqNullSafe(F.col(f"__dk_{k}"))
            cond = c if cond is None else cond & c
        combined = (
            cur.join(d, on=cond, how="full_outer")
            .select(
                *[F.coalesce(cur[k], F.col(f"__dk_{k}")).alias(k) for k in self.keys],
                *[
                    (F.coalesce(F.col(n), F.lit(0)) + F.coalesce(F.col(f"__d_{n}"), F.lit(0))).alias(n)
                    for n in stat_names
                ],
            )
            .filter(F.col(_N) > 0)  # group died: drop it
        )
        return self.view.commit(
            combined,
            mode="append",
            remove=[a["file"] for a in touched],
            base_version=base,
            txn=txn,
        )

    # -- read ----------------------------------------------------------------
    def read(self):
        """Current view contents with AVG measures finalized and the
        hidden row-count column dropped."""
        df = self.view.read()
        cols = list(self.keys)
        for name, spec in self.measures.items():
            if spec[0] == "avg":
                cols.append((F.col(name) / F.col(_N)).alias(name))
            else:
                cols.append(F.col(name))
        return df.select(*cols)

"""Arbitrary stateful streaming (SURVEY.md §2 J7).

``applyInPandasWithState`` gives a user-managed per-key state store
inside the micro-batch loop: each trigger delivers the key's new rows
as pandas batches, the handler folds them into explicit state, and
emits whatever rows it wants. This is the escape hatch for operator
semantics that windows/dedup can't express (running aggregates with
custom logic, sessionization with business rules, CDC-style merges).

State scale notes: state lives in the executor state store partitioned
by key (shuffle on the grouping key), so per-key state must stay
bounded — here it is a single (count, total) pair per user. Timeouts
(``GroupStateTimeout``) are how production jobs expire idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("total_value", DoubleType())]
)
_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def running_user_totals_tws(stream: DataFrame) -> DataFrame:
    """Same running totals via Spark 4's ``transformWithStateInPandas``
    — the successor API (SURVEY.md §7.4): explicit typed state handles
    (ValueState/ListState/MapState), timers, and TTL support instead of
    a single opaque state tuple.

    Environment note: this API's state-server protocol needs
    ``google.protobuf`` (absent in this sandbox, no network to install;
    re-checked rounds 3 AND 4 — still absent) plus the RocksDB state
    store provider; the test skips when protobuf is missing and
    ``running_user_totals`` (applyInPandasWithState) remains the
    exercised J7 path — exactly the fallback SURVEY.md §7.4 planned."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType=_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in explicit state;
    emits the updated running totals for each key touched by a batch."""

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]})

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

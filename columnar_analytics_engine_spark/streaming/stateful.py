"""Custom stateful streaming operators via applyInPandasWithState and
transformWithStateInPandas.

The reference has no streaming at all (SURVEY §2.9); windowed aggs cover
most needs, but arbitrary per-key state (running counters, custom
sessionizers, online dedup caches) needs the state-store API.  Both
Spark APIs are covered: ``applyInPandasWithState`` (the GroupState
flatMap shape) and the Spark 4 ``transformWithStateInPandas``
StatefulProcessor (typed state handles, timers, TTL) — same Arrow-batched
per-key input, explicit state schema, watermark-bounded state lifetime.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user running event count + value total, maintained in the
    state store and emitted on every trigger (update mode).

    State is two scalars per user — bounded by distinct users, not by
    event volume; the watermark lets Spark GC state for users idle past
    the lateness bound when a timeout is configured.
    """

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total_cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total_cents += int(round(float(pdf["value"].sum()) * 100))
        state.update((n, total_cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total_cents / 100.0],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="n long, total_cents long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_totals_tws(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """The transformWithStateInPandas twin of :func:`running_user_totals`
    — same per-user running totals, expressed with the Spark 4
    StatefulProcessor API (a named ValueState handle instead of the
    single GroupState blob; the API that adds composable state
    variables, timers, and per-state TTL for 100 TB/day ingest).
    Output and state size are identical to the GroupState version; the
    test asserts both drain to the same totals.

    Runtime dependency: transformWithState's Python state server speaks
    protobuf; environments without ``google.protobuf`` (like this test
    container) can build the plan but the stream crashes at start — the
    test skips there and the GroupState twin stays the verified path.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n long, total_cents long"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total_cents = (
                self._totals.get() if self._totals.exists() else (0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                total_cents += int(round(float(pdf["value"].sum()) * 100))
            self._totals.update((n, total_cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total_cents / 100.0],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType="user_id long, n_events long, total_value double",
            outputMode="Update",
            timeMode="None",
        )
    )


def stateful_sessionization(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessionization in the state store — the stateful twin
    of queries/events.py::events_sessionization (same output schema and
    values when the stream drains).

    Per-user state is one open session (index, start, end, count): each
    Arrow batch is sorted by (ts, event_id), events extend the open
    session or close it and start the next, closed sessions are emitted
    immediately and the open one is emitted provisionally (update mode —
    a later batch with more events for the user supersedes it; readers
    take the last emission per (user_id, session_id)).  State is four
    scalars per user, bounded by distinct users; with a timeout it would
    be GC-ed past the watermark, keeping 100 TB/day ingest viable.
    """

    gap_us = gap_seconds * 1_000_000

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        sidx, start_us, end_us, n = (
            state.get if state.exists else (0, None, None, 0)
        )
        pdf = pd.concat(list(pdfs))
        if len(pdf):
            pdf = pdf.sort_values(["ts", "event_id"])
            # pandas datetime64 is ns-resolution; emit µs like the batch twin
            ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
            closed = []
            for t in ts_us:
                t = int(t)
                if start_us is None:
                    sidx, start_us, end_us, n = sidx + 1, t, t, 1
                elif t - end_us > gap_us:
                    closed.append((sidx, start_us, end_us, n))
                    sidx, start_us, end_us, n = sidx + 1, t, t, 1
                else:
                    end_us, n = t, n + 1
            state.update((sidx, int(start_us), int(end_us), int(n)))
            rows = closed + [(sidx, start_us, end_us, n)]
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(rows),
                    "session_id": [r[0] for r in rows],
                    "session_start_us": [r[1] for r in rows],
                    "session_end_us": [r[2] for r in rows],
                    "n_events": [r[3] for r in rows],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id long, session_id long, session_start_us long, "
                "session_end_us long, n_events long"
            ),
            stateStructType=(
                "sidx long, start_us long, end_us long, n long"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

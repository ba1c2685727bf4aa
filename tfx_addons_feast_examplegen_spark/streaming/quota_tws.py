"""The admission quota gate on Spark 4's ``transformWithStateInPandas``.

Same semantics as :mod:`.quota` (admit the ``quota`` earliest events
per (key, event-time window) by ``(ts, event_id)``, decided at the
watermark, state capped at ``quota`` entries per open window), but
implemented on the NEW arbitrary-stateful-processing API —
``StatefulProcessor`` with named ``ValueState`` and explicit TIMERS —
instead of ``applyInPandasWithState``'s single implicit state struct
and timeout. Shipping both is deliberate: the registry entry pins the
two APIs to the SAME batch ROW_NUMBER oracle, so the migration path
(Spark is steering stateful pipelines toward transformWithState) is
regression-guarded, and the pair documents the mapping —

    applyInPandasWithState            transformWithStateInPandas
    ------------------------------    -------------------------------
    one state struct per key          named getValueState/getListState
    state.setTimeoutTimestamp(ms)     handle.registerTimer(ms)
    state.hasTimedOut branch          handleExpiredTimer() callback
    GroupStateTimeout.EventTimeTimeout  timeMode="eventTime"
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .quota import OUTPUT_SCHEMA, _interval_micros
from .sessions import _from_micros, _micros


class QuotaProcessor(StatefulProcessor):
    """Bounded candidate set + one event-time timer per open window."""

    def __init__(self, quota: int, win_us: int):
        self._quota = quota
        self._win_us = win_us

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._cand = handle.getValueState(
            "cand", "cand_ts array<long>, cand_id array<long>"
        )

    def handleInputRows(
        self, key, rows, timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        event_type, window_start = key
        start_us = _micros(pd.Timestamp(window_start))
        cand: list[tuple[int, int]] = []
        if self._cand.exists():
            got = self._cand.get()
            cand = list(zip(got[0], got[1]))
        for pdf in rows:
            for ts, eid in zip(pdf["ts"], pdf["event_id"]):
                pair = (_micros(ts), int(eid))
                if len(cand) < self._quota:
                    cand.append(pair)
                    cand.sort()
                elif pair < cand[-1]:
                    cand[-1] = pair
                    cand.sort()
        self._cand.update(([t for t, _ in cand], [i for _, i in cand]))
        self._handle.registerTimer((start_us + self._win_us) // 1000)
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        event_type, window_start = key
        start_us = _micros(pd.Timestamp(window_start))
        if not self._cand.exists():
            return iter(())
        got = self._cand.get()
        self._cand.clear()
        order = sorted(zip(got[0], got[1]))
        out = pd.DataFrame(
            [
                (
                    event_type,
                    _from_micros(start_us),
                    int(eid),
                    _from_micros(int(ts)),
                    rank + 1,
                )
                for rank, (ts, eid) in enumerate(order)
            ],
            columns=[
                "event_type", "window_start", "event_id", "ts", "admit_rank",
            ],
        )
        return iter((out,))

    def close(self) -> None:
        pass


def quota_gate_stream_tws(
    events: DataFrame,
    *,
    quota: int = 5,
    window: str = "1 day",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """:func:`..streaming.quota.quota_gate_stream` on the new API.

    Identical output contract; see the module docstring for the API
    mapping and why both implementations ship.
    """
    if quota < 1:
        raise ValueError(f"quota must be >= 1: {quota}")
    # transformWithStateInPandas runs a protobuf-speaking state server
    # in the Python worker; fail fast with the reason instead of a
    # mid-query JVM crash when the dependency is missing (this
    # container ships no google.protobuf — the applyInPandasWithState
    # twin in .quota is the executable path there; environments with
    # protobuf run this one and its skipped-by-marker tests).
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf in the "
            "Python workers; use streaming.quota.quota_gate_stream here"
        ) from exc
    win_us = _interval_micros(window)
    keyed = events.withWatermark("ts", watermark_delay).select(
        "event_type",
        F.window("ts", window).getField("start").alias("window_start"),
        "event_id",
        "ts",
    )
    return keyed.groupBy("event_type", "window_start").transformWithStateInPandas(
        QuotaProcessor(quota, win_us),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )

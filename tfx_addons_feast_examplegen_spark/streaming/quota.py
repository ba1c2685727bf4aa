"""Custom stateful streaming operator #3: bounded-state windowed
admission quota.

"Admit at most N events per (source, window), decided by EVENT time,
late data included" is the ingestion-throttling primitive of a
streaming corpus pipeline (per-domain crawl quotas, per-tenant rate
caps, per-source sampling budgets). Spark's built-ins can COUNT per
window but cannot pick *which* rows are admitted with a deterministic
rank under out-of-order arrival — that is per-key mutable state, the
``applyInPandasWithState`` shape of :mod:`.sessions` / :mod:`.patterns`.

Semantics (late-data-safe, deterministic): per (key, event-time
window), the admitted set is the ``quota`` earliest events by
``(ts, event_id)`` — exactly batch ``ROW_NUMBER() OVER (PARTITION BY
key, window ORDER BY ts, event_id) <= quota``, which is the oracle.
Admission is decided when the WATERMARK passes the window end (an
event-time timeout), so a late-but-in-watermark event can still
displace a provisionally-admitted one; nothing is emitted early and
then retracted.

The state is BOUNDED BY CONSTRUCTION at ``quota`` entries per open
window: an arriving event either displaces the current worst candidate
or is dropped immediately — the one-pass streaming top-N argument. A
hot key at any arrival rate holds at most ``quota`` (ts, id) pairs
per window, the property that makes the operator safe on a 100 TB
ingest where buffering a whole window per key would OOM the state
store.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .sessions import _from_micros, _micros

OUTPUT_SCHEMA = (
    "event_type string, window_start timestamp, event_id long, "
    "ts timestamp, admit_rank int"
)
# candidate (ts micros, event id) pairs for the single open window of
# this (key, window) group — parallel arrays, at most `quota` entries
STATE_SCHEMA = "cand_ts array<long>, cand_id array<long>"


def quota_gate_stream(
    events: DataFrame,
    *,
    quota: int = 5,
    window: str = "1 day",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Admit the ``quota`` earliest events per (event_type, window).

    ``events`` needs (event_type, event_id, ts). Output one row per
    ADMITTED event once its window is finalized by the watermark:
    (event_type, window_start, event_id, ts, admit_rank) with
    admit_rank 1..quota in (ts, event_id) order — byte-equal to the
    batch ROW_NUMBER spelling.

    The group key is (event_type, window_start) — date_trunc of the
    event time — so each group's state is one window's candidate set
    and the event-time timeout at ``window_end`` finalizes exactly one
    window per key. See the module docstring for the bounded-state
    argument.
    """
    if quota < 1:
        raise ValueError(f"quota must be >= 1: {quota}")

    win_us = _interval_micros(window)

    def _update(
        key: tuple[str, object],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        event_type, window_start = key
        start_us = _micros(pd.Timestamp(window_start))

        if state.hasTimedOut:
            if state.exists:
                (cand_ts, cand_id) = state.get
                state.remove()
                order = sorted(zip(cand_ts, cand_id))
                yield pd.DataFrame(
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
                        "event_type",
                        "window_start",
                        "event_id",
                        "ts",
                        "admit_rank",
                    ],
                )
            return

        cand: list[tuple[int, int]] = []
        if state.exists:
            (cand_ts, cand_id) = state.get
            cand = list(zip(cand_ts, cand_id))
        for pdf in batches:
            for ts, eid in zip(pdf["ts"], pdf["event_id"]):
                pair = (_micros(ts), int(eid))
                if len(cand) < quota:
                    cand.append(pair)
                    cand.sort()
                elif pair < cand[-1]:
                    # displace the current worst candidate — state
                    # stays capped at `quota` entries no matter the
                    # arrival volume
                    cand[-1] = pair
                    cand.sort()
        state.update(([t for t, _ in cand], [i for _, i in cand]))
        # finalize when the watermark passes the window end
        state.setTimeoutTimestamp((start_us + win_us) // 1000)
        return

    keyed = events.withWatermark("ts", watermark_delay).select(
        "event_type",
        F.window("ts", window).getField("start").alias("window_start"),
        "event_id",
        "ts",
    )
    return keyed.groupBy("event_type", "window_start").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _interval_micros(interval: str) -> int:
    """Parse '<n> (second|minute|hour|day)[s]' to microseconds."""
    parts = interval.strip().split()
    if len(parts) != 2:
        raise ValueError(f"unsupported interval: {interval!r}")
    n = int(parts[0])
    unit = parts[1].rstrip("s").lower()
    scale = {
        "second": 1_000_000,
        "minute": 60 * 1_000_000,
        "hour": 3_600 * 1_000_000,
        "day": 86_400 * 1_000_000,
    }.get(unit)
    if scale is None or n <= 0:
        raise ValueError(f"unsupported interval: {interval!r}")
    return n * scale

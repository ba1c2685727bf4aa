"""Custom stateful streaming operator: gap-based sessionization.

The canonical ``applyInPandasWithState`` example of an operator Spark's
built-in streaming aggregations can't express: sessions close when a
user goes quiet for ``gap``, not on a fixed window boundary, so per-key
mutable state must survive across micro-batches.

Correctness under out-of-order input is the crux: an event may arrive
(within the watermark) BETWEEN two already-seen sessions and merge them,
so nothing may be finalized until the watermark has passed it. The
operator therefore buffers pending event times in state and, on every
batch (and on event-time timeout), finalizes exactly the sessions whose
``end + gap`` lies below the current watermark; later sessions stay
buffered. Emitted sessions are identical to a batch sessionization of
the same (non-late) events — test-enforced.

State per key = the pending event times (bounded by watermark horizon ×
event rate); partitioned by the grouping key across executors, GC'd by
event-time timeout.

Semantics match the batch ``sessionization`` SQL query in
:mod:`..queries`: (user_id, session_start, session_end, n_events), with
consecutive gaps <= ``gap_seconds`` inside one session.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
STATE_SCHEMA = "pending array<long>"  # epoch micros of unfinalized events


def _micros(ts) -> int:
    # Integer-exact epoch micros: float .timestamp() only has ~238 ns
    # resolution at 2024 epochs, which corrupts microsecond boundaries.
    if isinstance(ts, pd.Timestamp):
        return ts.value // 1_000
    whole = int(ts.replace(tzinfo=dt.timezone.utc, microsecond=0).timestamp())
    return whole * 1_000_000 + ts.microsecond


def _from_micros(us: int) -> dt.datetime:
    base = dt.datetime.fromtimestamp(us // 1_000_000, tz=dt.timezone.utc)
    return base.replace(tzinfo=None, microsecond=us % 1_000_000)


def _sessions(times: list[int], gap_us: int) -> list[tuple[int, int, int]]:
    """Sorted times -> [(start, end, count)] with gaps > gap_us splitting."""
    out = []
    start = end = None
    n = 0
    for t in times:
        if n and t - end > gap_us:
            out.append((start, end, n))
            n = 0
        if n == 0:
            start = t
        end = t
        n += 1
    if n:
        out.append((start, end, n))
    return out


def sessionize_stream(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Watermarked stream -> closed sessions via buffered per-user state."""

    gap_us = gap_seconds * 1_000_000

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pending: list[int] = list(state.get[0]) if state.exists else []
        if not state.hasTimedOut:
            for pdf in pdfs:
                pending.extend(_micros(t) for t in pdf["ts"])
        pending.sort()

        wm_us = state.getCurrentWatermarkMs() * 1000
        finalized: list[tuple] = []
        keep: list[int] = []
        first_kept_end: int | None = None
        # _sessions partitions the SORTED pending list into contiguous
        # runs, so a single index walk slices each session's events in
        # O(total) — a per-session "t for t in pending" rescan would be
        # O(sessions x pending) on a hot key with stalled watermark.
        i = 0
        for start, end, n in _sessions(pending, gap_us):
            # A future event (ts >= watermark) could only extend/merge a
            # session whose end + gap reaches past the watermark; earlier
            # sessions are immutable -> safe to emit.
            if end + gap_us < wm_us:
                finalized.append(
                    (user_id, _from_micros(start), _from_micros(end), n)
                )
            else:
                if first_kept_end is None:
                    first_kept_end = end
                keep.extend(pending[i : i + n])
            i += n

        if keep:
            state.update((keep,))
            # Arm the timeout at the EARLIEST pending session's close
            # (end + gap): that is the first moment the watermark can
            # finalize anything more. Arming at the last session's close
            # instead would hold every earlier closed-but-unemitted
            # session hostage to the newest activity.
            first_end_ms = first_kept_end // 1000
            state.setTimeoutTimestamp(
                max(first_end_ms + gap_seconds * 1000, wm_us // 1000 + 1)
            )
        elif state.exists:
            state.remove()

        if finalized:
            yield pd.DataFrame(
                finalized,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

"""Custom stateful streaming operator #2: timeout-bounded event-pattern
matching (CEP-lite).

"Did the user RECOVER — an 'error' followed by a 'purchase' within the
timeout?" is the canonical funnel-with-deadline pattern a streaming
engine must answer online. Spark's built-in stream-stream interval join
CAN express the pairing, but not the per-error FIRST-match semantics
(each error matches its earliest qualifying purchase) nor the emit-on-
deadline for unmatched errors — that needs per-key mutable state, the
same ``applyInPandasWithState`` shape as gap sessionization
(:mod:`.sessions`).

Finalization rule (out-of-order-safe): an error at ``e`` is immutable
once the watermark passes ``e + timeout`` — every purchase that could
still match it must carry ``ts <= e + timeout < watermark`` and has
therefore already arrived. Purchases are garbage-collected once
``p + timeout`` falls below the watermark: a pending error needing p
satisfies ``e + timeout >= wm`` and ``p > e``, so such p always carries
``p + timeout > wm``; and no FUTURE error (ts >= wm) can match a
purchase below the watermark (the pattern requires purchase AFTER
error). Emitted matches equal the batch per-error min-purchase lookup —
oracle-enforced.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .sessions import _from_micros, _micros

OUTPUT_SCHEMA = (
    "user_id long, error_ts timestamp, recovery_ts timestamp, "
    "recovered boolean"
)
STATE_SCHEMA = "pending_err array<long>, pending_pur array<long>"


def match_recovery_stream(
    events: DataFrame,
    *,
    error_type: str = "error",
    recovery_type: str = "purchase",
    timeout_seconds: int = 1800,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Watermarked event stream -> one row per ``error_type`` event with
    its earliest ``recovery_type`` event in ``(error_ts, error_ts +
    timeout]`` (or recovered=false once the deadline passes)."""
    to_us = timeout_seconds * 1_000_000

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        errs: list[int] = list(state.get[0]) if state.exists else []
        purs: list[int] = list(state.get[1]) if state.exists else []
        if not state.hasTimedOut:
            for pdf in pdfs:
                for t, et in zip(pdf["ts"], pdf["event_type"]):
                    if et == error_type:
                        errs.append(_micros(t))
                    elif et == recovery_type:
                        purs.append(_micros(t))
        errs.sort()
        purs.sort()

        wm_us = state.getCurrentWatermarkMs() * 1000
        rows, keep_errs = [], []
        for e in errs:
            if e + to_us < wm_us:
                match = next(
                    (p for p in purs if e < p <= e + to_us), None
                )
                rows.append(
                    (
                        user_id,
                        _from_micros(e),
                        _from_micros(match) if match is not None else None,
                        match is not None,
                    )
                )
            else:
                keep_errs.append(e)
        keep_purs = [p for p in purs if p + to_us >= wm_us]

        if keep_errs or keep_purs:
            state.update((keep_errs, keep_purs))
            # EventTimeTimeout resets the timer on every invocation, so a
            # kept state MUST always re-arm it — purchase-only state for a
            # key that never sees another event would otherwise be
            # retained forever. A purchase older than `timeout` can never
            # match a future error (errors match only forward in time), so
            # max(purs) + timeout is a safe eviction deadline.
            if keep_errs:
                deadline_ms = (keep_errs[0] + to_us) // 1000
            else:
                deadline_ms = (max(keep_purs) + to_us) // 1000
            state.setTimeoutTimestamp(
                max(deadline_ms + 1, wm_us // 1000 + 1)
            )
        elif state.exists:
            state.remove()

        if rows:
            yield pd.DataFrame(
                rows,
                columns=["user_id", "error_ts", "recovery_ts", "recovered"],
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

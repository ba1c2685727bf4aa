"""Custom stateful streaming operator (applyInPandasWithState).

Input slices are written sequentially (distinct mtimes) so the file
source processes micro-batches in event-time order and a 1-hour
watermark drops nothing. Because the operator registers event-time
timeouts, availableNow runs a final timeout batch whose watermark is the
global max event time minus the delay — every batch session closing
(end + gap) before that horizon must be emitted, only later (still-open)
sessions may be withheld, and nothing outside the batch session set may
appear.
"""

import datetime as dt
import time

from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.session import load_table
from tfx_addons_feast_examplegen_spark.streaming.events import (
    read_events_stream,
    run_to_completion,
)
from tfx_addons_feast_examplegen_spark.streaming.sessions import sessionize_stream

GAP = 1800
SLICES = [
    dt.datetime(2024, 1, 1),
    dt.datetime(2024, 1, 9),
    dt.datetime(2024, 1, 17),
    dt.datetime(2024, 1, 25),
    dt.datetime(2024, 2, 5),
]


def _batch_sessions(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("__ev")
    return spark.sql(f"""
        WITH flagged AS (
          SELECT user_id, ts,
                 CASE WHEN unix_timestamp(ts) - unix_timestamp(
                          lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                          > {GAP}
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          IS NULL
                      THEN 1 ELSE 0 END AS new_sess
          FROM __ev
        ), numbered AS (
          SELECT user_id, ts,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        )
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events
        FROM numbered GROUP BY user_id, sid
    """)


def test_stateful_sessionization_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_sliced")
    ev = load_table(spark, sf_dir, "events")
    for lo, hi in zip(SLICES, SLICES[1:]):
        (
            ev.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        time.sleep(1.2)  # distinct mtimes -> chronological batch order

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    out = run_to_completion(
        sessionize_stream(stream, gap_seconds=GAP, watermark_delay="1 hour"),
        query_name="sessions_out",
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in out.collect()
    }

    # horizon: the operator sets event-time timeouts, so after the last
    # data batch a timeout batch fires with the FINAL watermark =
    # global max ts - delay; a small band absorbs ms flooring.
    wm = ev.agg(F.max("ts")).collect()[0][0] - dt.timedelta(hours=1)
    band = dt.timedelta(milliseconds=5)

    batch = _batch_sessions(spark, sf_dir).collect()
    batch_all = {
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in batch
    }
    must_emit = {
        t for t in batch_all
        if t[2] + dt.timedelta(seconds=GAP) < wm - band
    }
    may_emit = {
        t for t in batch_all
        if t[2] + dt.timedelta(seconds=GAP) < wm + band
    }
    assert must_emit <= got, f"missing {len(must_emit - got)} sessions"
    assert got <= may_emit, f"unexpected emissions: {sorted(got - may_emit)[:3]}"
    assert len(must_emit) > 50


def test_match_recovery_stream_first_match_and_deadline(spark, tmp_path):
    import datetime as dt
    import os
    import time

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from tfx_addons_feast_examplegen_spark.streaming.patterns import (
        match_recovery_stream,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def s(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        Row(user_id=1, ts=s(0), event_type="error"),
        Row(user_id=1, ts=s(100), event_type="purchase"),   # first match
        Row(user_id=1, ts=s(200), event_type="purchase"),
        Row(user_id=2, ts=s(0), event_type="error"),        # never recovers
        Row(user_id=2, ts=s(2000), event_type="view"),
        # sentinel far in the future advances the watermark past deadlines
        Row(user_id=-1, ts=s(3600 * 6), event_type="view"),
    ]
    src = str(tmp_path / "ev")
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .parquet(src)
    )
    out = match_recovery_stream(
        stream, timeout_seconds=1800, watermark_delay="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("rec_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.error_ts, r.recovery_ts, r.recovered)
        for r in spark.table("rec_test").filter("user_id >= 0").collect()
    }
    assert got == {
        (1, s(0), s(100), True),   # earliest purchase wins, not s(200)
        (2, s(0), None, False),    # deadline passed, no recovery
    }


def test_recovery_stream_evicts_purchase_only_state(spark, tmp_path):
    # ADVICE r5: purchase-only state (a user who never errors) must be
    # evicted once the watermark passes its usefulness horizon —
    # EventTimeTimeout resets per invocation, so keeping state without
    # re-arming the timer retained one-shot purchasers forever. The
    # state-store row count in the final progress proves eviction.
    import datetime as dt
    import json

    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.streaming.patterns import (
        match_recovery_stream,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def s(sec):
        return t0 + dt.timedelta(seconds=sec)

    src = str(tmp_path / "ev")
    schema = "user_id long, ts timestamp, event_type string"
    batches = [
        # batch 1: a purchase-only user + a low sentinel
        [Row(user_id=3, ts=s(0), event_type="purchase"),
         Row(user_id=-1, ts=s(100), event_type="view")],
        # batch 2: advance the watermark far past purchase + timeout
        [Row(user_id=-1, ts=s(3600 * 6), event_type="view")],
        # batch 3: one more batch so the timeout (armed against batch
        # 2's watermark) actually fires
        [Row(user_id=-1, ts=s(3600 * 12), event_type="view")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = match_recovery_stream(
        stream, timeout_seconds=1800, watermark_delay="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("evict_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progresses = [json.loads(p.json) for p in q.recentProgress]
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in progresses
        if p.get("stateOperators")
    ]
    assert state_rows, "no state operator progress recorded"
    # the purchase-only user's state must be gone by the final batch
    assert state_rows[-1] == 0, state_rows

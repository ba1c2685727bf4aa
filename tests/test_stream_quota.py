"""Bounded-state streaming admission quota (streaming/quota.py)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.streaming.events import (
    read_events_stream,
    run_to_completion,
)
from tfx_addons_feast_examplegen_spark.streaming.quota import (
    _interval_micros,
    quota_gate_stream,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _drive(spark, tmp_path, slices, *, quota, window="1 day"):
    """Write each slice as one mtime-ordered file batch and run the gate."""
    src = str(tmp_path / "ev")
    base = time.time() - 60
    stamped: set[str] = set()
    for i, rows in enumerate(slices):
        df = spark.createDataFrame(rows, SCHEMA)
        df.coalesce(1).write.mode("append").parquet(src)
        for fname in os.listdir(src):
            p = os.path.join(src, fname)
            if p not in stamped:
                os.utime(p, (base + 10 * i, base + 10 * i))
                stamped.add(p)
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    out = run_to_completion(
        quota_gate_stream(stream, quota=quota, window=window),
        query_name=f"q_quota_test_{abs(hash(str(tmp_path)))}",
    )
    return [
        (r.event_type, r.event_id, r.admit_rank)
        for r in out.filter(F.col("event_type") != "zz").collect()
    ]


def _ev(eid, ts, etype="a"):
    import datetime as dt

    if isinstance(ts, str):
        ts = dt.datetime.strptime(ts, "%Y-%m-%d %H:%M:%S")
    return (eid, ts, 1, etype, 0.0, "{}")


SENTINEL = [_ev(-1, "2024-03-01 00:00:00", "zz")]


# NB: SENTINEL is built at import via _ev, so the string parses there too


def test_admits_earliest_by_ts_then_id(spark, tmp_path):
    rows = [
        _ev(5, "2024-01-01 10:00:00"),
        _ev(1, "2024-01-01 11:00:00"),
        _ev(2, "2024-01-01 09:00:00"),
        _ev(9, "2024-01-01 09:00:00"),  # ts tie -> id breaks it
        _ev(7, "2024-01-01 12:00:00"),
    ]
    got = _drive(spark, tmp_path, [rows, SENTINEL], quota=3)
    assert sorted(got) == [("a", 2, 1), ("a", 5, 3), ("a", 9, 2)]


def test_late_event_displaces_provisional_admit(spark, tmp_path):
    # batch 1 fills the quota; batch 2 delivers a LATE event with an
    # earlier ts — it must displace the provisional worst candidate
    early = [_ev(i, f"2024-01-01 1{i}:00:00") for i in range(3)]  # 10,11,12h
    late = [_ev(99, "2024-01-01 08:00:00")]
    got = _drive(spark, tmp_path, [early, late, SENTINEL], quota=3)
    assert sorted(got) == [("a", 0, 2), ("a", 1, 3), ("a", 99, 1)]
    # the displaced 12:00 event (id 2) is NOT in the output
    assert all(eid != 2 for _, eid, _ in got)


def test_windows_and_keys_are_independent(spark, tmp_path):
    rows = [
        _ev(1, "2024-01-01 10:00:00", "a"),
        _ev(2, "2024-01-01 11:00:00", "a"),
        _ev(3, "2024-01-02 10:00:00", "a"),  # next day: fresh quota
        _ev(4, "2024-01-01 10:00:00", "b"),  # other key: fresh quota
    ]
    got = _drive(spark, tmp_path, [rows, SENTINEL], quota=1)
    assert sorted(got) == [("a", 1, 1), ("a", 3, 1), ("b", 4, 1)]


def test_matches_batch_row_number_on_fixture(spark, sf_dir, tmp_path):
    # equivalence on real data: 3-per-(type, day) over the events slice
    from tfx_addons_feast_examplegen_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < "2024-01-08 00:00:00"
    )
    rows = [
        (r.event_id, r.ts, r.user_id, r.event_type, r.value, r.props)
        for r in ev.collect()
    ]
    got = _drive(spark, tmp_path, [rows[: len(rows) // 2],
                                   rows[len(rows) // 2 :], SENTINEL], quota=3)
    from pyspark.sql import Window

    w = Window.partitionBy(
        "event_type", F.date_trunc("day", F.col("ts"))
    ).orderBy("ts", "event_id")
    want = {
        (r.event_type, r.event_id, r.rn)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .collect()
    }
    assert set(got) == want


def test_validation(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError, match="quota"):
        quota_gate_stream(df, quota=0)
    with pytest.raises(ValueError, match="interval"):
        _interval_micros("fortnight")
    with pytest.raises(ValueError, match="interval"):
        _interval_micros("0 days")
    assert _interval_micros("2 hours") == 2 * 3600 * 1_000_000


def test_tws_twin_guards_missing_protobuf_or_matches(spark, tmp_path):
    # The transformWithStateInPandas twin: on protobuf-equipped
    # environments it must match the applyInPandasWithState gate
    # row-for-row; here (no google.protobuf in the container) it must
    # fail FAST with a named reason instead of a mid-query JVM crash.
    from tfx_addons_feast_examplegen_spark.streaming.quota_tws import (
        quota_gate_stream_tws,
    )

    rows = [
        _ev(5, "2024-01-01 10:00:00"),
        _ev(2, "2024-01-01 09:00:00"),
        _ev(9, "2024-01-01 09:00:00"),
    ]
    try:
        from google.protobuf import descriptor  # noqa: F401

        has_protobuf = True
    except ImportError:
        has_protobuf = False

    if not has_protobuf:
        df = spark.createDataFrame(rows, SCHEMA)
        with pytest.raises(RuntimeError, match="protobuf"):
            quota_gate_stream_tws(df, quota=2)
        return

    src = str(tmp_path / "tws")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(SENTINEL, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = read_events_stream(spark, src)
    out = run_to_completion(
        quota_gate_stream_tws(stream, quota=2, window="1 day"),
        query_name="q_tws_twin",
    )
    got = sorted(
        (r.event_type, r.event_id, r.admit_rank)
        for r in out.collect()
        if r.event_type != "zz"
    )
    assert got == [("a", 2, 1), ("a", 9, 2)]

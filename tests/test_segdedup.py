"""Segment dedup: first-wins rewrite semantics, idempotence, plan shape."""

from __future__ import annotations

import pytest

from tfx_addons_feast_examplegen_spark.operators.segdedup import (
    segment_dedup,
    segment_occurrences,
)


def _run(spark, rows, width, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = segment_dedup(df, "doc_id", "text", width=width, **kw)
    return {
        r["doc_id"]: (r["text"], r["n_segs"], r["n_kept"]) for r in out.collect()
    }


def test_first_wins_rewrite(spark):
    # doc 2 repeats doc 1's first segment; doc 3 is entirely doc 1.
    rows = [
        (1, "a b c d e f"),
        (2, "a b c x y z"),
        (3, "a b c d e f"),
        (4, "p q"),
    ]
    got = _run(spark, rows, width=3)
    assert got == {
        1: ("a b c d e f", 2, 2),
        2: ("x y z", 2, 1),
        3: ("", 2, 0),
        4: ("p q", 1, 1),
    }


def test_trailing_partial_segment_kept(spark):
    got = _run(spark, [(1, "a b c d e"), (2, "d e")], width=3)
    # doc 1's trailing partial is "d e"; doc 2 is that exact segment,
    # already claimed by (1, idx=1).
    assert got == {1: ("a b c d e", 2, 2), 2: ("", 1, 0)}


def test_width_one_is_word_dedup(spark):
    got = _run(spark, [(1, "a b a"), (2, "b c")], width=1)
    # within-doc repeats dedup too: (1,2)="a" loses to (1,0).
    assert got == {1: ("a b", 3, 2), 2: ("c", 2, 1)}


def test_idempotent(spark):
    rows = [(1, "a b c d e f"), (2, "a b c x y z"), (3, "a b c d e f")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    once = segment_dedup(df, "doc_id", "text", width=3)
    twice = segment_dedup(once.select("doc_id", "text"), "doc_id", "text", width=3)
    o = {r["doc_id"]: r["text"] for r in once.collect()}
    t = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert o == t


def test_hashed_equals_default(spark):
    rows = [(i, f"w{i % 7} x{i % 5} y{i % 3} z common tail words here") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = {tuple(r) for r in segment_dedup(df, "doc_id", "text", width=4).collect()}
    b = {
        tuple(r)
        for r in segment_dedup(df, "doc_id", "text", width=4, hashed=True).collect()
    }
    assert a == b


def test_bad_width_rejected(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        segment_occurrences(df, "doc_id", "text", width=0)


def test_no_window_operator(spark):
    # The winner per segment comes from a map-side-combinable
    # min(struct(...)) hash aggregate, NOT row_number over a
    # partition-by-segment Window — a billion-occurrence boilerplate
    # segment must never become one task's sort.
    df = spark.createDataFrame([(1, "a b c"), (2, "a b c")], ["doc_id", "text"])
    plan = (
        segment_dedup(df, "doc_id", "text", width=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan

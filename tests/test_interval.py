"""point_in_interval_join / interval_overlap_join: brute-force
equivalence, negatives, left-outer, over-cap guard, plan shape (no
nested loop), first-shared-bin dedup (no duplicate pairs)."""

from __future__ import annotations

import random

import pytest

from tfx_addons_feast_examplegen_spark.operators.interval import (
    interval_overlap_join,
    point_in_interval_join,
)


def _fixture(spark, seed=6, n_pts=250, n_iv=60):
    rng = random.Random(seed)
    pts = [(i, rng.randint(-50, 200)) for i in range(n_pts)]
    ivs = []
    for j in range(n_iv):
        lo = rng.randint(-60, 180)
        ivs.append((j, lo, lo + rng.randint(0, 40)))  # includes empty (len 0)
    p = spark.createDataFrame(pts, "pid: long, ts: long")
    v = spark.createDataFrame(ivs, "iid: long, lo: long, hi: long")
    exp = {(i, j) for i, t in pts for j, lo, hi in ivs if lo <= t < hi}
    return p, v, pts, exp


@pytest.mark.parametrize("width", [1, 7, 64])
def test_matches_bruteforce_incl_negative_epochs(spark, width):
    p, v, _, exp = _fixture(spark)
    got = {
        (r["pid"], r["iid"])
        for r in point_in_interval_join(
            p, v, ts="ts", lo="lo", hi="hi", bin_width=width
        ).collect()
    }
    assert got == exp


def test_left_outer_keeps_unmatched_points(spark):
    p, v, pts, exp = _fixture(spark, seed=9, n_iv=5)
    rows = point_in_interval_join(
        p, v, ts="ts", lo="lo", hi="hi", bin_width=16, how="left_outer"
    ).collect()
    matched = {(r["pid"], r["iid"]) for r in rows if r["iid"] is not None}
    nulls = {r["pid"] for r in rows if r["iid"] is None}
    assert matched == exp
    assert nulls == {i for i, _ in pts} - {i for i, _ in exp}


def test_over_cap_interval_fails_loud(spark):
    p = spark.createDataFrame([(1, 5)], "pid: long, ts: long")
    v = spark.createDataFrame([(1, 0, 10**9)], "iid: long, lo: long, hi: long")
    with pytest.raises(Exception, match="spans more than"):
        point_in_interval_join(
            p, v, ts="ts", lo="lo", hi="hi",
            bin_width=1, max_bins_per_interval=100,
        ).count()


def test_param_and_column_validation(spark):
    p = spark.createDataFrame([(1, 5)], "pid: long, ts: long")
    v = spark.createDataFrame([(1, 0, 9)], "iid: long, lo: long, hi: long")
    with pytest.raises(ValueError):
        point_in_interval_join(p, v, ts="ts", lo="lo", hi="hi", bin_width=0)
    with pytest.raises(ValueError):
        point_in_interval_join(
            p, v, ts="ts", lo="lo", hi="hi", bin_width=4, how="full"
        )
    clash = v.withColumnRenamed("iid", "pid")
    with pytest.raises(ValueError, match="overlapping"):
        point_in_interval_join(p, clash, ts="ts", lo="lo", hi="hi", bin_width=4)


def _overlap_fixture(spark, seed=13, n_l=120, n_r=90):
    rng = random.Random(seed)
    ls, rs = [], []
    for i in range(n_l):
        lo = rng.randint(-80, 200)
        ls.append((i, lo, lo + rng.randint(0, 50)))  # includes empty
    for j in range(n_r):
        lo = rng.randint(-80, 200)
        rs.append((j, lo, lo + rng.randint(0, 30)))
    l = spark.createDataFrame(ls, "lid: long, lo: long, hi: long")
    r = spark.createDataFrame(rs, "rid: long, rlo: long, rhi: long")
    # empty intervals ([x, x)) contain nothing and match nothing — the
    # operator's documented semantics, hence the ahi > alo guards here
    exp = {
        (i, j)
        for i, alo, ahi in ls
        for j, blo, bhi in rs
        if alo < bhi and blo < ahi and ahi > alo and bhi > blo
    }
    return l, r, exp


@pytest.mark.parametrize("width", [1, 9, 128])
def test_overlap_matches_bruteforce_no_duplicates(spark, width):
    # rows (not a set) first: the first-shared-bin rule must emit each
    # overlapping pair exactly ONCE even when the pair shares many bins
    l, r, exp = _overlap_fixture(spark)
    rows = [
        (row["lid"], row["rid"])
        for row in interval_overlap_join(
            l, r, lo_l="lo", hi_l="hi", lo_r="rlo", hi_r="rhi",
            bin_width=width,
        ).collect()
    ]
    assert len(rows) == len(set(rows))
    assert set(rows) == exp


def test_overlap_touching_endpoints_do_not_match(spark):
    l = spark.createDataFrame([(1, 0, 10)], "lid: long, lo: long, hi: long")
    r = spark.createDataFrame(
        [(1, 10, 20), (2, -5, 0), (3, 9, 11), (4, None, 5)],
        "rid: long, rlo: long, rhi: long",
    )
    got = {
        row["rid"]
        for row in interval_overlap_join(
            l, r, lo_l="lo", hi_l="hi", lo_r="rlo", hi_r="rhi", bin_width=4
        ).collect()
    }
    assert got == {3}  # [10,20) and [-5,0) touch only; NULL drops


def test_overlap_over_cap_fails_loud_both_sides(spark):
    l = spark.createDataFrame([(1, 0, 10)], "lid: long, lo: long, hi: long")
    r = spark.createDataFrame([(1, 0, 10**9)], "rid: long, rlo: long, rhi: long")
    with pytest.raises(Exception, match="spans more than"):
        interval_overlap_join(
            l, r, lo_l="lo", hi_l="hi", lo_r="rlo", hi_r="rhi",
            bin_width=1, max_bins_per_interval=100,
        ).count()


def test_overlap_no_nested_loop_join(spark):
    l, r, _ = _overlap_fixture(spark)
    plan = (
        interval_overlap_join(
            l, r, lo_l="lo", hi_l="hi", lo_r="rlo", hi_r="rhi", bin_width=8
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_no_nested_loop_join(spark):
    # The rewrite's reason to exist: the naive range predicate plans a
    # BroadcastNestedLoopJoin; the binned form must be an equi-join.
    p, v, _, _ = _fixture(spark)
    plan = (
        point_in_interval_join(p, v, ts="ts", lo="lo", hi="hi", bin_width=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_auto_bin_width_equals_explicit_results(spark):
    p, v, _, exp = _fixture(spark)
    auto = {
        (r["pid"], r["iid"])
        for r in point_in_interval_join(
            p, v, ts="ts", lo="lo", hi="hi", bin_width="auto"
        ).collect()
    }
    assert auto == exp
    l, r, oexp = _overlap_fixture(spark)
    got = {
        (row["lid"], row["rid"])
        for row in interval_overlap_join(
            l, r, lo_l="lo", hi_l="hi", lo_r="rlo", hi_r="rhi",
            bin_width="auto",
        ).collect()
    }
    assert got == oexp


def test_auto_bin_width_picks_larger_median(spark):
    from tfx_addons_feast_examplegen_spark.operators.interval import (
        _auto_bin_width,
    )

    short = spark.createDataFrame(
        [(i, 0, 10) for i in range(9)], "i: long, lo: long, hi: long"
    )
    long = spark.createDataFrame(
        [(i, 0, 1000) for i in range(9)], "j: long, a: long, b: long"
    )
    assert _auto_bin_width((short, "lo", "hi")) == 10
    assert _auto_bin_width((short, "lo", "hi"), (long, "a", "b")) == 1000
    empty = spark.createDataFrame([], "k: long, x: long, y: long")
    assert _auto_bin_width((empty, "x", "y")) == 1
    degenerate = spark.createDataFrame(
        [(1, 5, 5)], "k: long, x: long, y: long"
    )
    assert _auto_bin_width((degenerate, "x", "y")) == 1


def test_bin_width_rejects_bad_values(spark):
    p = spark.createDataFrame([(1, 5)], "pid: long, ts: long")
    v = spark.createDataFrame([(1, 0, 9)], "iid: long, lo: long, hi: long")
    with pytest.raises(ValueError, match="auto"):
        point_in_interval_join(p, v, ts="ts", lo="lo", hi="hi", bin_width="med")


def test_bin_width_accepts_numpy_ints_rejects_bool(spark):
    import numpy as np

    p = spark.createDataFrame([(1, 5)], "pid: long, ts: long")
    v = spark.createDataFrame([(1, 0, 9)], "iid: long, lo: long, hi: long")
    got = point_in_interval_join(
        p, v, ts="ts", lo="lo", hi="hi", bin_width=np.int64(4)
    ).collect()
    assert len(got) == 1
    with pytest.raises(ValueError, match="bool"):
        point_in_interval_join(p, v, ts="ts", lo="lo", hi="hi", bin_width=True)
    with pytest.raises(ValueError, match="integer"):
        point_in_interval_join(p, v, ts="ts", lo="lo", hi="hi", bin_width=3.5)

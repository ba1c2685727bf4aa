"""Snapshot diff: change classification, null-safety, upsert set."""

from tfx_addons_feast_examplegen_spark.operators.snapshot import (
    incremental_upsert_set,
    snapshot_diff,
)


def _frames(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "c"), (4, 40.0, "d")],
        "k int, v double, tag string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 25.0, "b"), (3, None, "c"), (5, 50.0, "e")],
        "k int, v double, tag string",
    )
    return old, new


def test_snapshot_diff_classifies_all_cases(spark):
    old, new = _frames(spark)
    d = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"], ["v", "tag"]).collect()}
    assert d == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",  # NULL == NULL under eqNullSafe
        4: "removed",
        5: "added",
    }


def test_snapshot_diff_null_transition_is_changed(spark):
    old = spark.createDataFrame([(1, 1.0)], "k int, v double")
    new = spark.createDataFrame([(1, None)], "k int, v double")
    [r] = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert r.change_type == "changed"


def test_incremental_upsert_set_ships_new_versions_only(spark):
    old, new = _frames(spark)
    rows = sorted(
        (r.k, r.v, r.tag)
        for r in incremental_upsert_set(old, new, ["k"], ["v", "tag"]).collect()
    )
    assert rows == [(2, 25.0, "b"), (5, 50.0, "e")]

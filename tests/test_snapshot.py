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


def test_merge_upsert_seq_and_tombstones(spark):
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.snapshot import (
        merge_upsert,
    )

    base = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")],
        "k long, v string",
    )
    updates = spark.createDataFrame(
        [
            Row(k=1, v="a1", seq=1, dead=False),
            Row(k=1, v="a2", seq=2, dead=False),  # newest seq wins
            Row(k=2, v="x", seq=1, dead=True),    # tombstone
            Row(k=4, v="d", seq=1, dead=False),   # insert
        ],
        "k long, v string, seq long, dead boolean",
    )
    out = {
        r.k: r.v
        for r in merge_upsert(
            base, updates, ["k"], seq_col="seq", delete_col="dead"
        )
        .select("k", "v")
        .collect()
    }
    assert out == {1: "a2", 3: "c", 4: "d"}


def test_merge_upsert_no_seq_collapses_duplicate_keys(spark):
    # ADVICE r5: without seq_col, a batch with key collisions must still
    # produce ONE row per key (deterministic all-column tie-break), not
    # duplicate output rows.
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.snapshot import (
        merge_upsert,
    )

    base = spark.createDataFrame([Row(k=1, v="a")], "k long, v string")
    updates = spark.createDataFrame(
        [Row(k=1, v="x"), Row(k=1, v="y"), Row(k=2, v="z")],
        "k long, v string",
    )
    out = merge_upsert(base, updates, ["k"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r.v)
    assert sorted(by_key) == [1, 2]
    assert all(len(vs) == 1 for vs in by_key.values()), by_key
    assert by_key[1] == ["y"]  # descending tie-break on v: stable pick


def test_merge_upsert_no_seq_skips_unorderable_columns(spark):
    # A map-typed payload column must not break the fallback tie-break
    # (maps are unorderable in Spark); the invariant still holds via
    # the remaining orderable columns.
    from pyspark.sql import Row

    from tfx_addons_feast_examplegen_spark.operators.snapshot import (
        merge_upsert,
    )

    base = spark.createDataFrame(
        [Row(k=1, v="a", props={"x": "1"})],
        "k long, v string, props map<string,string>",
    )
    updates = spark.createDataFrame(
        [Row(k=1, v="m", props={"y": "2"}), Row(k=1, v="z", props={})],
        "k long, v string, props map<string,string>",
    )
    out = merge_upsert(base, updates, ["k"]).collect()
    assert len(out) == 1 and out[0].v == "z"  # desc tie-break on v

"""delta_join: insert-delta IVM for an inner-join view."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.ivm import delta_join


def _frames(spark):
    a = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (3, "a3")], ["k", "va"]
    )
    da = spark.createDataFrame([(2, "a2new"), (4, "a4")], ["k", "va"])
    b = spark.createDataFrame(
        [(1, "b1"), (2, "b2"), (4, "b4x")], ["k", "vb"]
    )
    db = spark.createDataFrame([(1, "b1new"), (3, "b3")], ["k", "vb"])
    return a, da, b, db


def _bag(rows):
    from collections import Counter

    return Counter(tuple(r) for r in rows)


def test_delta_equals_full_minus_full(spark):
    a, da, b, db = _frames(spark)
    delta = delta_join(a, da, b, db, ["k"]).collect()
    full_new = a.unionByName(da).join(b.unionByName(db), "k").select(
        "k", "va", "vb"
    ).collect()
    full_old = a.join(b, "k").select("k", "va", "vb").collect()
    want = _bag(full_new) - _bag(full_old)
    assert _bag(delta) == want


def test_view_plus_delta_is_new_view(spark):
    # the maintenance property itself: old view + delta == new view (bag)
    a, da, b, db = _frames(spark)
    old_view = a.join(b, "k").select("k", "va", "vb").collect()
    delta = delta_join(a, da, b, db, ["k"]).collect()
    new_view = a.unionByName(da).join(b.unionByName(db), "k").select(
        "k", "va", "vb"
    ).collect()
    assert _bag(old_view) + _bag(delta) == _bag(new_view)


def test_duplicate_rows_bag_semantics(spark):
    # multiplicities multiply through the join; the delta must carry them
    a = spark.createDataFrame([(1, "x"), (1, "x")], ["k", "va"])
    da = spark.createDataFrame([(1, "x")], ["k", "va"])
    b = spark.createDataFrame([(1, "y")], ["k", "vb"])
    db = spark.createDataFrame([(1, "y"), (1, "z")], ["k", "vb"])
    delta = delta_join(a, da, b, db, ["k"]).collect()
    new = a.unionByName(da).join(b.unionByName(db), "k").select(
        "k", "va", "vb"
    ).collect()
    old = a.join(b, "k").select("k", "va", "vb").collect()
    assert _bag(delta) == _bag(new) - _bag(old)
    assert sum(_bag(delta).values()) == 9 - 2  # 3x3 new minus 2x1 old


def test_empty_deltas_yield_empty(spark):
    a, _, b, _ = _frames(spark)
    empty_a = a.limit(0)
    empty_b = b.limit(0)
    assert delta_join(a, empty_a, b, empty_b, ["k"]).count() == 0


def test_composite_key(spark):
    a = spark.createDataFrame([(1, 10, "a")], ["k1", "k2", "va"])
    da = spark.createDataFrame([(1, 20, "a2")], ["k1", "k2", "va"])
    b = spark.createDataFrame([(1, 10, "b")], ["k1", "k2", "vb"])
    db = spark.createDataFrame([(1, 20, "b2")], ["k1", "k2", "vb"])
    rows = delta_join(a, da, b, db, ["k1", "k2"]).collect()
    assert _bag(rows) == _bag([(1, 20, "a2", "b2")])


def test_bases_never_shuffle_with_broadcast(spark):
    a, da, b, db = _frames(spark)
    plan = (
        delta_join(a, da, b, db, ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_validation(spark):
    a, da, b, db = _frames(spark)
    with pytest.raises(ValueError, match="non-empty"):
        delta_join(a, da, b, db, [])
    with pytest.raises(ValueError, match="missing from B"):
        delta_join(a, da, b.withColumnRenamed("k", "kk"), db, ["k"])
    with pytest.raises(ValueError, match="schemas differ"):
        delta_join(a, da.withColumnRenamed("va", "vx"), b, db, ["k"])
    with pytest.raises(ValueError, match="shared by both"):
        delta_join(
            a, da,
            b.withColumnRenamed("vb", "va"),
            db.withColumnRenamed("vb", "va"),
            ["k"],
        )

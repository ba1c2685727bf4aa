"""Point-in-time join edge cases (FIXTURES.md's mandated list):

- entities with no matching feature row -> left-join NULLs (J6)
- feature rows only after the entity timestamp must not leak (J1)
- equal event timestamps -> created_col tie-break (J3)
- TTL-expired rows excluded (J2)
- duplicate spine rows get identical features (row-id grain)
"""

import datetime as dt

import pytest
from pyspark.sql import Row

from tfx_addons_feast_examplegen_spark.operators.pit_join import point_in_time_join

T = dt.datetime


def _entities(spark, rows):
    return spark.createDataFrame(
        [Row(uid=u, ts=t) for u, t in rows], "uid long, ts timestamp"
    )


def _features(spark, rows):
    return spark.createDataFrame(
        [Row(uid=u, fts=t, created=c, val=v) for u, t, c, v in rows],
        "uid long, fts timestamp, created long, val double",
    )


def _join(ent, feat, **kw):
    defaults = dict(
        join_keys=["uid"],
        entity_ts_col="ts",
        feature_ts_col="fts",
        features=["val"],
        created_col="created",
    )
    defaults.update(kw)
    return point_in_time_join(ent, feat, **defaults)


def test_picks_latest_at_or_before(spark):
    ent = _entities(spark, [(1, T(2024, 1, 10))])
    feat = _features(
        spark,
        [
            (1, T(2024, 1, 1), 1, 10.0),
            (1, T(2024, 1, 9), 2, 20.0),   # latest at-or-before -> wins
            (1, T(2024, 1, 11), 3, 30.0),  # future: must not leak
        ],
    )
    [row] = _join(ent, feat).collect()
    assert row.val == 20.0


def test_exact_timestamp_match_included(spark):
    # as-of is <= (inclusive), per the reference's compiled template.
    ent = _entities(spark, [(1, T(2024, 1, 10))])
    feat = _features(spark, [(1, T(2024, 1, 10), 1, 42.0)])
    [row] = _join(ent, feat).collect()
    assert row.val == 42.0


def test_no_match_yields_null(spark):
    ent = _entities(spark, [(1, T(2024, 1, 10)), (2, T(2024, 1, 10))])
    feat = _features(spark, [(1, T(2024, 1, 5), 1, 1.0)])
    rows = {r.uid: r.val for r in _join(ent, feat).collect()}
    assert rows[1] == 1.0
    assert rows[2] is None


def test_tie_break_on_created_col(spark):
    ent = _entities(spark, [(1, T(2024, 1, 10))])
    feat = _features(
        spark,
        [
            (1, T(2024, 1, 9), 5, 50.0),
            (1, T(2024, 1, 9), 9, 90.0),  # same ts, newer created -> wins
        ],
    )
    [row] = _join(ent, feat).collect()
    assert row.val == 90.0


def test_ttl_excludes_stale_rows(spark):
    ent = _entities(spark, [(1, T(2024, 1, 10))])
    feat = _features(spark, [(1, T(2024, 1, 1), 1, 10.0)])  # 9 days old
    [row] = _join(ent, feat, ttl_seconds=7 * 24 * 3600).collect()
    assert row.val is None  # expired
    [row] = _join(ent, feat, ttl_seconds=30 * 24 * 3600).collect()
    assert row.val == 10.0  # within wider TTL


def test_ttl_boundary_inclusive(spark):
    # Lower bound is entity_ts - ttl, inclusive (>=), matching the
    # reference template's interval predicate.
    ent = _entities(spark, [(1, T(2024, 1, 10))])
    feat = _features(spark, [(1, T(2024, 1, 3), 1, 10.0)])  # exactly 7 days
    [row] = _join(ent, feat, ttl_seconds=7 * 24 * 3600).collect()
    assert row.val == 10.0


def test_duplicate_spine_rows_share_features(spark):
    ent = spark.createDataFrame(
        [Row(uid=1, ts=T(2024, 1, 10), tag="a"), Row(uid=1, ts=T(2024, 1, 10), tag="b")],
        "uid long, ts timestamp, tag string",
    )
    feat = _features(spark, [(1, T(2024, 1, 5), 1, 7.0)])
    rows = _join(ent, feat).collect()
    assert len(rows) == 2
    assert {r.tag for r in rows} == {"a", "b"}
    assert all(r.val == 7.0 for r in rows)


def test_multiple_entities_independent(spark):
    ent = _entities(spark, [(1, T(2024, 1, 10)), (2, T(2024, 1, 10))])
    feat = _features(
        spark,
        [(1, T(2024, 1, 9), 1, 10.0), (2, T(2024, 1, 8), 1, 20.0)],
    )
    rows = {r.uid: r.val for r in _join(ent, feat).collect()}
    assert rows == {1: 10.0, 2: 20.0}


def test_per_snapshot_asof(spark):
    # Same entity at two snapshot times sees different feature versions.
    ent = _entities(spark, [(1, T(2024, 1, 5)), (1, T(2024, 1, 20))])
    feat = _features(
        spark,
        [(1, T(2024, 1, 1), 1, 1.0), (1, T(2024, 1, 10), 2, 2.0)],
    )
    rows = {r.ts: r.val for r in _join(ent, feat).collect()}
    assert rows == {T(2024, 1, 5): 1.0, T(2024, 1, 20): 2.0}


def test_empty_features_rejected(spark):
    ent = _entities(spark, [(1, T(2024, 1, 10))])
    feat = _features(spark, [(1, T(2024, 1, 5), 1, 1.0)])
    from tfx_addons_feast_examplegen_spark.registry import RegistryError

    with pytest.raises(RegistryError):
        _join(ent, feat, features=[])

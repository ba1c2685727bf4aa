"""Property-based check: point_in_time_join vs an independent in-Python
reference implementation over randomized small datasets (SURVEY.md §5
property-testing strategy; hypothesis drives the data generation).

The Python model mirrors the reference's compiled SQL contract
(SURVEY.md §2.3): per (key, entity_ts), the candidate set is
{feature : f.ts <= e.ts [and f.ts >= e.ts - ttl]}, winner = max by
(ts, created), left-outer semantics.
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from tfx_addons_feast_examplegen_spark.operators.pit_join import point_in_time_join

BASE = dt.datetime(2024, 1, 1)

# timestamps on a coarse grid to force plenty of boundary/tie collisions
_ts = st.integers(min_value=0, max_value=20).map(
    lambda d: BASE + dt.timedelta(hours=6 * d)
)
_key = st.integers(min_value=1, max_value=4)

_entities = st.lists(st.tuples(_key, _ts), min_size=1, max_size=12)
# (key, ts, created, value) — created unique via list index later
_features = st.lists(
    st.tuples(_key, _ts, st.floats(allow_nan=False, allow_infinity=False,
                                   min_value=-100, max_value=100)),
    min_size=0,
    max_size=20,
)
_ttl = st.sampled_from([None, 6 * 3600, 24 * 3600, 7 * 24 * 3600])


def _model(entities, features, ttl_seconds):
    out = []
    for key, ets in entities:
        cands = [
            (fts, created, val)
            for (fkey, fts, created, val) in features
            if fkey == key
            and fts <= ets
            and (
                ttl_seconds is None
                or fts >= ets - dt.timedelta(seconds=ttl_seconds)
            )
        ]
        if cands:
            best = max(cands, key=lambda c: (c[0], c[1]))
            out.append((key, ets, best[2]))
        else:
            out.append((key, ets, None))
    return sorted(out, key=lambda t: (t[0], t[1], str(t[2])))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(entities=_entities, features=_features, ttl=_ttl)
def test_pit_join_matches_python_model(spark_prop, entities, features, ttl):
    spark = spark_prop
    feats = [
        (k, ts, i, v) for i, (k, ts, v) in enumerate(features)
    ]  # unique created per row -> deterministic tie-break
    ent_df = spark.createDataFrame(
        [Row(k=k, ts=ts) for k, ts in entities], "k long, ts timestamp"
    )
    feat_df = spark.createDataFrame(
        [Row(k=k, fts=ts, created=c, val=v) for k, ts, c, v in feats],
        "k long, fts timestamp, created long, val double",
    )
    got = point_in_time_join(
        ent_df,
        feat_df,
        join_keys=["k"],
        entity_ts_col="ts",
        feature_ts_col="fts",
        features=["val"],
        created_col="created",
        ttl_seconds=ttl,
    ).collect()
    got_sorted = sorted(
        ((r.k, r.ts, r.val) for r in got), key=lambda t: (t[0], t[1], str(t[2]))
    )
    assert got_sorted == _model(entities, feats, ttl)

import pytest

from tfx_addons_feast_examplegen_spark.registry import (
    FeatureService,
    FeatureView,
    Registry,
    RegistryError,
    testdata_registry as _testdata_registry,
)


def _reg():
    return _testdata_registry()


def test_resolve_refs_groups_by_view():
    out = _reg().resolve_features(
        ["user_events:value", "user_events:event_type", "customer_profile:c_acctbal"]
    )
    assert out == {
        "user_events": ["value", "event_type"],
        "customer_profile": ["c_acctbal"],
    }


def test_resolve_service():
    out = _reg().resolve_features("user_activity")
    assert out == {"user_events": ["value", "event_type"]}


def test_resolve_dedups_repeated_refs():
    out = _reg().resolve_features(["user_events:value", "user_events:value"])
    assert out == {"user_events": ["value"]}


@pytest.mark.parametrize(
    "features",
    [
        ["nope:value"],  # unknown view
        ["user_events:bogus"],  # unknown feature
        ["malformed_no_colon"],  # bad ref syntax
        "no_such_service",  # unknown service
        42,  # wrong type (component.py:98-102 analog)
    ],
)
def test_resolution_errors(features):
    with pytest.raises(RegistryError):
        _reg().resolve_features(features)


def test_yaml_roundtrip():
    reg = _reg()
    text = reg.to_yaml()
    back = Registry.from_yaml(text)
    assert set(back.views) == set(reg.views)
    assert set(back.services) == set(reg.services)
    v, b = reg.views["user_events_7d"], back.views["user_events_7d"]
    assert (b.entities, b.timestamp_col, b.created_col, b.ttl_seconds) == (
        v.entities,
        v.timestamp_col,
        v.created_col,
        v.ttl_seconds,
    )


def test_view_path_resolution():
    v = FeatureView(
        name="x", path="events.parquet", entities=("u",),
        timestamp_col="ts", features=("f",),
    )
    assert v.resolve_path("/data/sf1") == "/data/sf1/events.parquet"
    v2 = FeatureView(
        name="x", path="/abs/events.parquet", entities=("u",),
        timestamp_col="ts", features=("f",),
    )
    assert v2.resolve_path("/data/sf1") == "/abs/events.parquet"


def test_service_dataclass():
    s = FeatureService(name="s", features=("v:f",))
    assert s.features == ("v:f",)

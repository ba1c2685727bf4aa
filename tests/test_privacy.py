"""Privacy operators: k-anonymity audit, suppression, DP noisy counts."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators import privacy as pv

ROWS = [
    # (nation, segment, balance-bucket) with controlled class sizes
    *[("DE", "AUTO", b) for b in (1, 2, 3, 1, 2, 3)],  # n=6, l=3
    *[("DE", "HOME", 1) for _ in range(3)],  # n=3 (< k), l=1
    *[("FR", "AUTO", b) for b in (1, 1, 2, 2, 3)],  # n=5, l=3
    ("FR", "HOME", 9),  # n=1 (< k), l=1
]


def _df(spark):
    return spark.createDataFrame(ROWS, ["nation", "segment", "bucket"])


def test_audit_counts_and_verdicts(spark):
    got = {
        (r.nation, r.segment): (
            r.n, r.l_diversity, r.is_k_anonymous, r.is_l_diverse
        )
        for r in pv.k_anonymity_audit(
            _df(spark), ["nation", "segment"], k=5,
            sensitive_col="bucket", l=2,
        ).collect()
    }
    assert got == {
        ("DE", "AUTO"): (6, 3, True, True),
        ("DE", "HOME"): (3, 1, False, False),
        ("FR", "AUTO"): (5, 3, True, True),
        ("FR", "HOME"): (1, 1, False, False),
    }


def test_audit_without_sensitive_col(spark):
    cols = pv.k_anonymity_audit(_df(spark), ["nation"], k=5).columns
    assert cols == ["nation", "n", "is_k_anonymous"]


def test_audit_l_defaults_to_k(spark):
    r = {
        (x.nation, x.segment): x.is_l_diverse
        for x in pv.k_anonymity_audit(
            _df(spark), ["nation", "segment"], k=3, sensitive_col="bucket"
        ).collect()
    }
    # l defaults to k=3: only the classes with 3 distinct buckets pass
    assert r == {
        ("DE", "AUTO"): True,
        ("DE", "HOME"): False,
        ("FR", "AUTO"): True,
        ("FR", "HOME"): False,
    }


def test_suppression_nulls_only_small_classes(spark):
    out = pv.suppress_small_groups(_df(spark), ["nation", "segment"], k=5)
    rows = out.collect()
    assert len(rows) == len(ROWS)  # row count preserved
    suppressed = [r for r in rows if r.nation is None]
    kept = [r for r in rows if r.nation is not None]
    # the two under-k classes hold 3 + 1 rows; both QI columns go NULL
    assert len(suppressed) == 4
    assert all(r.segment is None for r in suppressed)
    # non-QI column untouched on suppressed rows
    assert sorted(r.bucket for r in suppressed) == [1, 1, 1, 9]
    # surviving classes are exactly the >= k ones
    assert {(r.nation, r.segment) for r in kept} == {
        ("DE", "AUTO"), ("FR", "AUTO")
    }


def test_suppression_handles_null_qi_values(spark):
    # NULL is a QI value like any other (eqNullSafe): a NULL-keyed class
    # of size >= k survives as-is.
    df = spark.createDataFrame(
        [(None, "X", i) for i in range(5)] + [("a", "X", 0)],
        ["nation", "segment", "bucket"],
    )
    out = pv.suppress_small_groups(df, ["nation", "segment"], k=5).collect()
    # the (None, X) class has 5 rows -> kept; ("a", X) has 1 -> suppressed
    assert sum(1 for r in out if r.segment == "X") == 5
    assert sum(1 for r in out if r.segment is None) == 1


def test_suppression_is_broadcast(spark):
    plan = (
        pv.suppress_small_groups(_df(spark), ["nation"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


def test_dp_counts_match_reference(spark):
    eps, salt = 0.5, "t"
    out = {
        (r.nation, r.segment): r.noisy_count
        for r in pv.dp_noisy_counts(
            _df(spark), ["nation", "segment"], epsilon=eps, salt=salt
        ).collect()
    }
    from collections import Counter

    counts = Counter((n, s) for n, s, _ in ROWS)
    for (n, s), c in counts.items():
        key = f"{n}\x1f{s}\x1f{salt}"
        u = (int(hashlib.md5(key.encode()).hexdigest()[:13], 16) + 0.5) / 2**52
        noise = (
            -(1 / eps)
            * math.copysign(1.0, u - 0.5)
            * math.log(1 - 2 * abs(u - 0.5))
        )
        assert out[(n, s)] == pytest.approx(round(c + noise, 4), abs=1e-9)


def test_dp_counts_salt_changes_draw_deterministically(spark):
    df = _df(spark)
    a1 = {
        tuple(r)[:2]: r.noisy_count
        for r in pv.dp_noisy_counts(df, ["nation"], salt="a").collect()
    }
    a2 = {
        tuple(r)[:2]: r.noisy_count
        for r in pv.dp_noisy_counts(df, ["nation"], salt="a").collect()
    }
    b = {
        tuple(r)[:2]: r.noisy_count
        for r in pv.dp_noisy_counts(df, ["nation"], salt="b").collect()
    }
    assert a1 == a2  # same salt replays exactly
    assert a1 != b  # new salt is a fresh draw


def test_dp_counts_hides_raw_count(spark):
    cols = pv.dp_noisy_counts(_df(spark), ["nation"]).columns
    assert cols == ["nation", "noisy_count"]


def test_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="k must"):
        pv.k_anonymity_audit(df, ["nation"], k=0)
    with pytest.raises(ValueError, match="non-empty"):
        pv.k_anonymity_audit(df, [])
    with pytest.raises(ValueError, match="l must"):
        pv.k_anonymity_audit(df, ["nation"], k=2, sensitive_col="bucket", l=0)
    with pytest.raises(ValueError, match="k must"):
        pv.suppress_small_groups(df, ["nation"], k=0)
    with pytest.raises(ValueError, match="epsilon"):
        pv.dp_noisy_counts(df, ["nation"], epsilon=0.0)
    with pytest.raises(ValueError, match="non-empty"):
        pv.dp_noisy_counts(df, [])


def test_pseudonymize_preserves_referential_integrity(spark):
    from tfx_addons_feast_examplegen_spark.operators.privacy import (
        pseudonymize_tables,
    )

    cust = spark.createDataFrame(
        [(i, f"n{i % 3}") for i in range(20)], ["ck", "nation"]
    )
    orders = spark.createDataFrame(
        [(i % 20, i * 10) for i in range(60)], ["ck", "amount"]
    )
    rel = pseudonymize_tables(
        {"c": (cust, "ck"), "o": (orders, "ck")}, salt="s1"
    )
    # same join cardinality and same per-nation aggregates as raw keys
    raw = (
        orders.join(cust, "ck").groupBy("nation")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("amt"))
    )
    rel_joined = (
        rel["o"].join(rel["c"], "ck").groupBy("nation")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("amt"))
    )
    assert sorted(map(tuple, raw.collect())) == sorted(
        map(tuple, rel_joined.collect())
    )
    # keys actually changed, injectively on this fixture
    released_keys = {r.ck for r in rel["c"].collect()}
    assert released_keys.isdisjoint(set(range(20)))
    assert len(released_keys) == 20


def test_pseudonymize_salt_changes_mapping(spark):
    from tfx_addons_feast_examplegen_spark.operators.privacy import (
        pseudonymize_tables,
    )

    df = spark.createDataFrame([(1,), (2,)], ["k"])
    a = {r.k for r in pseudonymize_tables({"t": (df, "k")}, salt="a")["t"].collect()}
    b = {r.k for r in pseudonymize_tables({"t": (df, "k")}, salt="b")["t"].collect()}
    a2 = {r.k for r in pseudonymize_tables({"t": (df, "k")}, salt="a")["t"].collect()}
    assert a == a2 and a != b


def test_pseudonymize_validation(spark):
    from tfx_addons_feast_examplegen_spark.operators.privacy import (
        pseudonymize_key,
    )

    with pytest.raises(ValueError, match="bits"):
        pseudonymize_key("k", salt="s", bits=0)

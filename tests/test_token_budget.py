"""Token-budget selection: equivalence with the global-Window spelling,
boundary/tie handling, and the no-global-sort plan claim."""

from __future__ import annotations

import random

import pytest

from tfx_addons_feast_examplegen_spark.operators.curation import (
    token_budget_select,
)


def _reference(rows, budget):
    cum, out = 0, set()
    for i, s, w in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += w
        if cum <= budget:
            out.add(i)
    return out


def _frame(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "score", "toks"])


@pytest.mark.parametrize("budget", [0, 37, 400, 10**9])
def test_matches_window_prefix(spark, budget):
    rng = random.Random(5)
    # heavy score ties (4 distinct values over 150 rows) so ties span
    # any would-be bucket boundary; zero weights included.
    rows = [
        (i, rng.choice([0.1, 0.5, 0.5, 0.9]), rng.randint(0, 20))
        for i in range(150)
    ]
    got = {
        r["doc_id"]
        for r in token_budget_select(
            _frame(spark, rows), "score", "toks", budget,
            id_col="doc_id", num_buckets=8, sample_fraction=1.0,
        ).collect()
    }
    assert got == _reference(rows, budget)


def test_stops_at_first_violation_not_after(spark):
    # greedy prefix: a huge row mid-order blocks everything after it,
    # even rows that would individually fit.
    rows = [(1, 3.0, 5), (2, 2.0, 1000), (3, 1.0, 5)]
    got = {
        r["doc_id"]
        for r in token_budget_select(
            _frame(spark, rows), "score", "toks", 20,
            id_col="doc_id", num_buckets=2, sample_fraction=1.0,
        ).collect()
    }
    assert got == {1}


def test_negative_weight_rejected(spark):
    rows = [(1, 1.0, 5), (2, 2.0, -1)]
    with pytest.raises(ValueError, match="negative weights"):
        token_budget_select(
            _frame(spark, rows), "score", "toks", 10,
            id_col="doc_id", sample_fraction=1.0,
        )


def test_null_scores_excluded(spark):
    df = spark.createDataFrame(
        [(1, 2.0, 5), (2, None, 5)],
        "doc_id: long, score: double, toks: long",
    )
    got = {
        r["doc_id"]
        for r in token_budget_select(
            df, "score", "toks", 100, id_col="doc_id", sample_fraction=1.0
        ).collect()
    }
    assert got == {1}


def test_full_buckets_plan_has_no_window(spark):
    # When the budget covers every bucket there is no boundary bucket,
    # so the plan must be a pure filter union — no Window, no global
    # sort anywhere. This is the operator's reason to exist.
    rows = [(i, float(i % 13), 1) for i in range(300)]
    sel = token_budget_select(
        _frame(spark, rows), "score", "toks", 10**9,
        id_col="doc_id", num_buckets=8, sample_fraction=1.0,
    )
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert sel.count() == 300


def test_boundary_bucket_window_is_bucket_scoped(spark):
    # With a boundary bucket, exactly one Window appears and it is
    # partitioned by the bucket column — never an empty partition spec
    # (the single-partition global sort this operator replaces).
    rows = [(i, float(i), 1) for i in range(300)]
    sel = token_budget_select(
        _frame(spark, rows), "score", "toks", 150,
        id_col="doc_id", num_buckets=8, sample_fraction=1.0,
    )
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 1
    assert "__bucket" in plan


def test_fractional_weights_exact_with_weight_scale(spark):
    from fractions import Fraction

    # Quarter-token weights engineered so cumulative sums graze the
    # budget exactly: in float, 0.1-style weights drift off by ulps;
    # in scaled-integer units the prefix is exact. The reference
    # replays the global window in exact rational arithmetic.
    rng = random.Random(11)
    rows = [
        (i, rng.choice([0.1, 0.5, 0.9]), rng.randrange(0, 40) / 4)
        for i in range(200)
    ]
    budget = 91.25  # 365 quarter-units — reachable exactly

    def ref(rows, budget):
        cum, out = Fraction(0), set()
        for i, s, w in sorted(rows, key=lambda r: (-r[1], r[0])):
            cum += Fraction(w).limit_denominator(4)
            if cum <= Fraction(budget).limit_denominator(4):
                out.add(i)
        return out

    got = {
        r["doc_id"]
        for r in token_budget_select(
            _frame(spark, rows), "score", "toks", budget,
            id_col="doc_id", num_buckets=8, sample_fraction=1.0,
            weight_scale=4,
        ).collect()
    }
    assert got == ref(rows, budget)


def test_fractional_weights_without_scale_fail_loud(spark):
    rows = [(1, 1.0, 0.5), (2, 0.5, 1.0)]
    with pytest.raises(ValueError, match="not integral"):
        token_budget_select(
            _frame(spark, rows), "score", "toks", 10,
            id_col="doc_id", num_buckets=2, sample_fraction=1.0,
        ).collect()
    with pytest.raises(ValueError, match="budget"):
        token_budget_select(
            _frame(spark, rows), "score", "toks", 10.3,
            id_col="doc_id", num_buckets=2, sample_fraction=1.0,
            weight_scale=2,
        )
    with pytest.raises(ValueError, match="weight_scale"):
        token_budget_select(
            _frame(spark, rows), "score", "toks", 10,
            id_col="doc_id", num_buckets=2, sample_fraction=1.0,
            weight_scale=0,
        )

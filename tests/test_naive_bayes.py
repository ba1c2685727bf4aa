"""Multinomial Naive Bayes fit/score: reference match, separability."""

from __future__ import annotations

import hashlib
import math

import pytest

from tfx_addons_feast_examplegen_spark.operators.text import (
    naive_bayes_fit_score,
)

N_BUCKETS = 64  # small bucket space so collisions are exercised


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:11], 16) % N_BUCKETS


def _ref(train, test):
    from collections import Counter, defaultdict

    counts: dict = defaultdict(Counter)
    tots: Counter = Counter()
    ndocs: Counter = Counter()
    for _, c, text in train:
        ndocs[c] += 1
        for tok in [t for t in text.lower().split(" ") if t]:
            b = _bucket(tok)
            counts[c][b] += 1
            tots[c] += 1
    n_train = sum(ndocs.values())
    out = {}
    for i, actual, text in test:
        best = None
        for c in sorted(tots):
            cost = math.floor(-math.log(ndocs[c] / n_train) * 1e6)
            for tok in [t for t in text.lower().split(" ") if t]:
                b = _bucket(tok)
                p = (counts[c][b] + 1) / (tots[c] + N_BUCKETS)
                cost += math.floor(-math.log(p) * 1e6)
            key = (cost, c)
            if best is None or key < best:
                best = key
        out[i] = (actual, best[1], best[1] == actual, best[0])
    return out


TRAIN = [
    (1, "spam", "buy cheap pills now buy now"),
    (2, "spam", "cheap pills cheap offer"),
    (3, "spam", "offer now buy offer"),
    (4, "ham", "meeting notes agenda review"),
    (5, "ham", "review the agenda before meeting"),
    (6, "ham", "notes from the review meeting"),
]
TEST = [
    (10, "spam", "cheap offer now"),
    (11, "ham", "agenda review notes"),
    (12, "spam", "buy pills"),
    (13, "ham", "meeting review"),
    (14, "spam", "unseen tokens only zzz qqq"),  # pure prior + default
]


def test_matches_reference_and_separates(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "y", "text"])
    test = spark.createDataFrame(TEST, ["doc_id", "y", "text"])
    got = {
        r.doc_id: (r.y, r.predicted, r.correct, r.cost_micronats)
        for r in naive_bayes_fit_score(
            train, test, "y", "text", "doc_id", n_buckets=N_BUCKETS
        ).collect()
    }
    assert got == _ref(TRAIN, TEST)
    # the separable test docs classify correctly
    for i in (10, 11, 12, 13):
        assert got[i][2] is True


def test_unseen_tokens_fall_to_prior(spark):
    # doc 14 has no trained tokens: every class pays the same default
    # per-token cost (up to tot_c differences), so the decision reduces
    # to prior + class-size effects — and must match the reference
    train = spark.createDataFrame(TRAIN, ["doc_id", "y", "text"])
    test = spark.createDataFrame(TEST, ["doc_id", "y", "text"])
    got = {
        r.doc_id: (r.predicted, r.cost_micronats)
        for r in naive_bayes_fit_score(
            train, test, "y", "text", "doc_id", n_buckets=N_BUCKETS
        ).collect()
    }
    ref = _ref(TRAIN, TEST)
    assert got[14] == (ref[14][1], ref[14][3])


def test_empty_text_test_docs_are_dropped(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "y", "text"])
    test = spark.createDataFrame(
        [(20, "ham", ""), (21, "ham", "review meeting")],
        ["doc_id", "y", "text"],
    )
    rows = naive_bayes_fit_score(
        train, test, "y", "text", "doc_id", n_buckets=N_BUCKETS
    ).collect()
    assert [r.doc_id for r in rows] == [21]


def test_model_is_broadcast(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "y", "text"])
    test = spark.createDataFrame(TEST, ["doc_id", "y", "text"])
    plan = (
        naive_bayes_fit_score(
            train, test, "y", "text", "doc_id", n_buckets=N_BUCKETS
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_validation(spark):
    df = spark.createDataFrame(TRAIN, ["doc_id", "y", "text"])
    with pytest.raises(ValueError, match="n_buckets"):
        naive_bayes_fit_score(df, df, "y", "text", "doc_id", n_buckets=1)

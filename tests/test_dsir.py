"""DSIR importance resampling: hand-computable model math, Gumbel-WOR
determinism, featureless-document contract, validation."""

import math

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.dsir import (
    dsir_log_ratios,
    dsir_select,
    hashed_ngram_features,
)


def test_hashed_ngram_features_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, ""), (3, None)], "doc_id: long, text: string"
    )
    # unigrams a,b,a + bigrams "a b","b a" -> 5 grams, 'a' twice
    feats = hashed_ngram_features(df, "doc_id", "text", buckets=1 << 20)
    rows = feats.collect()
    assert sum(r["cnt"] for r in rows) == 5
    assert {r["doc_id"] for r in rows} == {1}
    assert max(r["cnt"] for r in rows) == 2  # the 'a' bucket
    uni = hashed_ngram_features(df, "doc_id", "text", buckets=8, n_max=1)
    assert sum(r["cnt"] for r in uni.collect()) == 3


def test_log_ratio_model_exact_math(spark):
    # target = {"a"}, raw = {"a", "b"}: closed-form add-1 estimates
    b = 1 << 16
    target = spark.createDataFrame([(1, "a")], "doc_id: long, text: string")
    raw = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id: long, text: string"
    )
    tf = hashed_ngram_features(target, "doc_id", "text", buckets=b)
    rf = hashed_ngram_features(raw, "doc_id", "text", buckets=b)
    ratios = {
        r["bucket"]: r["log_ratio"]
        for r in dsir_log_ratios(tf, rf, buckets=b).collect()
    }
    bucket_a = tf.collect()[0]["bucket"]
    lr_a = math.log((2 / (1 + b)) / (2 / (2 + b)))
    assert ratios[bucket_a] == pytest.approx(lr_a, rel=1e-12)
    # every unseen bucket carries the pure smoothing ratio
    unseen = next(
        v for k, v in ratios.items()
        if k != bucket_a and abs(v - math.log((1 / (1 + b)) / (1 / (2 + b)))) < 1e-9
    )
    assert unseen == pytest.approx(math.log((2 + b) / (1 + b)), rel=1e-9)
    assert len(ratios) == b


def test_select_enriches_target_like_and_is_deterministic(spark):
    # raw pool: 40 docs of target-like vocabulary, 40 of off-target
    # vocabulary; target speaks only the first. Selection of 20 must be
    # strongly enriched (the weight gap is many nats; Gumbel noise is
    # O(ln n)) and exactly reproducible.
    tgt_words = ["alpha", "beta", "gamma", "delta"]
    off_words = ["omega", "psi", "chi", "phi"]
    raw_rows = []
    for i in range(40):
        w = [tgt_words[(i + k) % 4] for k in range(8)]
        raw_rows.append((i, " ".join(w)))
    for i in range(40, 80):
        w = [off_words[(i + k) % 4] for k in range(8)]
        raw_rows.append((i, " ".join(w)))
    raw = spark.createDataFrame(raw_rows, "doc_id: long, text: string")
    target = spark.createDataFrame(
        [(100 + i, " ".join(tgt_words)) for i in range(5)],
        "doc_id: long, text: string",
    )
    sel = dsir_select(
        raw, target, "doc_id", "text", n_select=20, buckets=4096
    )
    got = sel.collect()
    assert len(got) == 20
    ids = [r["doc_id"] for r in got]
    assert sum(1 for i in ids if i < 40) >= 18  # strong enrichment
    # keys strictly descending (WOR order) and replay-identical
    keys = [r["sample_key"] for r in got]
    assert keys == sorted(keys, reverse=True)
    again = [r["doc_id"] for r in sel.collect()]
    assert again == ids


def test_featureless_docs_score_zero_not_dropped(spark):
    raw = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, ""), (4, "omega psi chi")],
        "doc_id: long, text: string",
    )
    target = spark.createDataFrame(
        [(9, "alpha beta")], "doc_id: long, text: string"
    )
    out = dsir_select(raw, target, "doc_id", "text", n_select=4, buckets=64)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2]["log_weight"] == 0.0 and rows[3]["log_weight"] == 0.0
    assert rows[1]["log_weight"] > 0  # target-like beats the smoothed prior
    assert rows[4]["log_weight"] < 0  # off-target text scores negative


def test_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="n_select"):
        dsir_select(df, df, "doc_id", "text", n_select=0)
    with pytest.raises(ValueError, match="buckets"):
        hashed_ngram_features(df, "doc_id", "text", buckets=0)
    with pytest.raises(ValueError, match="n_max"):
        hashed_ngram_features(df, "doc_id", "text", buckets=8, n_max=3)
    with pytest.raises(ValueError, match="smoothing"):
        dsir_log_ratios(
            hashed_ngram_features(df, "doc_id", "text", buckets=8),
            hashed_ngram_features(df, "doc_id", "text", buckets=8),
            buckets=8,
            smoothing=0.0,
        )

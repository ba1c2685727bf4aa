"""Count-Min sketch: never-underestimate, mergeability, plan shape."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.sketches import (
    countmin_build,
    countmin_estimate,
)

W, D = 64, 4


def _data(spark, seed, n=4000, keyspace=500):
    rng = random.Random(seed)
    # zipf-ish skew: a few hot keys plus a long tail
    keys = [rng.randint(0, 9) if rng.random() < 0.3 else rng.randint(0, keyspace)
            for _ in range(n)]
    return keys, spark.createDataFrame([(k,) for k in keys], "k: long")


def test_never_underestimates_and_bounded(spark):
    keys, df = _data(spark, 1)
    exact = Counter(keys)
    sk = countmin_build(df, "k", width=W, depth=D)
    qdf = spark.createDataFrame([(k,) for k in sorted(exact)], "k: long")
    est = {
        r["k"]: r["cm_est"]
        for r in countmin_estimate(sk, qdf, "k", width=W, depth=D).collect()
    }
    n = len(keys)
    for k, true in exact.items():
        assert est[k] >= true, (k, est[k], true)
        # e*N/W per-row bound; min over D rows makes exceeding it on
        # ALL rows astronomically unlikely — a deterministic fixture
        # check with huge margin (3x), not a probabilistic flake.
        assert est[k] <= true + 3 * 2.72 * n / W, (k, est[k], true)


def test_unseen_key_estimate_is_collision_mass_only(spark):
    _, df = _data(spark, 2, n=50, keyspace=10)
    sk = countmin_build(df, "k", width=W, depth=D)
    qdf = spark.createDataFrame([(10**6,), (10**6 + 1,)], "k: long")
    for r in countmin_estimate(sk, qdf, "k", width=W, depth=D).collect():
        assert r["cm_est"] >= 0


def test_mergeable_cellwise(spark):
    # sketch(A) + sketch(B) cell-wise == sketch(A union B): the
    # property that lets shards/days build independently.
    _, a = _data(spark, 3, n=1500)
    _, b = _data(spark, 4, n=1500)
    sa = countmin_build(a, "k", width=W, depth=D)
    sb = countmin_build(b, "k", width=W, depth=D)
    merged = (
        sa.unionByName(sb)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = countmin_build(a.unionByName(b), "k", width=W, depth=D)
    m = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    d = {(r["row"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert m == d


def test_param_validation(spark):
    df = spark.createDataFrame([(1,)], "k: long")
    with pytest.raises(ValueError):
        countmin_build(df, "k", width=0)
    with pytest.raises(ValueError):
        countmin_build(df, "k", width=8, depth=5)
    with pytest.raises(ValueError):
        countmin_estimate(df.limit(0), df, "k", width=8, depth=0)


def test_estimate_plan_broadcasts_sketch(spark):
    _, df = _data(spark, 5, n=200)
    sk = countmin_build(df, "k", width=W, depth=D)
    est = countmin_estimate(sk, df.select("k").distinct(), "k", width=W, depth=D)
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_join_size_never_underestimates(spark):
    keys_a, a = _data(spark, 11, n=2000, keyspace=300)
    keys_b, b = _data(spark, 12, n=2000, keyspace=300)
    from tfx_addons_feast_examplegen_spark.operators.sketches import (
        countmin_join_size,
    )

    ca, cb = Counter(keys_a), Counter(keys_b)
    true = sum(ca[k] * cb[k] for k in ca)
    ska = countmin_build(a, "k", width=W, depth=D)
    skb = countmin_build(b, "k", width=W, depth=D)
    [r] = countmin_join_size(ska, skb, depth=D).collect()
    assert r["cm_join_est"] >= true
    # depth=1 is a single-row estimate: strictly no tighter than min-of-4
    [r1] = countmin_join_size(
        countmin_build(a, "k", width=W, depth=1),
        countmin_build(b, "k", width=W, depth=1),
        depth=1,
    ).collect()
    assert r1["cm_join_est"] >= r["cm_join_est"] >= true


def test_join_size_disjoint_keys_can_prove_empty(spark):
    # disjoint key ranges: collisions may alias buckets, but with a
    # sparse fill (20 keys into 64 buckets x 4 rows) some row almost
    # surely misses — and when every row overlaps the estimate is
    # still a sound (>=0) upper bound. Deterministic seed: assert the
    # exact behavior, not a probability.
    from tfx_addons_feast_examplegen_spark.operators.sketches import (
        countmin_join_size,
    )

    a = spark.createDataFrame([(k,) for k in range(20)], "k: long")
    b = spark.createDataFrame([(k,) for k in range(10**9, 10**9 + 20)], "k: long")
    ska = countmin_build(a, "k", width=W, depth=D)
    skb = countmin_build(b, "k", width=W, depth=D)
    [r] = countmin_join_size(ska, skb, depth=D).collect()
    assert r["cm_join_est"] >= 0  # sound
    # identical sketches joined with themselves: est >= true self-join
    [rs] = countmin_join_size(ska, ska, depth=D).collect()
    assert rs["cm_join_est"] >= 20


# ---------------------------------------------------------------------------
# One-permutation MinHash corpus sketch
# ---------------------------------------------------------------------------

from tfx_addons_feast_examplegen_spark.operators.sketches import (  # noqa: E402
    minhash_corpus_overlap,
    minhash_corpus_sketch,
)


def _corpora(spark, seed=7, n_docs=300, vocab=3000, shared_frac=0.5):
    # Two corpora drawing shingle words from vocabularies with a known
    # overlap fraction: corpus A uses words [0, vocab), corpus B uses
    # words [vocab*(1-shared_frac), vocab*(2-shared_frac)).
    rng = random.Random(seed)
    off = int(vocab * (1 - shared_frac))
    rows = []
    for i in range(n_docs):
        words = [f"w{rng.randint(0, vocab - 1)}" for _ in range(40)]
        rows.append(("A", " ".join(words)))
        words = [f"w{off + rng.randint(0, vocab - 1)}" for _ in range(40)]
        rows.append(("B", " ".join(words)))
    return spark.createDataFrame(rows, "corpus: string, text: string")


def test_minhash_overlap_estimates_planted_jaccard(spark):
    df = _corpora(spark)
    sk = minhash_corpus_sketch(df, "corpus", "text", k=256, shingle_n=1)
    # exact Jaccard of the distinct unigram sets, computed brute-force
    rows = df.collect()
    sets = {"A": set(), "B": set()}
    for r in rows:
        sets[r["corpus"]] |= set(r["text"].lower().split(" "))
    true_j = len(sets["A"] & sets["B"]) / len(sets["A"] | sets["B"])
    est = minhash_corpus_overlap(sk, "corpus").collect()
    assert len(est) == 1
    r = est[0]
    assert (r["group_a"], r["group_b"]) == ("A", "B")
    assert r["matched"] <= r["both_filled"] <= 256
    # k=256, |A∪B| >> k (the documented operating regime):
    # s.e. ~ sqrt(J(1-J)/k) ~ 0.03; allow ~3 sigma
    assert abs(r["jaccard_e4"] - true_j) < 0.09, (r["jaccard_e4"], true_j)


def test_minhash_sketch_is_mergeable_cellwise(spark):
    df = _corpora(spark, seed=9)
    whole = minhash_corpus_sketch(df, "corpus", "text", k=64)
    half1 = minhash_corpus_sketch(df.limit(80), "corpus", "text", k=64)
    half2 = minhash_corpus_sketch(
        df.subtract(df.limit(80)), "corpus", "text", k=64
    )
    # subtract() drops duplicate rows the limit kept once — min is
    # duplicate-insensitive, so the merged minima still equal whole's
    merged = (
        half1.unionByName(half2)
        .groupBy("corpus", "bucket")
        .agg(F.min("min_h").alias("min_h"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_minhash_identical_corpora_match_every_bucket(spark):
    rows = [("X", "a b c d e f g"), ("Y", "a b c d e f g")]
    df = spark.createDataFrame(rows, "corpus: string, text: string")
    est = minhash_corpus_overlap(
        minhash_corpus_sketch(df, "corpus", "text", k=32, shingle_n=2),
        "corpus",
    ).collect()
    assert len(est) == 1
    r = est[0]
    assert r["matched"] == r["both_filled"] == r["filled_a"] == r["filled_b"]
    assert r["jaccard_e4"] == 1.0


def test_minhash_param_validation(spark):
    df = spark.createDataFrame([("A", "x y z")], "corpus: string, text: string")
    with pytest.raises(ValueError):
        minhash_corpus_sketch(df, "corpus", "text", k=0)
    with pytest.raises(ValueError):
        minhash_corpus_sketch(df, "corpus", "text", shingle_n=0)

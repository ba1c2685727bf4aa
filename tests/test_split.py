from pyspark.sql import Row

from tfx_addons_feast_examplegen_spark.operators.split import (
    fingerprint_split,
    hash_split,
    split_counts,
)


def _df(spark, n=1000):
    return spark.createDataFrame([Row(k=i) for i in range(n)], "k long")


def test_hash_split_deterministic(spark):
    df = _df(spark)
    a = {r.k: r.split for r in hash_split(df, ["k"]).collect()}
    b = {r.k: r.split for r in hash_split(df, ["k"]).collect()}
    assert a == b  # stable across runs


def test_hash_split_partitions_all_rows(spark):
    df = _df(spark)
    counts = {r.split: r.n for r in split_counts(hash_split(df, ["k"])).collect()}
    assert sum(counts.values()) == 1000
    assert set(counts) == {"train", "eval"}
    # 2:1 buckets -> roughly 2/3 train (hash mixing, generous bounds)
    assert 0.55 < counts["train"] / 1000 < 0.78


def test_hash_split_seed_changes_assignment(spark):
    df = _df(spark)
    a = {r.k: r.split for r in hash_split(df, ["k"], seed=1).collect()}
    b = {r.k: r.split for r in hash_split(df, ["k"], seed=2).collect()}
    assert a != b


def test_custom_split_config(spark):
    df = _df(spark)
    splits = [("train", 8), ("eval", 1), ("test", 1)]
    counts = {
        r.split: r.n
        for r in split_counts(hash_split(df, ["k"], splits)).collect()
    }
    assert set(counts) == {"train", "eval", "test"}
    assert counts["train"] > counts["eval"]


def test_fingerprint_split_matches_formula(spark):
    df = _df(spark, 100)
    rows = {r.k: r.split for r in fingerprint_split(df, "k").collect()}
    for k, split in rows.items():
        bucket = ((k * 2654435761) % (2**31)) % 3
        assert split == ("train" if bucket < 2 else "eval")

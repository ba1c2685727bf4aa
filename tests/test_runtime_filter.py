"""Bloom runtime-filter prejoin: guarantees and plan shape.

The operator's contract has three parts, tested separately because the
driver oracle can only see final values: (1) NO false negatives — the
prefilter is a safe semi-join surrogate; (2) it actually REDUCES the
probe side (that's its whole purpose at scale); (3) the bitmap attach
plans as a one-row broadcast, adding no shuffle to the probe side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.runtime_filter import (
    bloom_prefilter,
    build_bloom_bitmap,
)


def _fixture(spark):
    probe = spark.range(0, 5000).select(F.col("id").alias("k"))
    build = spark.range(0, 5000).where(F.col("id") % 25 == 0).select(
        F.col("id").alias("k")
    )
    return probe, build


def test_no_false_negatives(spark):
    probe, build = _fixture(spark)
    bloom = build_bloom_bitmap(build, "k", n_bits=1 << 12, n_hashes=5)
    passed = {
        r["k"]
        for r in bloom_prefilter(
            probe, "k", bloom, n_bits=1 << 12, n_hashes=5
        ).collect()
    }
    expected = {r["k"] for r in build.collect()}
    assert expected <= passed


def test_reduction_and_bounded_false_positives(spark):
    probe, build = _fixture(spark)
    # 200 keys in a 2^12-bit filter with k=5: theoretical FP ~ 2.6e-3;
    # assert an order-of-magnitude slack so hash luck can't flake.
    bloom = build_bloom_bitmap(build, "k", n_bits=1 << 12, n_hashes=5)
    n_pass = bloom_prefilter(
        probe, "k", bloom, n_bits=1 << 12, n_hashes=5
    ).count()
    n_true = build.count()
    assert n_true <= n_pass <= n_true + int(5000 * 0.03)


def test_exact_join_after_prefilter_matches_plain_join(spark):
    probe, build = _fixture(spark)
    bloom = build_bloom_bitmap(build, "k", n_bits=1 << 12, n_hashes=5)
    pre = bloom_prefilter(probe, "k", bloom, n_bits=1 << 12, n_hashes=5)
    via_bloom = sorted(
        r["k"] for r in pre.join(build, "k", "inner").collect()
    )
    plain = sorted(r["k"] for r in probe.join(build, "k", "inner").collect())
    assert via_bloom == plain


def test_empty_build_side_filters_everything(spark):
    probe, build = _fixture(spark)
    empty = build.where(F.lit(False))
    bloom = build_bloom_bitmap(empty, "k", n_bits=1 << 12, n_hashes=5)
    assert bloom_prefilter(
        probe, "k", bloom, n_bits=1 << 12, n_hashes=5
    ).count() == 0


def test_null_keys_set_no_bits_and_never_pass(spark):
    build = spark.createDataFrame(
        [(1,), (None,), (2,)], "k: bigint"
    )
    probe = spark.createDataFrame([(1,), (2,), (None,), (3,)], "k: bigint")
    bloom = build_bloom_bitmap(build, "k", n_bits=1 << 10, n_hashes=3)
    got = sorted(
        r["k"]
        for r in bloom_prefilter(
            probe, "k", bloom, n_bits=1 << 10, n_hashes=3
        ).collect()
        if r["k"] in (1, 2, None)
    )
    # 1 and 2 must pass; NULL must not (xxhash64 of NULL is the seed
    # itself, but semi-join semantics say NULL never matches).
    assert got == [1, 2]


def test_param_validation():
    with pytest.raises(ValueError):
        build_bloom_bitmap(None, "k", n_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        build_bloom_bitmap(None, "k", n_hashes=0)


def test_prefilter_is_a_pure_mapside_filter(spark):
    # The whole point of constant-embedding the bitmap (vs the rejected
    # one-row broadcast-join attach, which memcpy'd the bitmap into
    # every joined row — 20x slower at 50M rows, see operator
    # docstring): the probe plan must contain NO join operator and NO
    # exchange — just Filter over the probe's own tree.
    probe, build = _fixture(spark)
    bloom = build_bloom_bitmap(build, "k", n_bits=1 << 12, n_hashes=5)
    pre = bloom_prefilter(probe, "k", bloom, n_bits=1 << 12, n_hashes=5)
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan
    assert "Filter" in plan, plan

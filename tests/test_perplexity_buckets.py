"""perplexity_bucket_filter: bucket populations, ordering, contracts, plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.text import (
    perplexity_bucket_filter,
)


def _docs(spark):
    rows = []
    # 30 natural docs (common transitions), 10 shuffled/templated ones
    for i in range(30):
        rows.append((i, "the cat sat on the mat and the dog ran"))
    for i in range(30, 40):
        rows.append((i, f"zz{i} qq{i} xx{i} zz{i} vv{i} kk{i}"))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_buckets_are_equal_population_and_ordered(spark):
    out = perplexity_bucket_filter(
        _docs(spark), n_buckets=4, keep_buckets=(1, 2), num_buckets=4
    ).collect()
    assert len(out) == 40
    sizes = {}
    for r in out:
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    assert sizes == {1: 10, 2: 10, 3: 10, 4: 10}
    # buckets are ordered by average NLL: every doc in bucket b has
    # avg <= every doc in bucket b+1 (ties broken by id inside the key)
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["avg_micro_nats"])
    for b in (1, 2, 3):
        assert max(by_bucket[b]) <= min(by_bucket[b + 1])
    # keep flags exactly the requested buckets
    for r in out:
        assert r["keep"] == (r["bucket"] in (1, 2))
    # the rare-transition docs are the most perplex: all in the tail
    tail_ids = {r["doc_id"] for r in out if r["bucket"] == 4}
    assert tail_ids == set(range(30, 40))


def test_short_docs_are_absent(spark):
    df = spark.createDataFrame(
        [(0, "one two three"), (1, "solo"), (2, "")],
        "doc_id bigint, text string",
    )
    out = perplexity_bucket_filter(df, n_buckets=2, keep_buckets=(1,))
    assert {r["doc_id"] for r in out.collect()} == {0}


def test_contracts(spark):
    from pyspark.errors import PySparkException

    df = _docs(spark)
    with pytest.raises(ValueError, match="n_buckets"):
        perplexity_bucket_filter(df, n_buckets=1)
    with pytest.raises(ValueError, match="keep_buckets"):
        perplexity_bucket_filter(df, n_buckets=3, keep_buckets=(0, 5))
    with pytest.raises(ValueError, match="keep_buckets"):
        perplexity_bucket_filter(df, n_buckets=3, keep_buckets=())
    # out-of-range id breaks the composite key LOUD
    neg = spark.createDataFrame(
        [(-1, "a b c d"), (2, "a b c d")], "doc_id bigint, text string"
    )
    with pytest.raises(PySparkException, match="outside \\[0, 2\\^32\\)"):
        perplexity_bucket_filter(neg).collect()


def test_plan_has_no_global_ntile_window(spark):
    out = perplexity_bucket_filter(_docs(spark), num_buckets=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ntile(" not in plan, plan
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            child = lines[i + 1] if i + 1 < len(lines) else ""
            assert (
                "HashAggregate(keys=[]" in child and "partial_" in child
            ), (line, child)

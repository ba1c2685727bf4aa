"""Global row-id assignment: density, order, determinism, plan shape.

The operator's whole reason to exist is removing the single-partition
global Window — so beyond value checks (ids == global ROW_NUMBER - 1)
the suite pins the PLAN: no SinglePartition exchange may appear in the
assignment job.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.rowid import (
    assign_global_row_ids,
)


def _expected(df, order_col):
    w = Window.orderBy(F.col(order_col).asc_nulls_first())
    return {
        tuple(r)
        for r in df.withColumn(
            "row_id", (F.row_number().over(w) - 1).cast("long")
        ).collect()
    }


def test_ids_match_global_row_number(spark):
    # shuffled, gappy key space so bucket boundaries land mid-range
    df = spark.range(0, 3000).select(
        ((F.col("id") * 2654435761) % 97003).alias("k")
    ).distinct()
    got = assign_global_row_ids(df, "k", id_col="row_id", num_buckets=8)
    assert {tuple(r) for r in got.collect()} == _expected(df, "k")


def test_ids_are_dense_zero_based(spark):
    df = spark.range(0, 500).select((F.col("id") + 1000).alias("k"))
    ids = sorted(
        r["row_id"]
        for r in assign_global_row_ids(df, "k", num_buckets=4).collect()
    )
    assert ids == list(range(500))


def test_null_keys_rank_first(spark):
    df = spark.createDataFrame([(None,), (5,), (1,), (None,), (3,)],
                               "k: bigint")
    got = assign_global_row_ids(df, "k", num_buckets=2).collect()
    by_key = sorted(got, key=lambda r: (r["k"] is not None, r["k"] or 0))
    assert sorted(r["row_id"] for r in by_key[:2]) == [0, 1]  # the NULLs
    assert [r["row_id"] for r in by_key[2:]] == [2, 3, 4]


def test_single_bucket_and_empty_input(spark):
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    got = assign_global_row_ids(df, "k", num_buckets=1).collect()
    assert sorted((r["k"], r["row_id"]) for r in got) == [
        (i, i) for i in range(10)
    ]
    empty = df.where(F.lit(False))
    assert assign_global_row_ids(empty, "k", num_buckets=4).count() == 0


def test_validation(spark):
    df = spark.range(3).select(F.col("id").alias("k"),
                               F.lit("x").alias("s"))
    with pytest.raises(ValueError):
        assign_global_row_ids(df, "k", num_buckets=0)
    with pytest.raises(ValueError):
        assign_global_row_ids(df, "missing")
    with pytest.raises(ValueError):
        assign_global_row_ids(df, "s")  # non-numeric order col
    with pytest.raises(ValueError):
        assign_global_row_ids(df, "k", id_col="s")  # collision


def test_no_single_partition_stage_in_assignment_plan(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    got = assign_global_row_ids(df, "k", num_buckets=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    # exactly the one hash exchange on the bucket id
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # while the naive spelling DOES globally funnel:
    naive = df.withColumn(
        "row_id", F.row_number().over(Window.orderBy("k"))
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert ("Exchange SinglePartition" in naive_plan
            or "rangepartitioning" in naive_plan)

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


def test_exact_ntile_matches_sql_ntile(spark):
    import random

    rng = random.Random(2207)
    from tfx_addons_feast_examplegen_spark.operators.rowid import (
        exact_ntile,
    )

    # unique keys, sizes that exercise both the q+1 head and the q tail
    for n_rows, n_tiles in [(97, 8), (100, 10), (5, 8), (1, 3), (24, 24)]:
        keys = rng.sample(range(10_000), n_rows)
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        got = {
            r["k"]: r["ntile"]
            for r in exact_ntile(df, "k", n_tiles, num_buckets=4).collect()
        }
        want = {
            r["k"]: r["t"]
            for r in df.withColumn(
                "t", F.ntile(n_tiles).over(Window.orderBy("k"))
            ).collect()
        }
        assert got == want, (n_rows, n_tiles)

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="n_tiles"):
        exact_ntile(df, "k", 0)
    with pytest.raises(ValueError, match="already present"):
        exact_ntile(df, "k", 2, tile_col="k")


def test_exact_ntile_plan_has_no_single_partition_stage(spark):
    from tfx_addons_feast_examplegen_spark.operators.rowid import (
        exact_ntile,
    )

    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    got = exact_ntile(df, "k", 8, num_buckets=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_ntile_entry_plans_have_no_single_partition_window(spark, sf_dir):
    # VERDICT r14 items 2-3: the three formerly-global-NTILE entries
    # must plan with no unpartitioned Window / SinglePartition exchange
    # (these are the §2.9 rows users copy as the scale-safe spelling).
    from tfx_addons_feast_examplegen_spark import queries as q

    for name in (
        "length_bucketing",
        "epoch_shuffle_shards",
        "revenue_concentration",
    ):
        df = q.queries()[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # no NTILE window function survives anywhere
        assert "ntile(" not in plan, (name, plan)
        # every SinglePartition exchange must be the benign 1-row
        # global-aggregate shape (its child a keys=[] PARTIAL agg, so
        # one combined row per task crosses the wire) — never a
        # data-sized sort/window funnel
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" not in line:
                continue
            child = lines[i + 1] if i + 1 < len(lines) else ""
            assert (
                "HashAggregate(keys=[]" in child and "partial_" in child
            ), (name, line, child)
        # and no sort feeds a single partition: global Sort prints as
        # 'Sort [...], true, 0' under a SinglePartition exchange — the
        # only Sorts allowed are the bucket-local (non-global) ones
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" in line:
                assert "Sort [" not in (
                    lines[i + 1] if i + 1 < len(lines) else ""
                ), (name, plan)


def test_exact_quantiles_matches_sorted_model(spark):
    import math
    import random

    from tfx_addons_feast_examplegen_spark.operators.rowid import (
        exact_quantiles,
    )

    rng = random.Random(2311)
    for trial in range(3):
        vals = [rng.randrange(1000) for _ in range(rng.randint(1, 200))]
        rows = [(v,) for v in vals] + [(None,)] * 3
        df = spark.createDataFrame(rows, "v long")
        qs = (0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
        got = {r["q"]: r["value"] for r in exact_quantiles(df, "v", qs).collect()}
        s = sorted(vals)
        want = {q: s[math.ceil(q * len(s)) - 1] for q in qs}
        assert got == want, (trial, vals)

    # two quantiles landing on the same rank both come back
    one = spark.createDataFrame([(7,)], "v long")
    out = exact_quantiles(one, "v", (0.5, 1.0)).collect()
    assert [(r["q"], r["value"]) for r in out] == [(0.5, 7), (1.0, 7)]

    with pytest.raises(ValueError, match="non-empty"):
        exact_quantiles(one, "v", ())
    with pytest.raises(ValueError, match="in \\(0, 1\\]"):
        exact_quantiles(one, "v", (0.0,))
    empty = spark.createDataFrame([(None,)], "v long")
    with pytest.raises(ValueError, match="no non-null"):
        exact_quantiles(empty, "v")


def test_exact_quantiles_plan_has_no_single_partition_stage(spark):
    from tfx_addons_feast_examplegen_spark.operators.rowid import (
        exact_quantiles,
    )

    df = spark.range(0, 5000).select(F.col("id").alias("v"))
    got = exact_quantiles(df, "v", (0.5, 0.9), num_buckets=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the final orderBy("q") sorts <= len(quantiles) rows — range
    # partitioning over a frame that tiny is not a funnel; what must
    # NOT appear is a SinglePartition exchange over the data
    assert "Exchange SinglePartition" not in plan, plan


def test_grouped_exact_ntile_matches_sql_ntile(spark):
    import random

    from tfx_addons_feast_examplegen_spark.operators.rowid import (
        grouped_exact_ntile,
    )

    rng = random.Random(2313)
    rows = []
    k = 0
    # uneven groups incl. a NULL group and sizes below/above n_tiles
    for g, size in [("a", 23), ("b", 4), (None, 9), ("c", 1)]:
        for _ in range(size):
            rows.append((k, g))
            k += 1
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "key long, grp string")
    got = {
        (r["grp"], r["key"]): r["ntile"]
        for r in grouped_exact_ntile(
            df, ["grp"], "key", 5, num_buckets=4
        ).collect()
    }
    w = Window.partitionBy("grp").orderBy("key")
    want = {
        (r["grp"], r["key"]): r["t"]
        for r in df.withColumn("t", F.ntile(5).over(w)).collect()
    }
    assert got == want

    with pytest.raises(ValueError, match="n_tiles"):
        grouped_exact_ntile(df, ["grp"], "key", 0)
    with pytest.raises(ValueError, match="already present"):
        grouped_exact_ntile(df, ["grp"], "key", 2, tile_col="grp")


def test_sorted_neighborhood_pairs_match_window_model(spark):
    from tfx_addons_feast_examplegen_spark.operators.rowid import (
        sorted_neighborhood_pairs,
    )

    # gappy shuffled keyspace; window 4 => pairs at rank distance 1-3
    df = spark.range(0, 300).select(
        ((F.col("id") * 2654435761) % 9973).alias("k")
    ).distinct()
    got = sorted_neighborhood_pairs(df, "k", window=4, num_buckets=8)
    rows = got.collect()
    keys = sorted(r["k"] for r in df.collect())
    want = {
        (keys[i], keys[j])
        for i in range(len(keys))
        for j in range(i + 1, min(i + 4, len(keys)))
    }
    gotset = {(r["k_a"], r["k_b"]) for r in rows}
    assert gotset == want
    # no duplicate pair rows (the banded join must not double-emit)
    assert len(rows) == len(gotset)
    # ranks consistent with order: rank_b - rank_a in [1, 3]
    assert all(1 <= r["rank_b"] - r["rank_a"] <= 3 for r in rows)


def test_sorted_neighborhood_window_two_is_adjacent_only(spark):
    from tfx_addons_feast_examplegen_spark.operators.rowid import (
        sorted_neighborhood_pairs,
    )

    df = spark.range(0, 50).select(F.col("id").alias("k"))
    got = sorted_neighborhood_pairs(df, "k", window=2, num_buckets=4)
    assert {(r["k_a"], r["k_b"]) for r in got.collect()} == {
        (i, i + 1) for i in range(49)
    }
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "k", window=1)


def test_sorted_neighborhood_plan_no_single_partition(spark):
    from tfx_addons_feast_examplegen_spark.operators.rowid import (
        sorted_neighborhood_pairs,
    )

    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    got = sorted_neighborhood_pairs(df, "k", window=5, num_buckets=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_prefix_sum_matches_global_window(spark):
    from tfx_addons_feast_examplegen_spark.operators.rowid import prefix_sum

    df = spark.range(0, 3000).select(
        ((F.col("id") * 2654435761) % 97003).alias("k"),
        ((F.col("id") % 17) - 8).alias("v"),
    ).withColumn("v", F.col("v").cast("int")).dropDuplicates(["k"])
    got = prefix_sum(df, "k", "v", out_col="cum", num_buckets=8)
    w = Window.orderBy(F.col("k").asc_nulls_first()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("v").over(w).cast("long"))
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }


def test_prefix_sum_contracts(spark):
    from pyspark.errors import PySparkException

    from tfx_addons_feast_examplegen_spark.operators.rowid import prefix_sum

    df = spark.createDataFrame([(1, 2)], "k int, v int")
    with pytest.raises(ValueError, match="integer-typed"):
        prefix_sum(
            df.select("k", F.col("v").cast("double").alias("v")), "k", "v"
        )
    with pytest.raises(ValueError, match="not in"):
        prefix_sum(df, "k", "zz")
    with pytest.raises(ValueError, match="already present"):
        prefix_sum(df.withColumn("cum", F.lit(1)), "k", "v")
    nulls = spark.createDataFrame([(1, 2), (2, None)], "k int, v int")
    with pytest.raises(PySparkException, match="NULL"):
        prefix_sum(nulls, "k", "v").collect()


def test_prefix_sum_plan_no_single_partition(spark):
    from tfx_addons_feast_examplegen_spark.operators.rowid import prefix_sum

    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 5).cast("int").alias("v")
    )
    got = prefix_sum(df, "k", "v", num_buckets=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_grouped_prefix_sum_matches_partitioned_window(spark):
    from tfx_addons_feast_examplegen_spark.operators.rowid import (
        grouped_prefix_sum,
    )

    # skewed groups (one holds ~70%) + a NULL group
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 < 7, F.lit("big"))
        .when(F.col("id") % 10 < 9, F.lit("small"))
        .otherwise(F.lit(None))
        .alias("g"),
        ((F.col("id") % 13) + 1).cast("int").alias("v"),
    )
    got = grouped_prefix_sum(df, ["g"], "k", "v", num_buckets=8)
    w = (
        Window.partitionBy("g")
        .orderBy(F.col("k").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum", F.sum("v").over(w).cast("long"))
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }


def test_grouped_prefix_sum_contracts(spark):
    from pyspark.errors import PySparkException

    from tfx_addons_feast_examplegen_spark.operators.rowid import (
        grouped_prefix_sum,
    )

    df = spark.createDataFrame([(1, "a", 2)], "k int, g string, v int")
    with pytest.raises(ValueError, match="group_cols"):
        grouped_prefix_sum(df, [], "k", "v")
    with pytest.raises(ValueError, match="integer-typed"):
        grouped_prefix_sum(
            df.select("k", "g", F.col("v").cast("double").alias("v")),
            ["g"], "k", "v",
        )
    nulls = spark.createDataFrame(
        [(1, "a", 2), (2, "a", None)], "k int, g string, v int"
    )
    with pytest.raises(PySparkException, match="NULL"):
        grouped_prefix_sum(nulls, ["g"], "k", "v").collect()
    wide = spark.range(0, 200).select(
        F.col("id").alias("k"),
        F.col("id").cast("string").alias("g"),
        F.lit(1).cast("int").alias("v"),
    )
    with pytest.raises(ValueError, match="max_offset_entries"):
        grouped_prefix_sum(
            wide, ["g"], "k", "v", num_buckets=4, max_offset_entries=10
        )


def test_grouped_exact_quantiles_match_sorted_model(spark):
    import math
    import random as _random

    from tfx_addons_feast_examplegen_spark.operators.rowid import (
        grouped_exact_quantiles,
    )

    rng = _random.Random(17)
    rows = []
    for g, size in (("a", 400), ("b", 37), (None, 11)):
        rows += [(g, rng.randrange(50)) for _ in range(size)]
    rows.append(("c", None))  # NULL value drops; group c vanishes
    df = spark.createDataFrame(rows, "g string, v int")
    qs = (0.1, 0.25, 0.5, 0.75, 1.0)
    got = {
        (r["g"], r["q"]): r["value"]
        for r in grouped_exact_quantiles(
            df, ["g"], "v", qs, num_buckets=4
        ).collect()
    }
    want = {}
    for g in ("a", "b", None):
        vals = sorted(v for gg, v in rows if gg == g and v is not None)
        for q in qs:
            want[(g, q)] = vals[math.ceil(q * len(vals)) - 1]
    assert got == want


def test_grouped_exact_quantiles_validation(spark):
    from tfx_addons_feast_examplegen_spark.operators.rowid import (
        grouped_exact_quantiles,
    )

    df = spark.createDataFrame([("a", 1)], "g string, v int")
    with pytest.raises(ValueError, match="non-empty"):
        grouped_exact_quantiles(df, ["g"], "v", ())
    with pytest.raises(ValueError, match="quantiles"):
        grouped_exact_quantiles(df, ["g"], "v", (0.0,))
    with pytest.raises(ValueError, match="quantiles"):
        grouped_exact_quantiles(df, ["g"], "v", (1.5,))

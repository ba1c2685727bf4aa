"""Bucketed feature tables remove the feature-side shuffle."""

from tfx_addons_feast_examplegen_spark.plans.explain import plan_summary
from tfx_addons_feast_examplegen_spark.session import load_table
from tfx_addons_feast_examplegen_spark.sources.bucketing import (
    bucket_shuffle_free,
    register_bucketed_feature_table,
)


def test_bucketed_agg_has_no_exchange(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    register_bucketed_feature_table(
        spark,
        events,
        "events_bucketed",
        bucket_cols=["user_id"],
        n_buckets=8,
        sort_cols=["user_id", "ts"],
    )
    try:
        assert bucket_shuffle_free(spark, "events_bucketed", ["user_id"])
        # the unbucketed plan DOES need an exchange for the same agg
        plain = events.groupBy("user_id").count()
        assert plan_summary(plain)["exchanges"] >= 1
        # and the bucketed table returns identical data
        a = dict(
            (r.user_id, r["count"])
            for r in spark.table("events_bucketed").groupBy("user_id").count().collect()
        )
        b = dict((r.user_id, r["count"]) for r in plain.collect())
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS events_bucketed")


def test_partition_pruning_on_partitioned_write(spark, sf_dir, tmp_path):
    # Date-partitioned feature-table layout: a filter on the partition
    # column must prune at planning time (PartitionFilters in the scan),
    # reading only matching directories — the other half of data-skipping
    # alongside bucketing.
    from pyspark.sql import functions as F

    from tfx_addons_feast_examplegen_spark.plans.explain import plan_text

    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_day")
    (
        events.withColumn("day", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(out)
    )
    df = spark.read.parquet(out).filter(F.col("day") == "2024-01-15")
    txt = plan_text(df)
    assert "PartitionFilters" in txt
    assert "2024-01-15" in txt.replace("19737", "2024-01-15")  # date literal or epoch-day
    n = df.count()
    expected = events.filter(F.to_date("ts") == "2024-01-15").count()
    assert n == expected > 0


def test_bucketed_join_plans_no_exchange(spark, sf_dir):
    # Both sides bucketed on the join key with equal bucket counts: the
    # sort-merge join must read co-located buckets with ZERO exchanges.
    from pyspark.sql import functions as F

    from tfx_addons_feast_examplegen_spark.plans.explain import plan_summary
    from tfx_addons_feast_examplegen_spark.session import load_table
    from tfx_addons_feast_examplegen_spark.sources.bucketing import (
        register_bucketed_feature_table,
    )

    li = register_bucketed_feature_table(
        spark,
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        ),
        "bkt_join_li",
        bucket_cols=["l_orderkey"],
        n_buckets=8,
    )
    od = register_bucketed_feature_table(
        spark,
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ),
        "bkt_join_od",
        bucket_cols=["o_orderkey"],
        n_buckets=8,
    )
    # disable broadcast so the join would otherwise shuffle both sides
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = li.join(od, li["l_orderkey"] == od["o_orderkey"])
        assert plan_summary(j)["exchanges"] == 0
        n = j.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert n == load_table(spark, sf_dir, "lineitem").count()

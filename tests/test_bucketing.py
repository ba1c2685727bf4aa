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

"""Bucketed feature tables: shuffle-free repeated joins at scale.

At 100 TB a feature table is joined on its entity keys by *every*
retrieval; paying a shuffle per query is the dominant cost. Spark's
bucketing (``bucketBy`` + ``saveAsTable``) persists the table
hash-partitioned AND hash-bucketed on the join key, so any later
equi-join or aggregation on that key reads co-located buckets without an
Exchange — the Spark analog of the reference warehouse's clustered tables
(BigQuery clustering, which Feast's offline store relies on implicitly).

``register_bucketed_feature_table`` materializes a parquet feature table
into the session's warehouse as a bucketed managed table (one-time cost),
after which ``spark.table(name)`` joins/aggregates on the bucket key with
zero feature-side shuffle (asserted by tests via plan inspection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_bucketed_feature_table(
    spark: SparkSession,
    source_df: DataFrame,
    table_name: str,
    *,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Materialize ``source_df`` as a bucketed (and optionally
    sorted-within-bucket) managed table; returns the table DataFrame.

    Sorting within buckets on (entity, event_ts) additionally lets
    sort-merge joins skip their sort phase for as-of retrievals.

    Re-registration is idempotent across sessions: the managed table's
    files outlive an in-memory catalog, so a fresh session would hit
    LOCATION_ALREADY_EXISTS on create — the stale table entry AND any
    orphaned location inside the session's warehouse dir are cleared
    first. Orphan cleanup covers the harness case only: a LOCAL
    ``file:`` warehouse and an unqualified table name (a ``db.table``
    name lives under ``<warehouse>/<db>.db/<table>``, and remote
    warehouses need their own FS client) — for those, cleanup is skipped
    and a genuinely orphaned location surfaces as the create-time error
    it is, rather than this helper guessing at remote deletions.
    """
    import os
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = str(spark.conf.get("spark.sql.warehouse.dir", "") or "")
    for prefix in ("file://", "file:"):
        if warehouse.startswith(prefix):
            warehouse = warehouse[len(prefix):]
            break
    local = warehouse.startswith("/") and "://" not in warehouse
    # An unqualified name resolves against the CURRENT database, but the
    # <warehouse>/<table> path below is the DEFAULT database's layout —
    # under `USE somedb` the two diverge and rmtree could hit an
    # unrelated default.<table> directory. Only clean up when the
    # session is actually on `default`.
    on_default = spark.catalog.currentDatabase() == "default"
    if local and on_default and "." not in table_name:
        loc = os.path.join(warehouse, table_name.lower())
        if os.path.isdir(loc):
            shutil.rmtree(loc)
    writer = (
        source_df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
    return spark.table(table_name)


def bucket_shuffle_free(spark: SparkSession, table_name: str, key_cols: list[str]) -> bool:
    """True if a groupBy on ``key_cols`` over the table plans no Exchange —
    i.e. bucketing is actually being exploited by the optimizer."""
    from ..plans.explain import plan_summary

    df = spark.table(table_name).groupBy(*key_cols).count()
    return plan_summary(df)["exchanges"] == 0

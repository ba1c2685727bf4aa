"""Z-order layout: key correctness and measurable skipping benefit."""

from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.layout import (
    cluster_by_zorder,
    partition_stats,
    zorder_key,
)
from tfx_addons_feast_examplegen_spark.session import load_table


def _morton2(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for j in range(bits):
        out |= ((x >> j) & 1) << (2 * j + 1)
        out |= ((y >> j) & 1) << (2 * j)
    return out


def test_zorder_key_matches_reference_morton(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", zorder_key(["x", "y"])).collect()
    }
    assert got == {(x, y): _morton2(x, y) for x, y in rows}


def test_zorder_key_three_columns_distinct_and_bounded(spark):
    df = spark.createDataFrame(
        [(a, b, c) for a in range(4) for b in range(4) for c in range(4)],
        "a int, b int, c int",
    )
    rows = df.withColumn("z", zorder_key(["a", "b", "c"], bits=2)).collect()
    zs = [r.z for r in rows]
    assert len(set(zs)) == 64  # bijective on the cube
    assert 0 <= min(zs) and max(zs) < 64


def test_zorder_clustering_tightens_partition_ranges(spark, sf_dir):
    # The measurable claim behind Z-order: per-partition min-max spans of
    # BOTH dimensions shrink vs a layout sorted by one dimension only, so
    # footer-stats pruning works for predicates on either column.
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).alias("cx"),
        F.expr("unix_timestamp(o_orderdate) div 86400 % 65536").alias("cy"),
    )
    n_parts = 16

    def avg_span(df, col):
        stats = partition_stats(df, ["cx", "cy"]).collect()
        spans = [
            getattr(r, f"max_{col}") - getattr(r, f"min_{col}")
            for r in stats
            if r.n_rows > 0
        ]
        return sum(spans) / len(spans)

    by_cx = orders.repartitionByRange(n_parts, "cx")
    by_z = cluster_by_zorder(orders, ["cx", "cy"], num_partitions=n_parts)
    # single-column layout: cy spans stay ~global; z-order cuts them
    assert avg_span(by_z, "cy") < 0.7 * avg_span(by_cx, "cy")
    # and cx locality is retained well enough to still prune
    assert avg_span(by_z, "cx") < 0.9 * avg_span(by_cx, "cy")

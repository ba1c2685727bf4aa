#!/usr/bin/env python
"""Scale probe: IVM family — maintenance cost vs full recompute.

Two claims to quantify at 10x the driver scale:

1. ``delta_join``: absorbing an insert batch into a join view costs a
   fraction of re-running the join, because neither base table
   shuffles (deltas broadcast).
2. ``connected_components_incremental``: absorbing a batch of edges
   into a labeling costs a fraction of re-running CC, because the
   propagation loop runs over the contracted super-graph only.

Run: python scripts/scale_probe_ivm.py [scale]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from tfx_addons_feast_examplegen_spark.operators.corpus import (  # noqa: E402
    connected_components,
    connected_components_incremental,
)
from tfx_addons_feast_examplegen_spark.operators.ivm import delta_join  # noqa: E402
from tfx_addons_feast_examplegen_spark.session import get_spark  # noqa: E402


def _t(label, fn):
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"  {label}: {best:.2f}s", flush=True)
    return best


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("ivm-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(32 * k))

    # --- delta_join: 1.5M-row base A, 6M-row base B, 1%-sized deltas
    n_a, n_b = 150_000 * k, 600_000 * k
    a = spark.range(n_a).select(
        F.col("id").alias("okey"), (F.col("id") % 1000).alias("va")
    )
    b = spark.range(n_b).select(
        (F.col("id") % n_a).alias("okey"), F.col("id").alias("lid"),
        (F.col("id") % 97).alias("vb"),
    )
    da = spark.range(n_a, n_a + n_a // 100).select(
        F.col("id").alias("okey"), (F.col("id") % 1000).alias("va")
    )
    db = spark.range(n_b, n_b + n_b // 100).select(
        # half the delta lineitems hit base orders, half the delta orders
        F.when(F.col("id") % 2 == 0, F.col("id") % n_a)
        .otherwise(n_a + F.col("id") % (n_a // 100))
        .alias("okey"),
        F.col("id").alias("lid"),
        (F.col("id") % 97).alias("vb"),
    )
    for frame in (a, b, da, db):
        frame.cache().count()
    t_full = _t(
        f"full join recompute ({n_a + n_a // 100} x {n_b + n_b // 100})",
        lambda: a.unionByName(da).join(b.unionByName(db), "okey")
        .write.mode("overwrite").format("noop").save(),
    )
    t_delta = _t(
        "delta_join (1% insert batches)",
        lambda: delta_join(a, da, b, db, ["okey"])
        .write.mode("overwrite").format("noop").save(),
    )
    print({"op": "delta_join", "scale": k, "full_s": round(t_full, 2),
           "delta_s": round(t_delta, 2),
           "speedup": round(t_full / t_delta, 1)}, flush=True)

    # --- cc_incremental: 2M-edge base graph, 1% new-edge batch
    n_e = 200_000 * k
    edges = spark.range(n_e).select(
        (F.xxhash64("id") % (n_e // 4)).alias("doc_a"),
        (F.xxhash64(F.col("id") + 1) % (n_e // 4)).alias("doc_b"),
    ).filter(F.col("doc_a") != F.col("doc_b")).cache()
    edges.count()
    new_edges = spark.range(n_e, n_e + n_e // 100).select(
        (F.xxhash64("id") % (n_e // 4)).alias("doc_a"),
        (F.xxhash64(F.col("id") + 1) % (n_e // 4)).alias("doc_b"),
    ).filter(F.col("doc_a") != F.col("doc_b")).cache()
    new_edges.count()
    labels = connected_components(edges).cache()
    labels.count()
    t_full_cc = _t(
        f"full CC recompute ({n_e + n_e // 100} edges)",
        lambda: connected_components(edges.unionByName(new_edges))
        .write.mode("overwrite").format("noop").save(),
    )
    t_inc = _t(
        "cc_incremental (1% edge batch)",
        lambda: connected_components_incremental(labels, new_edges)
        .write.mode("overwrite").format("noop").save(),
    )
    print({"op": "cc_incremental", "scale": k,
           "full_s": round(t_full_cc, 2), "inc_s": round(t_inc, 2),
           "speedup": round(t_full_cc / t_inc, 1)}, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

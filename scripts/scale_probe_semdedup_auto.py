#!/usr/bin/env python
"""Scale probe: semantic_dedup's "auto" assignment routing (round 12).

Validates the measured-auto rule end-to-end at a shape past the
~1k-cluster wall: with n_clusters = 2048 > ASSIGN_INDEX_AUTO_CELLS,
the default must route assignment through the two-stage index and (a)
beat the pinned flat scan, (b) keep every planted exact-duplicate pair
co-clustered and suppressed (the invariant the auto rule is allowed to
rely on — assignment stays a pure function of the vector).

Run: python scripts/scale_probe_semdedup_auto.py [n] [dim]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from scale_probe_semdedup import synth  # md5-derived vectors, 1% planted dups


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    k = 2048
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tfx_addons_feast_examplegen_spark.operators.semdedup import (
        ASSIGN_INDEX_AUTO_CELLS,
        semantic_dedup,
    )
    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        ivf_centroids_indexed,
    )

    assert k > ASSIGN_INDEX_AUTO_CELLS, "probe must sit past the wall"
    emb = synth(spark, n, dim)
    emb.write.mode("overwrite").parquet("/tmp/semauto_probe")
    emb = spark.read.parquet("/tmp/semauto_probe")

    t0 = time.time()
    cents = ivf_centroids_indexed(
        emb, n_cells=k, seed=7, refine_iters=1, n_probe_super=2
    )
    t_train = time.time() - t0
    print(f"train (indexed, 1 iter): {t_train:.1f}s  cells={len(cents)}")

    results = {}
    for label, pin in (("auto(indexed)", "auto"), ("pinned-flat", False)):
        t0 = time.time()
        out = semantic_dedup(
            emb, threshold=0.999, centroids=cents,
            max_cluster=50_000, assign_via_index=pin,
        )
        dropped = out.filter(~F.col("kept")).count()
        dt = time.time() - t0
        results[label] = (dt, dropped)
        print(f"{label}: {dt:.1f}s  suppressed={dropped}")

    planted = sum(1 for i in range(n) if i % 100 == 1 and i >= 1)
    for label, (dt, dropped) in results.items():
        assert dropped == planted, (label, dropped, planted)
    print(f"both paths suppress exactly the {planted} planted copies")
    print(
        "auto vs flat: "
        f"{results['pinned-flat'][0] / results['auto(indexed)'][0]:.1f}x"
    )


if __name__ == "__main__":
    main()
